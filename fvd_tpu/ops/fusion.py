"""Logistic-regression fusion kernels.

The reference computes the final ``fake_probability`` as a numerically-stable
sigmoid over 9 features (``lr_node.py:142-155``) and trains online with
plain SGD ``w <- w - 0.005*(p-label)*f`` (``lr_node.py:181-192``), one video
at a time, replayed up to 100x per video by the batch harness
(``batch_test.py:158-189``).

TPU-native design: the scalar per-video path stays in float64 on host (it is
10 multiply-adds — bit-compatibility with the reference matters more than
device offload), while *training* is re-expressed as a batched, jitted
device program: the whole feature-cache corpus becomes one ``[N, D]`` matrix
and each "epoch over the corpus with per-video sequential updates" becomes a
``lax.scan`` over videos — mathematically identical to the reference's
sequential replay, but compiled once and run from HBM.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

#: Canonical feature order (reference lr_node.py:130-140 insertion order).
FEATURE_ORDER: Tuple[str, ...] = (
    "speech_rate",
    "pause_ratio",
    "lip_sync",
    "gesture_score",
    "blink_rate",
    "headpose_jerk",
    "texture",
    "claim_reliability",
    "evidence_reliability",
)

DEFAULT_LEARNING_RATE = 0.005  # lr_node.py:183


# ---------------------------------------------------------------------------
# Host (float64, bit-compatible with reference math.exp path)
# ---------------------------------------------------------------------------
def stable_sigmoid(z: float) -> float:
    """Branch-stable sigmoid (reference lr_node.py:152-155)."""
    if z >= 0:
        return 1.0 / (1.0 + math.exp(-z))
    ez = math.exp(z)
    return ez / (1.0 + ez)


def predict_host(features: Dict[str, float], weights: Dict[str, float]) -> float:
    """Scalar LR forward, identical accumulation order to the reference
    (bias first, then features in dict insertion order, lr_node.py:144-150)."""
    z = weights.get("bias", 0.0)
    for k, v in features.items():
        z += weights.get(k, 0.0) * v
    return stable_sigmoid(z)


def sgd_update_host(
    features: Dict[str, float],
    weights: Dict[str, float],
    label: int,
    lr: float = DEFAULT_LEARNING_RATE,
) -> Tuple[Dict[str, float], float]:
    """One online update (reference lr_node.py:181-192). Returns
    (new_weights, probability_before_update)."""
    p = predict_host(features, weights)
    error = p - float(label)
    new_w = dict(weights)
    new_w["bias"] = new_w.get("bias", 0.0) - lr * error * 1.0
    for k, v in features.items():
        new_w[k] = new_w.get(k, 0.0) - lr * error * v
    return new_w, p


# ---------------------------------------------------------------------------
# Device (batched / scanned, jitted)
# ---------------------------------------------------------------------------
def features_to_vector(features: Dict[str, float]) -> np.ndarray:
    return np.array([features.get(k, 0.0) for k in FEATURE_ORDER], dtype=np.float32)


def weights_to_vectors(weights: Dict[str, float]) -> Tuple[np.ndarray, np.ndarray]:
    w = np.array([weights.get(k, 0.0) for k in FEATURE_ORDER], dtype=np.float32)
    b = np.array(weights.get("bias", 0.0), dtype=np.float32)
    return w, b


def vectors_to_weights(w: np.ndarray, b: np.ndarray) -> Dict[str, float]:
    out = {"bias": float(b)}
    for k, v in zip(FEATURE_ORDER, np.asarray(w).tolist()):
        out[k] = float(v)
    return out


@jax.jit
def predict_batch(feats: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """Vectorized LR forward over an [N, D] feature matrix."""
    z = feats @ w + b
    return jax.nn.sigmoid(z)


@partial(jax.jit, static_argnames=("lr",))
def sgd_epoch(
    feats: jax.Array,
    labels: jax.Array,
    w: jax.Array,
    b: jax.Array,
    lr: float = DEFAULT_LEARNING_RATE,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One sequential pass over the corpus (per-video SGD, like replaying the
    reference batch harness) as a ``lax.scan``.

    Returns (w, b, per-video probabilities *before* each update).
    """

    def step(carry, xy):
        w, b = carry
        f, y = xy
        p = jax.nn.sigmoid(f @ w + b)
        err = p - y
        return (w - lr * err * f, b - lr * err), p

    (w, b), probs = jax.lax.scan(step, (w, b), (feats, labels))
    return w, b, probs


@partial(jax.jit, static_argnames=("lr", "max_epochs"))
def train_until_correct(
    feats: jax.Array,
    labels: jax.Array,
    w: jax.Array,
    b: jax.Array,
    lr: float = DEFAULT_LEARNING_RATE,
    max_epochs: int = 100,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Device analog of the harness's retry-until-correct loop
    (``batch_test.py:158-189``): for each video in order, repeat the SGD
    update until the thresholded prediction matches the label (≤ max_epochs).

    Implemented as scan-over-videos of a bounded ``while_loop`` — fully
    compiled, no host round-trips.
    """

    def per_video(carry, xy):
        w, b = carry
        f, y = xy

        def cond(state):
            w, b, i = state
            p = jax.nn.sigmoid(f @ w + b)
            wrong = jnp.where(y > 0.5, p <= 0.5, p > 0.5)
            return jnp.logical_and(wrong, i < max_epochs)

        def body(state):
            w, b, i = state
            p = jax.nn.sigmoid(f @ w + b)
            err = p - y
            return (w - lr * err * f, b - lr * err, i + 1)

        w, b, n = jax.lax.while_loop(cond, body, (w, b, jnp.array(0, jnp.int32)))
        return (w, b), n

    (w, b), iters = jax.lax.scan(per_video, (w, b), (feats, labels))
    return w, b, iters
