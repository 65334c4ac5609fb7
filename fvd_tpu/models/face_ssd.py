"""SSD-style face detector.

Fills the role of the reference's OpenCV res10_300x300 Caffe SSD
(``v1_keyframes_facetrack.py:36-108``): 300x300 input, multi-scale anchor
heads, confidence threshold 0.5 downstream.  This is a *retrained
equivalent* (SURVEY §7 "weight provenance"), not a byte-level port: a
compact strided-conv backbone with three detection heads, designed so the
whole batched pipeline — preprocess, forward, decode, NMS — is ONE jitted
program over a ``uint8[T, H, W, 3]`` frame tensor.

Checkpoints: ``save_params`` / ``load_params`` (npz); random init otherwise.
Trainable: :func:`ssd_loss` + :func:`make_train_step` (tested by overfitting
synthetic faces).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fvd_tpu.ops import detection
from fvd_tpu.providers.vision import FaceBox

INPUT_SIZE = 300
#: (feature map size, anchor scales, aspect ratios) per head
HEAD_SPECS = [
    ((38, 38), [0.04, 0.08], [1.0, 1.5]),
    ((19, 19), [0.16, 0.24], [1.0, 1.5]),
    ((10, 10), [0.36, 0.56], [1.0, 1.5]),
]
MEAN_RGB = (123.0, 117.0, 104.0)


def anchors() -> np.ndarray:
    return detection.make_anchors(
        [s for s, _, _ in HEAD_SPECS],
        [sc for _, sc, _ in HEAD_SPECS],
        [ar for _, _, ar in HEAD_SPECS],
    )


class ConvBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", use_bias=False)(x)
        x = nn.GroupNorm(num_groups=8)(x)
        return nn.relu(x)


class FaceSSD(nn.Module):
    """Backbone + per-head (loc, conf) predictors.

    Input float [B, 300, 300, 3] (mean-subtracted); output
    (loc [B, A, 4], conf_logits [B, A]).
    """

    width: int = 32

    @nn.compact
    def __call__(self, x):
        w = self.width
        x = ConvBlock(w, stride=2)(x)        # 150
        x = ConvBlock(w)(x)
        x = ConvBlock(2 * w, stride=2)(x)    # 75
        x = ConvBlock(2 * w)(x)
        f1 = ConvBlock(4 * w, stride=2)(x)   # 38
        f1 = ConvBlock(4 * w)(f1)
        f2 = ConvBlock(8 * w, stride=2)(f1)  # 19
        f2 = ConvBlock(8 * w)(f2)
        f3 = ConvBlock(8 * w, stride=2)(f2)  # 10

        locs, confs = [], []
        for feat, (shape, scales, ars) in zip((f1, f2, f3), HEAD_SPECS):
            k = len(scales) * len(ars)
            loc = nn.Conv(4 * k, (3, 3), padding="SAME")(feat)
            conf = nn.Conv(k, (3, 3), padding="SAME")(feat)
            b = feat.shape[0]
            locs.append(loc.reshape(b, -1, 4))
            confs.append(conf.reshape(b, -1))
        return jnp.concatenate(locs, axis=1), jnp.concatenate(confs, axis=1)


def init_params(rng: jax.Array, width: int = 32):
    model = FaceSSD(width=width)
    dummy = jnp.zeros((1, INPUT_SIZE, INPUT_SIZE, 3), jnp.float32)
    return model.init(rng, dummy)


def save_params(path: str, params) -> None:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    np.savez(path, **{jax.tree_util.keystr(k): np.asarray(v) for k, v in flat})


def load_params(path: str, width: int = 32):
    data = np.load(path)
    template = init_params(jax.random.PRNGKey(0), width)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    values = [jnp.asarray(data[jax.tree_util.keystr(k)]) for k, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, values)


# ---------------------------------------------------------------------------
# Inference: one jitted program over the frame batch
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("width", "max_out", "compute_dtype"))
def detect_batch_jit(
    params,
    frames: jax.Array,  # uint8 [B, H, W, 3]
    width: int = 32,
    max_out: int = 32,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array]:
    """-> (boxes [B, max_out, 4] normalized corners, scores [B, max_out]).

    The backbone runs in ``compute_dtype`` (bfloat16 by default: 2x MXU
    throughput on TPU; detection heads' decode/NMS stay float32)."""
    x = frames.astype(jnp.float32)
    x = jax.image.resize(x, (x.shape[0], INPUT_SIZE, INPUT_SIZE, 3), "linear")
    x = (x - jnp.asarray(MEAN_RGB)).astype(compute_dtype)
    cast_params = jax.tree.map(lambda p: p.astype(compute_dtype), params)
    loc, conf = FaceSSD(width=width).apply(cast_params, x)
    loc = loc.astype(jnp.float32)
    conf = conf.astype(jnp.float32)
    boxes = detection.decode_boxes(loc, jnp.asarray(anchors()))
    scores = jax.nn.sigmoid(conf)

    # top-k prefilter keeps the NMS IoU matrix small (k^2, not A^2)
    k = min(256, scores.shape[1])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)

    def per_image(b, s):
        return detection.nms(b, s, max_out=max_out, iou_threshold=0.45,
                             score_threshold=0.05)

    return jax.vmap(per_image)(top_boxes, top_scores)


class SSDFaceDetector:
    """FaceDetectorProvider wrapper: batched jit forward + host unpacking."""

    model_name = "fvd_tpu_ssd"
    #: nodes may pass an HBM-resident frame tensor instead of host numpy
    accepts_device_frames = True

    def __init__(self, params=None, width: int = 32, max_out: int = 32,
                 checkpoint: Optional[str] = None):
        if params is None:
            if checkpoint:
                params = load_params(checkpoint, width)
            else:
                params = init_params(jax.random.PRNGKey(0), width)
        self.params = params
        self.width = width
        self.max_out = max_out

    def detect_batch(self, frames: np.ndarray) -> List[List[FaceBox]]:
        if len(frames) == 0:
            return []
        from fvd_tpu.parallel.inference import shard_for_inference

        h, w = frames.shape[1:3]
        # frames are per-item independent: shard the batch dim over the
        # inference mesh's data axis when one is configured (no-op on one
        # device — see parallel/inference.py)
        boxes, scores = detect_batch_jit(
            self.params, shard_for_inference(frames),
            width=self.width, max_out=self.max_out
        )
        import jax

        boxes, scores = jax.device_get((boxes, scores))  # ONE host fetch
        out: List[List[FaceBox]] = []
        for bb, ss in zip(boxes, scores):
            dets = [
                FaceBox(b[0] * w, b[1] * h, b[2] * w, b[3] * h, float(s))
                for b, s in zip(bb, ss)
                if s > 0.0
            ]
            out.append(dets)
        return out


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------
def ssd_loss(params, frames, labels, loc_targets, width: int = 32, neg_ratio: float = 3.0):
    """BCE conf loss with hard-negative mining + smooth-L1 loc loss.

    frames float [B, 300, 300, 3] (already preprocessed);
    labels [B, A] in {0,1}; loc_targets [B, A, 4] encoded offsets.
    """
    loc, conf = FaceSSD(width=width).apply(params, frames)
    pos = labels > 0.5
    n_pos = jnp.maximum(jnp.sum(pos, axis=1), 1)

    bce = jnp.maximum(conf, 0) - conf * labels + jnp.log1p(jnp.exp(-jnp.abs(conf)))
    # hard negative mining: keep top (neg_ratio * n_pos) negative losses
    neg_bce = jnp.where(pos, -jnp.inf, bce)
    order = jnp.argsort(-neg_bce, axis=1)
    rank = jnp.argsort(order, axis=1)
    keep_neg = rank < (neg_ratio * n_pos)[:, None]
    conf_loss = jnp.sum(jnp.where(pos | keep_neg, bce, 0.0), axis=1) / n_pos

    diff = jnp.abs(loc - loc_targets)
    smooth_l1 = jnp.where(diff < 1.0, 0.5 * diff**2, diff - 0.5)
    loc_loss = jnp.sum(jnp.where(pos[..., None], smooth_l1, 0.0), axis=(1, 2)) / n_pos
    return jnp.mean(conf_loss + loc_loss)


def make_train_step(width: int = 32, lr: float = 1e-3):
    import optax

    tx = optax.adam(lr)

    @jax.jit
    def step(params, opt_state, frames, labels, loc_targets):
        loss, grads = jax.value_and_grad(ssd_loss)(params, frames, labels, loc_targets,
                                                   width=width)
        updates, opt_state = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), opt_state, loss

    def init_opt(params):
        return tx.init(params)

    return step, init_opt
