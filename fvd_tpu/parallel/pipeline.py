"""Sharded device programs: DP video batches, SP time axis with halo
exchange, and the fused multi-chip training step.

Everything here is ``shard_map`` over a :func:`fvd_tpu.parallel.mesh.make_mesh`
mesh with explicit collectives:

* ``psum`` for global normalization statistics and LR gradients (DP);
* ``ppermute`` for the lip-sync halo exchange along the time axis (SP) —
  the ±0.5 s lag window plus window overlap is the only cross-shard data
  dependency in the whole pipeline (SURVEY §2.3);
* ``all_gather`` to replicate the per-window scores for the global top-50%
  selection (a few dozen floats).

Numerics match the single-device kernels exactly (tested vs
``fvd_tpu.ops.lipsync.lip_sync_score_xla``).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from fvd_tpu.ops.lipsync import EPS, _top_half_mean


# ---------------------------------------------------------------------------
# SP: time-sharded lip-sync scoring with halo exchange
# ---------------------------------------------------------------------------
def _local_window_scores(
    ext: jnp.ndarray,          # [halo_l + chunk + halo_r] extended mouth signal
    ext_a: jnp.ndarray,        # same extent, audio
    chunk: int,
    window: int,
    step: int,
    max_lag: int,
    norm_div: int,
    n_total: int,
    axis: str,
    silence_std: float,
    sharpness_threshold: float,
    sharpness_penalty: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scores/valid for the windows whose start lies in this device's chunk."""
    d = jax.lax.axis_index(axis)
    w_per = chunk // step
    starts_local = jnp.arange(w_per) * step                      # offset in chunk
    starts_global = d * chunk + starts_local
    in_range = starts_global <= (n_total - window)

    # mouth windows: ext starts at (chunk_start - max_lag)
    m_idx = (max_lag + starts_local)[:, None] + jnp.arange(window)[None, :]
    wm = ext[m_idx]                                              # [w_per, window]
    wa = ext_a[m_idx]                                            # [w_per, window]
    # reference zero-pads each window's lag context (c1:152 F.pad of the
    # window) — do NOT use real neighboring samples here, for parity
    wa_ext = jnp.pad(wa, ((0, 0), (max_lag, max_lag)))

    def bessel_std(x):
        mean = jnp.mean(x, axis=1, keepdims=True)
        return jnp.sqrt(jnp.sum((x - mean) ** 2, axis=1) / (window - 1))

    valid = jnp.logical_and(bessel_std(wa) >= silence_std, bessel_std(wm) >= silence_std)
    valid = jnp.logical_and(valid, in_range)

    lidx = jnp.arange(2 * max_lag + 1)[:, None] + jnp.arange(window)[None, :]
    a_lag = wa_ext[:, lidx]                                      # [w_per, L, window]
    cc = jnp.einsum("nlw,nw->nl", a_lag, wm, preferred_element_type=jnp.float32)
    cc = cc / norm_div
    max_corr = jnp.max(cc, axis=1)
    sharpness = max_corr / (jnp.mean(jnp.abs(cc), axis=1) + EPS)
    scores = jnp.where(sharpness < sharpness_threshold, max_corr * sharpness_penalty, max_corr)
    return scores, valid


def _znorm_global(x: jnp.ndarray, n_total: int, axes) -> jnp.ndarray:
    """z-normalize a time-sharded signal using psum statistics."""
    s = jax.lax.psum(jnp.sum(x), axes)
    mean = s / n_total
    var = jax.lax.psum(jnp.sum((x - mean) ** 2), axes) / n_total
    return (x - mean) / (jnp.sqrt(var) + EPS)


def _halo_extend(x: jnp.ndarray, halo_l: int, halo_r: int, axis: str) -> jnp.ndarray:
    """[chunk] -> [halo_l + chunk + halo_r] via neighbor ppermute (zero fill
    at the ends of the ring — matching the zero lag padding of the
    single-device kernel)."""
    n_dev = jax.lax.axis_size(axis)
    # left halo: my left neighbor's last halo_l samples
    send_left = x[-halo_l:]
    left = jax.lax.ppermute(
        send_left, axis, perm=[(i, i + 1) for i in range(n_dev - 1)]
    )
    # right halo: my right neighbor's first halo_r samples
    send_right = x[:halo_r]
    right = jax.lax.ppermute(
        send_right, axis, perm=[(i + 1, i) for i in range(n_dev - 1)]
    )
    return jnp.concatenate([left, x, right])


def make_time_sharded_lipsync(
    mesh: Mesh,
    n: int,
    fps: float,
    window_duration_s: float = 5.0,
    max_lag_s: float = 0.5,
    silence_std: float = 0.01,
    sharpness_threshold: float = 1.5,
    sharpness_penalty: float = 0.5,
    time_axis: str = "time",
):
    """Build a jitted SP lip-sync scorer: signals [n] sharded over ``time``.

    Requires chunk = n / n_time to be a multiple of the hop and at least
    window + max_lag (so each window's data lives on at most 2 shards).
    """
    window = int(window_duration_s * fps)
    step = max(int(window / 2), 1)
    max_lag = int(fps * max_lag_s)
    norm_div = window
    n_time = mesh.shape[time_axis]
    chunk = n // n_time
    if chunk * n_time != n:
        raise ValueError(f"signal length {n} not divisible by time={n_time}")
    if chunk % step != 0:
        raise ValueError(f"chunk {chunk} must be a multiple of hop {step}")
    if chunk < window + max_lag:
        raise ValueError(f"chunk {chunk} shorter than window+lag {window + max_lag}")
    halo_l = max_lag
    halo_r = window + max_lag

    def local_fn(mouth, audio):
        mouth = _znorm_global(mouth.astype(jnp.float32), n, time_axis)
        audio = _znorm_global(audio.astype(jnp.float32), n, time_axis)
        ext_m = _halo_extend(mouth, halo_l, halo_r, time_axis)
        ext_a = _halo_extend(audio, halo_l, halo_r, time_axis)
        scores, valid = _local_window_scores(
            ext_m, ext_a, chunk, window, step, max_lag, norm_div, n,
            time_axis, silence_std, sharpness_threshold, sharpness_penalty,
        )
        # global selection over all windows (tiny): gather + shared math
        all_scores = jax.lax.all_gather(scores, time_axis).reshape(-1)
        all_valid = jax.lax.all_gather(valid, time_axis).reshape(-1)
        return _top_half_mean(all_scores, all_valid)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(time_axis), P(time_axis)),
        out_specs=P(),  # replicated scalar (identical on all shards post-gather)
        check_vma=False,
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# DP: sharded LR training step
# ---------------------------------------------------------------------------
class TrainStepResult(NamedTuple):
    w: jax.Array
    b: jax.Array
    probs: jax.Array
    loss: jax.Array


def make_dp_lr_train_step(mesh: Mesh, lr: float = 0.005, data_axis: str = "data"):
    """Minibatch logistic-regression step: features [B, D] + labels [B]
    sharded over ``data``; gradients psum-averaged across shards."""

    def local_fn(feats, labels, w, b):
        n_global = jax.lax.psum(feats.shape[0], data_axis)
        p = jax.nn.sigmoid(feats @ w + b)
        err = p - labels
        gw = jax.lax.psum(feats.T @ err, data_axis) / n_global
        gb = jax.lax.psum(jnp.sum(err), data_axis) / n_global
        # stable BCE loss, psum-averaged
        z = feats @ w + b
        loss_local = jnp.sum(jnp.maximum(z, 0) - z * labels + jnp.log1p(jnp.exp(-jnp.abs(z))))
        loss = jax.lax.psum(loss_local, data_axis) / n_global
        return w - lr * gw, b - lr * gb, p, loss

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(data_axis), P(), P()),
        out_specs=(P(), P(), P(data_axis), P()),
        check_vma=False,
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Fused multi-chip training step (DP x SP)
# ---------------------------------------------------------------------------
def make_multichip_train_step(
    mesh: Mesh,
    batch: int,
    n: int,
    fps: float,
    lr: float = 0.005,
    data_axis: str = "data",
    time_axis: str = "time",
    window_duration_s: float = 5.0,
    max_lag_s: float = 0.5,
):
    """One compiled training step over a 2-D mesh:

    * videos sharded over ``data`` (DP);
    * each video's signal tracks sharded over ``time`` (SP, halo exchange);
    * lip-sync feature computed on device, fused into the 9-feature vector;
    * LR gradient step with cross-``data`` psum.

    inputs: mouth [B, N], audio [B, N], other_feats [B, 8], labels [B],
            w [9], b [].
    """
    window = int(window_duration_s * fps)
    step = max(int(window / 2), 1)
    max_lag = int(fps * max_lag_s)
    n_time = mesh.shape[time_axis]
    n_data = mesh.shape[data_axis]
    chunk = n // n_time
    if chunk * n_time != n or chunk % step != 0 or chunk < window + max_lag:
        raise ValueError("invalid time sharding for these signal dimensions")
    if batch % n_data != 0:
        raise ValueError(f"batch {batch} not divisible by data={n_data}")
    halo_l, halo_r = max_lag, window + max_lag

    def per_video(mouth, audio):
        mouth = _znorm_global(mouth, n, time_axis)
        audio = _znorm_global(audio, n, time_axis)
        ext_m = _halo_extend(mouth, halo_l, halo_r, time_axis)
        ext_a = _halo_extend(audio, halo_l, halo_r, time_axis)
        scores, valid = _local_window_scores(
            ext_m, ext_a, chunk, window, step, max_lag, window, n,
            time_axis, 0.01, 1.5, 0.5,
        )
        all_scores = jax.lax.all_gather(scores, time_axis).reshape(-1)
        all_valid = jax.lax.all_gather(valid, time_axis).reshape(-1)
        return _top_half_mean(all_scores, all_valid)

    def local_fn(mouth, audio, other_feats, labels, w, b):
        # [B_local, N_local] -> per-video lip-sync scores (SP inside vmap is
        # not allowed: collectives can't cross vmap. Scan over local videos.)
        def body(carry, xs):
            m, a = xs
            return carry, per_video(m.astype(jnp.float32), a.astype(jnp.float32))

        _, lip = jax.lax.scan(body, 0, (mouth, audio))

        feats = jnp.concatenate(
            [other_feats[:, :2], lip[:, None], other_feats[:, 2:]], axis=1
        )  # lip_sync is feature index 2 (fusion.FEATURE_ORDER)
        n_global = jax.lax.psum(feats.shape[0], data_axis)
        p = jax.nn.sigmoid(feats @ w + b)
        err = p - labels
        gw = jax.lax.psum(feats.T @ err, data_axis) / n_global
        gb = jax.lax.psum(jnp.sum(err), data_axis) / n_global
        z = feats @ w + b
        loss_local = jnp.sum(jnp.maximum(z, 0) - z * labels + jnp.log1p(jnp.exp(-jnp.abs(z))))
        loss = jax.lax.psum(loss_local, data_axis) / n_global
        return w - lr * gw, b - lr * gb, p, loss

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(data_axis, time_axis),   # mouth
            P(data_axis, time_axis),   # audio
            P(data_axis, None),        # other feature components
            P(data_axis),              # labels
            P(),                       # w (replicated)
            P(),                       # b
        ),
        out_specs=(P(), P(), P(data_axis), P()),
        check_vma=False,
    )
    return jax.jit(fn)
