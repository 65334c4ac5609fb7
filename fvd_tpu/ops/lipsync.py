"""Fused audio-visual lip-sync scoring kernel.

Reference math (``nodes/C_nodes/c1_lip_sync_score.py``):

1. MAR (mouth aspect ratio) per landmark sample (c1:9-27);
2. interpolate MAR + audio envelope onto a ``duration*fps`` grid (c1:61-105);
3. z-normalize both signals, eps=1e-9 (c1:107-110);
4. split into 5 s windows with 50% hop via torch ``unfold`` (c1:119-128);
5. per window: skip if either std < 0.01; cross-correlate over ±0.5 s lags
   (``F.conv1d`` with lag padding), /window_size; peak sharpness
   max/mean|cc|, score *= 0.5 if sharpness < 1.5 (c1:134-175);
6. final = mean of top-50% window scores, clamped >= 0 (c1:177-185).

The reference runs a Python loop over windows with one cuDNN conv1d each.
Here the whole thing is ONE device program: all windows are gathered into a
``[n_win, W]`` batch, every (window, lag) pair becomes a row of a single
einsum (MXU), selection/sharpness/top-k run vectorized, and a Pallas TPU
kernel provides the fused window-loop variant that keeps each window's
working set in VMEM.

Scores are bit-comparable between the jnp reference path and the Pallas path
(tested), and land in the reference's own test bands (perfect > 0.8,
delayed > 0.7, random < 0.4, silence/static == 0).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-9


# ---------------------------------------------------------------------------
# Geometry: mouth aspect ratio (c1:9-27)
# ---------------------------------------------------------------------------
def mar_from_points(mouth_points: jax.Array) -> jax.Array:
    """MAR for a batch of mouth landmarks ``[..., 20, 2]``.

    verticals: (m2,m10), (m3,m9), (m4,m8); horizontal: (m0,m6);
    mar = (A+B+C) / (3*D), 0 where D == 0.
    """
    p = mouth_points
    d = lambda i, j: jnp.linalg.norm(p[..., i, :] - p[..., j, :], axis=-1)
    A, B, C = d(2, 10), d(3, 9), d(4, 8)
    D = d(0, 6)
    return jnp.where(D > 0, (A + B + C) / (3.0 * D), 0.0)


# ---------------------------------------------------------------------------
# Shared helpers
# ---------------------------------------------------------------------------
def _znorm(x: jax.Array) -> jax.Array:
    return (x - jnp.mean(x)) / (jnp.std(x) + EPS)


def window_params(n: int, fps: float, window_duration_s: float = 5.0) -> Tuple[int, int, int]:
    """(window_size, step, n_windows) with torch-unfold semantics; a signal
    shorter than one window becomes a single full-length window (c1:123-128)."""
    window = int(window_duration_s * fps)
    step = max(int(window / 2), 1)
    if n < window:
        return n, n, 1
    return window, step, (n - window) // step + 1


def _top_half_mean(scores: jax.Array, valid: jax.Array) -> jax.Array:
    """mean of the top-50% valid scores, desc-sorted; max(1,...) floor;
    0.0 if nothing valid; clamped >= 0 (c1:177-185)."""
    n_valid = jnp.sum(valid.astype(jnp.int32))
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked = jnp.where(valid, scores, neg_inf)
    order = jnp.sort(masked)[::-1]
    k = jnp.maximum(1, (n_valid.astype(jnp.float32) * 0.5).astype(jnp.int32))
    csum = jnp.cumsum(jnp.where(jnp.isfinite(order), order, 0.0))
    mean_topk = csum[k - 1] / k.astype(scores.dtype)
    score = jnp.where(n_valid > 0, jnp.maximum(mean_topk, 0.0), 0.0)
    return score


class LipSyncResult(NamedTuple):
    score: jax.Array      # scalar
    n_windows: jax.Array  # int
    n_valid: jax.Array    # int


# ---------------------------------------------------------------------------
# XLA path: one einsum over all (window, lag) pairs
# ---------------------------------------------------------------------------
@partial(
    jax.jit,
    static_argnames=(
        "fps",
        "window_duration_s",
        "max_lag_s",
        "silence_std",
        "sharpness_threshold",
        "sharpness_penalty",
    ),
)
def lip_sync_score_xla(
    mouth: jax.Array,
    audio: jax.Array,
    fps: float,
    window_duration_s: float = 5.0,
    max_lag_s: float = 0.5,
    silence_std: float = 0.01,
    sharpness_threshold: float = 1.5,
    sharpness_penalty: float = 0.5,
) -> LipSyncResult:
    n = mouth.shape[0]
    window, step, n_win = window_params(n, fps, window_duration_s)
    max_lag = int(fps * max_lag_s)

    m = _znorm(mouth.astype(jnp.float32))
    a = _znorm(audio.astype(jnp.float32))

    widx = jnp.arange(n_win)[:, None] * step + jnp.arange(window)[None, :]
    wm = m[widx]  # [n_win, W]
    wa = a[widx]

    # torch.std is Bessel-corrected (c1:139) — match it for gate parity
    valid = jnp.logical_and(jnp.std(wa, axis=1, ddof=1) >= silence_std,
                            jnp.std(wm, axis=1, ddof=1) >= silence_std)

    # lag-shifted copies of the padded audio windows: [n_win, 2L+1, W]
    a_pad = jnp.pad(wa, ((0, 0), (max_lag, max_lag)))
    lidx = jnp.arange(2 * max_lag + 1)[:, None] + jnp.arange(window)[None, :]
    a_lag = a_pad[:, lidx]

    cc = jnp.einsum("nlw,nw->nl", a_lag, wm, preferred_element_type=jnp.float32)
    # reference divides by int(5s*fps) even for a short single-window signal
    # (c1:120 window_size is fps-derived, c1:158 cc/window_size)
    cc = cc / int(window_duration_s * fps)

    max_corr = jnp.max(cc, axis=1)
    mean_abs = jnp.mean(jnp.abs(cc), axis=1) + EPS
    sharpness = max_corr / mean_abs
    scores = jnp.where(sharpness < sharpness_threshold, max_corr * sharpness_penalty, max_corr)

    return LipSyncResult(
        score=_top_half_mean(scores, valid),
        n_windows=jnp.asarray(n_win),
        n_valid=jnp.sum(valid.astype(jnp.int32)),
    )


# ---------------------------------------------------------------------------
# Pallas TPU path: per-window program, window data resident in VMEM
# ---------------------------------------------------------------------------
def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lipsync_window_kernel(
    wm_ref,      # [1, Wp]   mouth window (zero-padded to lane multiple)
    wa_ref,      # [1, Wp + 2*Lp] padded audio window
    out_ref,     # [1, 128]  score in [0,0], valid flag in [0,1]
    *,
    window: int,
    max_lag: int,
    norm_div: int,
    silence_std: float,
    sharpness_threshold: float,
    sharpness_penalty: float,
):
    wm = wm_ref[:, :]  # [B, Wp] — B windows per program (sublane-aligned)
    B, Wp = wm.shape
    W = window
    n_lags = 2 * max_lag + 1

    # masked (Bessel-corrected, c1:139) std over the true window extent
    col = jax.lax.broadcasted_iota(jnp.int32, (B, Wp), 1)
    in_w = (col < W).astype(jnp.float32)
    inv_w = 1.0 / W
    inv_norm = 1.0 / norm_div

    def masked_std(x):
        xm = x * in_w
        mean = jnp.sum(xm, axis=1, keepdims=True) * inv_w
        var = jnp.sum(((x - mean) * in_w) ** 2, axis=1, keepdims=True) / max(W - 1, 1)
        return jnp.sqrt(var)  # [B, 1]

    # Mosaic requires lane-aligned vector loads, so lag shifts are expressed
    # as lane *rotations* of the full padded row (tpu.dynamic_rotate) instead
    # of unaligned slices.  Rotation never wraps meaningful data into the
    # first Wp lanes because the buffer is sized >= Wp + 2*max_lag.
    wa_full = wa_ref[:, :]  # [B, T]
    T = wa_full.shape[1]

    # audio std must use the *unpadded* window: rotate the centre into lane 0
    centre = pltpu.roll(wa_full, shift=(T - max_lag) % T, axis=1)
    wa_centre = jax.lax.slice(centre, (0, 0), (B, Wp))
    valid = jnp.logical_and(
        masked_std(wa_centre) >= silence_std, masked_std(wm) >= silence_std
    )  # [B, 1]

    max_corr = jnp.full((B, 1), -jnp.inf, jnp.float32)
    sum_abs = jnp.zeros((B, 1), jnp.float32)
    for l in range(n_lags):  # static unroll: n_lags = 2*max_lag+1 (~31)
        rolled = pltpu.roll(wa_full, shift=(T - l) % T, axis=1)
        seg = jax.lax.slice(rolled, (0, 0), (B, Wp))
        c = jnp.sum(seg * wm, axis=1, keepdims=True) * inv_norm  # [B, 1]
        max_corr = jnp.maximum(max_corr, c)
        sum_abs = sum_abs + jnp.abs(c)
    mean_abs = sum_abs / n_lags + EPS
    sharpness = max_corr / mean_abs
    score = jnp.where(
        sharpness < sharpness_threshold, max_corr * sharpness_penalty, max_corr
    )  # [B, 1]

    out_col = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    row = jnp.where(out_col == 0, score, 0.0)
    row = jnp.where(out_col == 1, valid.astype(jnp.float32), row)
    out_ref[:, :] = row


def lip_sync_scores_pallas(
    wm: jax.Array,
    wa_padded: jax.Array,
    window: int,
    max_lag: int,
    norm_div: int,
    silence_std: float = 0.01,
    sharpness_threshold: float = 1.5,
    sharpness_penalty: float = 0.5,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Per-window (score, valid) via a Pallas grid over windows.

    ``wm``: [n_win, Wp] z-normed mouth windows zero-padded to a lane multiple;
    ``wa_padded``: [n_win, Wp + 2*max_lag] audio windows with lag padding
    (zeros outside), zero-padded likewise.
    """
    n_win, Wp = wm.shape
    B = 8  # windows per program — matches the f32 sublane tile
    n_pad = _round_up(n_win, B)
    if n_pad != n_win:
        # zero rows have std 0 -> gated invalid inside the kernel
        wm = jnp.pad(wm, ((0, n_pad - n_win), (0, 0)))
        wa_padded = jnp.pad(wa_padded, ((0, n_pad - n_win), (0, 0)))
    kern = partial(
        _lipsync_window_kernel,
        window=window,
        max_lag=max_lag,
        norm_div=norm_div,
        silence_std=silence_std,
        sharpness_threshold=sharpness_threshold,
        sharpness_penalty=sharpness_penalty,
    )
    out = pl.pallas_call(
        kern,
        grid=(n_pad // B,),
        in_specs=[
            pl.BlockSpec((B, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, wa_padded.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        interpret=interpret,
    )(wm.astype(jnp.float32), wa_padded.astype(jnp.float32))
    out = out[:n_win]
    return out[:, 0], out[:, 1] > 0.5


@partial(
    jax.jit,
    static_argnames=(
        "fps",
        "window_duration_s",
        "max_lag_s",
        "silence_std",
        "sharpness_threshold",
        "sharpness_penalty",
        "interpret",
    ),
)
def lip_sync_score_pallas(
    mouth: jax.Array,
    audio: jax.Array,
    fps: float,
    window_duration_s: float = 5.0,
    max_lag_s: float = 0.5,
    silence_std: float = 0.01,
    sharpness_threshold: float = 1.5,
    sharpness_penalty: float = 0.5,
    interpret: bool = False,
) -> LipSyncResult:
    n = mouth.shape[0]
    window, step, n_win = window_params(n, fps, window_duration_s)
    max_lag = int(fps * max_lag_s)

    m = _znorm(mouth.astype(jnp.float32))
    a = _znorm(audio.astype(jnp.float32))

    widx = jnp.arange(n_win)[:, None] * step + jnp.arange(window)[None, :]
    wm = m[widx]
    wa = a[widx]

    Wp = _round_up(window, 128)
    wm_p = jnp.pad(wm, ((0, 0), (0, Wp - window)))
    # lag padding (zeros) then lane alignment
    wa_lag = jnp.pad(wa, ((0, 0), (max_lag, max_lag)))
    total = _round_up(Wp + 2 * max_lag, 128)
    wa_p = jnp.pad(wa_lag, ((0, 0), (0, total - wa_lag.shape[1])))

    scores, valid = lip_sync_scores_pallas(
        wm_p,
        wa_p,
        window=window,
        max_lag=max_lag,
        norm_div=int(window_duration_s * fps),
        silence_std=silence_std,
        sharpness_threshold=sharpness_threshold,
        sharpness_penalty=sharpness_penalty,
        interpret=interpret,
    )
    return LipSyncResult(
        score=_top_half_mean(scores, valid),
        n_windows=jnp.asarray(n_win),
        n_valid=jnp.sum(valid.astype(jnp.int32)),
    )


def lip_sync_score(
    mouth: np.ndarray,
    audio: np.ndarray,
    fps: float,
    use_pallas: Optional[bool] = None,
    **kwargs,
) -> LipSyncResult:
    """Dispatch: Pallas on TPU, XLA elsewhere (identical numerics, tested)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    fn = lip_sync_score_pallas if use_pallas else lip_sync_score_xla
    return fn(jnp.asarray(mouth), jnp.asarray(audio), float(fps), **kwargs)


_batch_score_cache: dict = {}


def lip_sync_score_batch(
    mouths: np.ndarray,
    audios: np.ndarray,
    fps: float,
    **kwargs,
) -> "list[LipSyncResult]":
    """Batched scoring of same-length signal pairs ``[B, n]`` — one XLA
    dispatch + one host fetch for a whole group of overlapped videos (the
    cross-video program-coalescer path, providers/coalesce.py).  Numerics
    identical to per-video :func:`lip_sync_score_xla` (vmap of the same
    program; the XLA and Pallas paths are bit-identical, tested)."""
    import jax as _jax

    key = (int(np.shape(mouths)[1]), float(fps)) + tuple(sorted(kwargs.items()))
    fn = _batch_score_cache.get(key)
    if fn is None:
        fn = _jax.jit(_jax.vmap(
            lambda m, a: lip_sync_score_xla(m, a, float(fps), **kwargs)))
        _batch_score_cache[key] = fn
    res = fn(jnp.asarray(mouths, jnp.float32), jnp.asarray(audios, jnp.float32))
    scores = np.asarray(res.score)
    n_windows = np.asarray(res.n_windows)
    n_valid = np.asarray(res.n_valid)
    return [LipSyncResult(score=scores[i], n_windows=n_windows[i],
                          n_valid=n_valid[i]) for i in range(len(scores))]
