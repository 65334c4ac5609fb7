"""On-device polyphase audio resampling.

The reference resamples with ffmpeg's swresample via MoviePy
(``a1_demux_audio_extract.py:24-31``).  Here the rational-rate resampler is a
single XLA convolution: zero-stuff by L (``lhs_dilation``), low-pass with a
Kaiser-windowed sinc, decimate by M (``window_strides``) — the whole
polyphase structure is expressed to the compiler in one
``lax.conv_general_dilated`` so it fuses and runs from HBM without host
round-trips.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def _kaiser_beta(atten_db: float) -> float:
    if atten_db > 50:
        return 0.1102 * (atten_db - 8.7)
    if atten_db >= 21:
        return 0.5842 * (atten_db - 21) ** 0.4 + 0.07886 * (atten_db - 21)
    return 0.0


@lru_cache(maxsize=32)
def _design_lowpass(L: int, M: int, half_width: int = 16, atten_db: float = 80.0) -> np.ndarray:
    """Kaiser-windowed sinc low-pass at cutoff min(1/L, 1/M), gain L."""
    cutoff = 1.0 / max(L, M)  # in units of the upsampled Nyquist
    taps = 2 * half_width * max(L, M) + 1
    n = np.arange(taps) - (taps - 1) / 2
    h = cutoff * np.sinc(cutoff * n)
    beta = _kaiser_beta(atten_db)
    h *= np.kaiser(taps, beta)
    h = h / h.sum() * L  # DC gain L compensates the zero-stuffing
    return h.astype(np.float32)


@partial(jax.jit, static_argnames=("L", "M", "out_len"))
def _resample_conv(x: jax.Array, h: jax.Array, L: int, M: int, out_len: int) -> jax.Array:
    taps = h.shape[0]
    pad = (taps - 1) // 2
    lhs = x[None, None, :]                      # NCW
    rhs = h[::-1][None, None, :]                # OIW (conv flips; we want correlation)
    y = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(M,),
        padding=[(pad, pad + M)],
        lhs_dilation=(L,),
        dimension_numbers=("NCW", "OIW", "NCW"),
    )[0, 0]
    return y[:out_len]


def resample(x, orig_sr: int, target_sr: int):
    """Resample a 1-D signal from ``orig_sr`` to ``target_sr``.

    Returns a jax.Array of length ``ceil(len(x) * target_sr / orig_sr)``.
    """
    if orig_sr == target_sr:
        return jnp.asarray(x, jnp.float32)
    g = math.gcd(orig_sr, target_sr)
    L, M = target_sr // g, orig_sr // g
    x = jnp.asarray(x, jnp.float32)
    out_len = -(-x.shape[0] * L // M)  # ceil
    h = jnp.asarray(_design_lowpass(L, M))
    return _resample_conv(x, h, L, M, out_len)


_resample_batch_cache: dict = {}


def resample_batch(xs, orig_sr: int, target_sr: int):
    """vmapped :func:`resample` over same-length signals ``xs [B, n]`` —
    the cross-video-coalesced A1 path (one dispatch per group of
    overlapped videos instead of one per video)."""
    if orig_sr == target_sr:
        return jnp.asarray(xs, jnp.float32)
    key = (int(xs.shape[1]), orig_sr, target_sr)
    fn = _resample_batch_cache.get(key)
    if fn is None:
        fn = jax.jit(jax.vmap(lambda x: resample(x, orig_sr, target_sr)))
        _resample_batch_cache[key] = fn
    return fn(jnp.asarray(xs, jnp.float32))
