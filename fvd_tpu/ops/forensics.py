"""Image forensics kernels: JPEG-domain ELA and FFT magnitude spectrum.

Reference V5 (``nodes/V_nodes/v5_texture_ela.py:56-91``) does ELA by
re-saving through PIL's JPEG encoder at quality 90 and brightness-rescaling
the diff, plus a ``numpy.fft.fft2`` log-magnitude spectrum.

TPU-native: JPEG recompression is approximated *in the DCT domain* — 8x8
blockwise DCT (two 8x8 matmuls per block, MXU-friendly), quantization with
the scaled standard luminance table, dequantize, inverse DCT — so the whole
ELA image for a batch of crops is one fused device program with no host
JPEG codec round-trip.  The FFT spectrum is ``jnp.fft.fft2``.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

# Standard JPEG luminance quantization table (Annex K of ITU-T.81 — the same
# base table PIL/libjpeg scale by quality).
_BASE_QUANT = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float32,
)


@lru_cache(maxsize=8)
def quant_table(quality: int) -> np.ndarray:
    """libjpeg quality scaling: q>=50 -> scale=200-2q, else 5000/q."""
    q = max(1, min(100, quality))
    scale = 200 - 2 * q if q >= 50 else 5000 // q
    table = np.floor((_BASE_QUANT * scale + 50) / 100)
    return np.clip(table, 1, 255).astype(np.float32)


@lru_cache(maxsize=1)
def dct_matrix() -> np.ndarray:
    """8x8 type-II orthonormal DCT matrix."""
    k = np.arange(8)
    n = np.arange(8)
    M = np.cos((2 * n[None, :] + 1) * k[:, None] * np.pi / 16)
    M[0] *= 1 / np.sqrt(2)
    return (M * 0.5).astype(np.float32)


def _to_blocks(img: jax.Array) -> jax.Array:
    """[H, W] -> [H/8 * W/8, 8, 8] (H, W padded to multiples of 8)."""
    h, w = img.shape
    hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
    img = jnp.pad(img, ((0, hp - h), (0, wp - w)), mode="edge")
    blocks = img.reshape(hp // 8, 8, wp // 8, 8).transpose(0, 2, 1, 3)
    return blocks.reshape(-1, 8, 8)


def _from_blocks(blocks: jax.Array, h: int, w: int) -> jax.Array:
    hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
    img = blocks.reshape(hp // 8, wp // 8, 8, 8).transpose(0, 2, 1, 3).reshape(hp, wp)
    return img[:h, :w]


@partial(jax.jit, static_argnames=("quality",))
def jpeg_roundtrip_channel(channel: jax.Array, quality: int = 90) -> jax.Array:
    """Approximate one JPEG encode/decode cycle for a single channel
    (float [H, W], 0..255): blockwise DCT -> quantize -> dequantize -> IDCT."""
    h, w = channel.shape
    D = jnp.asarray(dct_matrix())
    Q = jnp.asarray(quant_table(quality))
    blocks = _to_blocks(channel - 128.0)
    coeffs = jnp.einsum("ij,njk,lk->nil", D, blocks, D, preferred_element_type=jnp.float32)
    quantized = jnp.round(coeffs / Q) * Q
    recon = jnp.einsum("ji,njk,kl->nil", D, quantized, D, preferred_element_type=jnp.float32)
    out = _from_blocks(recon, h, w) + 128.0
    return jnp.clip(out, 0.0, 255.0)


@partial(jax.jit, static_argnames=("quality",))
def ela_image(rgb: jax.Array, quality: int = 90) -> jax.Array:
    """Error-level-analysis image for an RGB uint8 [H, W, 3] crop.

    diff = |orig - jpeg_roundtrip(orig)| per channel, globally rescaled by
    255/max_diff (reference v5:70-78); returns float [H, W, 3] in 0..255.
    """
    x = rgb.astype(jnp.float32)
    recon = jnp.stack(
        [jpeg_roundtrip_channel(x[..., c], quality) for c in range(3)], axis=-1
    )
    diff = jnp.abs(x - jnp.round(recon))
    max_diff = jnp.maximum(jnp.max(diff), 1.0)
    return jnp.clip(diff * (255.0 / max_diff), 0.0, 255.0)


@partial(jax.jit, static_argnames=("quality",))
def forensics_program(rgb: jax.Array, quality: int = 90):
    """Whole per-crop V5 device stage in ONE dispatch: ELA image + FFT
    log-magnitude spectrum of the luma channel."""
    ela = ela_image(rgb, quality)
    spectrum = fft_spectrum(rgb_to_gray(rgb))
    return ela, spectrum


@jax.jit
def fft_spectrum(gray: jax.Array) -> jax.Array:
    """20*log(|fftshift(fft2(gray))| + 1), min-max normalized to 0..255
    (reference v5:83-88)."""
    f = jnp.fft.fftshift(jnp.fft.fft2(gray.astype(jnp.float32)))
    mag = 20.0 * jnp.log(jnp.abs(f) + 1.0)
    lo, hi = jnp.min(mag), jnp.max(mag)
    return jnp.where(hi > lo, (mag - lo) * (255.0 / (hi - lo)), jnp.zeros_like(mag))


def rgb_to_gray(rgb: jax.Array) -> jax.Array:
    """ITU-R BT.601 luma (what cv2.IMREAD_GRAYSCALE uses, v5:83)."""
    x = rgb.astype(jnp.float32)
    return 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
