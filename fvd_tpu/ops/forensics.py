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


@partial(jax.jit, static_argnames=("quality",))
def jpeg_roundtrip_channel(channel: jax.Array, quality: int = 90) -> jax.Array:
    """Approximate one JPEG encode/decode cycle for a single channel
    (float [H, W], 0..255): blockwise DCT -> quantize -> dequantize -> IDCT."""
    h, w = channel.shape
    hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
    padded = jnp.pad(channel, ((0, hp - h), (0, wp - w)), mode="edge")
    return _roundtrip_padded(padded, quality)[:h, :w]


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


def _roundtrip_padded(channel: jax.Array, quality: int) -> jax.Array:
    """JPEG roundtrip for an already-8-multiple [HP, WP] channel (no slice)."""
    hp, wp = channel.shape
    D = jnp.asarray(dct_matrix())
    Q = jnp.asarray(quant_table(quality))
    blocks = (channel - 128.0).reshape(hp // 8, 8, wp // 8, 8).transpose(0, 2, 1, 3)
    blocks = blocks.reshape(-1, 8, 8)
    coeffs = jnp.einsum("ij,njk,lk->nil", D, blocks, D,
                        preferred_element_type=jnp.float32)
    quantized = jnp.round(coeffs / Q) * Q
    recon = jnp.einsum("ji,njk,kl->nil", D, quantized, D,
                       preferred_element_type=jnp.float32)
    out = recon.reshape(hp // 8, wp // 8, 8, 8).transpose(0, 2, 1, 3).reshape(hp, wp)
    return jnp.clip(out + 128.0, 0.0, 255.0)


@partial(jax.jit, static_argnames=("quality",))
def _ela_batch_program(crops: jax.Array, hw: jax.Array, quality: int):
    """Masked per-crop ELA over a shape-bucketed batch.

    ``crops`` uint8 [N, HB, WB, 3] edge-padded; ``hw`` int32 [N, 2] true
    sizes.  Per crop the math matches :func:`ela_image` exactly: DCT blocks
    are 8x8-local, so edge padding beyond ceil8(h/w) never touches the real
    region, and the global rescale maxes over the unmasked area only.
    """
    hb, wb = crops.shape[1], crops.shape[2]
    row_ids = jnp.arange(hb)[:, None]
    col_ids = jnp.arange(wb)[None, :]

    def one(crop, size):
        x = crop.astype(jnp.float32)
        recon = jnp.stack(
            [_roundtrip_padded(x[..., c], quality) for c in range(3)], axis=-1
        )
        diff = jnp.abs(x - jnp.round(recon))
        mask = ((row_ids < size[0]) & (col_ids < size[1]))[..., None]
        diff = jnp.where(mask, diff, 0.0)
        max_diff = jnp.maximum(jnp.max(diff), 1.0)
        return jnp.clip(diff * (255.0 / max_diff), 0.0, 255.0)

    return jax.vmap(one)(crops, hw)


_ELA_BATCH_N = 4  # top_k_faces is 3; fixed N keeps one compile per HW bucket


def ela_batch(crops, quality: int = 90):
    """ELA images for a list of variable-size RGB uint8 crops in ONE device
    dispatch.

    Crops pad (edge mode) to a shared 64-quantized bucket and run through a
    single vmapped program; results slice back to each crop's true size.
    Shape buckets bound the compile count where per-crop jit would compile
    for every distinct face-crop geometry (V5 sees arbitrary sizes,
    reference ``v5:33-42`` top-3 selection).
    """
    if len(crops) == 0:
        return []
    step = 64
    hb = max(step, -(-max(c.shape[0] for c in crops) // step) * step)
    wb = max(step, -(-max(c.shape[1] for c in crops) // step) * step)
    batch = np.zeros((_ELA_BATCH_N, hb, wb, 3), np.uint8)
    hw = np.full((_ELA_BATCH_N, 2), 8, np.int32)
    for i, c in enumerate(crops[:_ELA_BATCH_N]):
        h, w = c.shape[:2]
        batch[i] = np.pad(c, ((0, hb - h), (0, wb - w), (0, 0)), mode="edge")
        hw[i] = (h, w)
    out = np.asarray(_ela_batch_program(jnp.asarray(batch), jnp.asarray(hw), quality))
    results = [out[i, : c.shape[0], : c.shape[1]] for i, c in enumerate(crops[:_ELA_BATCH_N])]
    # >N crops (config raised above the bucket): per-crop fallback
    for c in crops[_ELA_BATCH_N:]:
        results.append(np.asarray(ela_image(jnp.asarray(c), quality)))
    return results


def rgb_to_gray_host(rgb: np.ndarray) -> np.ndarray:
    """Host BT.601 luma (identical coefficients to :func:`rgb_to_gray`)."""
    x = rgb.astype(np.float32)
    return 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]


def fft_spectrum_host(gray: np.ndarray) -> np.ndarray:
    """Host twin of :func:`fft_spectrum`.

    The 2D FFT is global over the exact crop shape, so a device version
    compiles one program per distinct face-crop geometry — for a ~100px
    crop the compile + dispatch round trip costs orders of magnitude more
    than the transform itself.  V5 uses this host path; the device kernel
    remains for batched/fixed-shape callers.
    """
    f = np.fft.fftshift(np.fft.fft2(gray.astype(np.float32)))
    mag = 20.0 * np.log(np.abs(f) + 1.0)
    lo, hi = float(mag.min()), float(mag.max())
    if hi <= lo:
        return np.zeros_like(mag, np.float32)
    return ((mag - lo) * (255.0 / (hi - lo))).astype(np.float32)


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
