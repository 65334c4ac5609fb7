"""V5 forensics kernel tests: DCT JPEG roundtrip, ELA, FFT spectrum."""

import numpy as np
import pytest

import jax.numpy as jnp

from fvd_tpu.nodes import v5_forensics
from fvd_tpu.ops import forensics
from fvd_tpu.providers import Providers, ScriptedLLM
from fvd_tpu.state import State


def test_quant_table_quality_scaling():
    q90 = forensics.quant_table(90)
    q50 = forensics.quant_table(50)
    q10 = forensics.quant_table(10)
    assert (q90 <= q50).all() and (q50 <= q10).all()
    assert q90.min() >= 1
    # q=50 returns the base table exactly
    np.testing.assert_array_equal(q50, forensics._BASE_QUANT)


def test_dct_matrix_orthonormal():
    D = forensics.dct_matrix()
    np.testing.assert_allclose(D @ D.T, np.eye(8), atol=1e-6)


def test_jpeg_roundtrip_smooth_image_nearly_lossless():
    x = np.tile(np.linspace(50, 200, 64, dtype=np.float32), (64, 1))
    y = np.asarray(forensics.jpeg_roundtrip_channel(jnp.asarray(x), 90))
    assert np.abs(y - x).max() < 6.0


def test_jpeg_roundtrip_attenuates_noise():
    rng = np.random.RandomState(0)
    x = 128 + 40 * rng.randn(64, 64).astype(np.float32)
    y = np.asarray(forensics.jpeg_roundtrip_channel(jnp.asarray(np.clip(x, 0, 255)), 90))
    # quantization must change a noisy image measurably
    assert np.abs(y - np.clip(x, 0, 255)).mean() > 0.5


def test_ela_highlights_noisy_region():
    rng = np.random.RandomState(0)
    img = np.full((64, 64, 3), 128, np.uint8)
    img[16:32, 16:32] = rng.randint(0, 255, (16, 16, 3)).astype(np.uint8)
    ela = np.asarray(forensics.ela_image(jnp.asarray(img), 90))
    noisy_energy = ela[16:32, 16:32].mean()
    smooth_energy = ela[48:, 48:].mean()
    assert noisy_energy > 5 * (smooth_energy + 1e-6)
    assert ela.max() <= 255.0 and ela.min() >= 0.0


def test_fft_spectrum_dc_peak_centered():
    img = np.full((64, 64), 100.0, np.float32)
    spec = np.asarray(forensics.fft_spectrum(jnp.asarray(img)))
    assert spec.shape == (64, 64)
    assert spec[32, 32] == spec.max()  # DC centered by fftshift


def test_rgb_to_gray_bt601():
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[..., 1] = 255
    gray = np.asarray(forensics.rgb_to_gray(jnp.asarray(rgb)))
    assert gray[0, 0] == pytest.approx(0.587 * 255, rel=1e-5)


def test_ela_batch_matches_per_crop_for_mixed_shapes():
    """The shape-bucketed batched program must reproduce the per-crop kernel
    exactly (masked max + edge padding never leak into the real region)."""
    rng = np.random.RandomState(1)
    crops = [
        rng.randint(0, 255, (33, 47, 3)).astype(np.uint8),
        rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
        rng.randint(0, 255, (50, 21, 3)).astype(np.uint8),
    ]
    batched = forensics.ela_batch(crops, 90)
    for crop, got in zip(crops, batched):
        want = np.asarray(forensics.ela_image(jnp.asarray(crop), 90))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-3)


def test_ela_batch_overflow_falls_back_per_crop():
    rng = np.random.RandomState(2)
    crops = [rng.randint(0, 255, (24, 24, 3)).astype(np.uint8) for _ in range(6)]
    batched = forensics.ela_batch(crops, 90)
    assert len(batched) == 6
    want = np.asarray(forensics.ela_image(jnp.asarray(crops[5]), 90))
    np.testing.assert_allclose(batched[5], want, atol=1e-3)


def test_fft_spectrum_host_matches_device():
    rng = np.random.RandomState(3)
    gray = rng.randint(0, 255, (48, 72)).astype(np.float32)
    host = forensics.fft_spectrum_host(gray)
    dev = np.asarray(forensics.fft_spectrum(jnp.asarray(gray)))
    np.testing.assert_allclose(host, dev, atol=2e-2)
    # degenerate all-zero input: magnitude map is constant -> zero guard
    assert forensics.fft_spectrum_host(np.zeros((16, 16), np.float32)).max() == 0.0


# ---------------------------------------------------------------------------
# V5 node behavior (reference tests/test_v5_texture_ela.py semantics)
# ---------------------------------------------------------------------------
def _detections(crop):
    return [
        {
            "frame_id": 0,
            "timestamp": 0.0,
            "faces": [
                {"bbox": {"x": 0, "y": 0, "w": 32, "h": 32}, "confidence": 0.9,
                 "is_main": True, "crop": crop}
            ],
            "keyframe_path": "x",
        }
    ]


def test_v5_no_faces_zero():
    delta = v5_forensics.run(State(face_detections=[]), providers=Providers())
    assert delta["texture_ela_score"] == 0.0
    assert delta["texture_ela_details"]["reason"] == "No faces found"


def test_v5_no_crops_zero():
    state = State(face_detections=[{"frame_id": 0, "faces": []}])
    delta = v5_forensics.run(state, providers=Providers())
    assert delta["texture_ela_details"]["reason"] == "No face crops available"


def test_v5_no_llm_zero_with_reason(tmp_path):
    crop = np.random.RandomState(0).randint(0, 255, (32, 32, 3)).astype(np.uint8)
    state = State(face_detections=_detections(crop), data_dir=str(tmp_path))
    delta = v5_forensics.run(state, providers=Providers())
    assert delta["texture_ela_score"] == 0.0
    assert delta["texture_ela_details"]["reason"] == "Analysis failed or no keys"


def test_v5_scores_mean_of_llm_results(tmp_path):
    crop = np.random.RandomState(0).randint(0, 255, (32, 32, 3)).astype(np.uint8)
    dets = _detections(crop) + [
        {
            "frame_id": 1,
            "timestamp": 1.0,
            "faces": [{"bbox": {"x": 0, "y": 0, "w": 40, "h": 40}, "confidence": 0.8,
                       "is_main": True, "crop": crop}],
            "keyframe_path": "y",
        }
    ]
    llm = ScriptedLLM(queue=[
        {"fake_probability": 0.8, "reasoning": "a"},
        {"fake_probability": 0.4, "reasoning": "b"},
    ])
    state = State(face_detections=dets, data_dir=str(tmp_path))
    delta = v5_forensics.run(state, providers=Providers(llm=llm))
    assert delta["texture_ela_score"] == pytest.approx(0.6)
    # artifacts saved
    import os

    assert os.path.exists(os.path.join(str(tmp_path), "ela_analysis", "ela_0.jpg"))
    assert os.path.exists(os.path.join(str(tmp_path), "ela_analysis", "fft_0.jpg"))


def test_v5_top3_selection_by_confidence_area(tmp_path):
    crop = np.zeros((8, 8, 3), np.uint8)
    def det(fid, conf, wh):
        return {
            "frame_id": fid, "timestamp": float(fid),
            "faces": [{"bbox": {"x": 0, "y": 0, "w": wh, "h": wh}, "confidence": conf,
                       "is_main": True, "crop": crop}],
            "keyframe_path": "k",
        }
    dets = [det(0, 0.9, 10), det(1, 0.9, 100), det(2, 0.9, 50), det(3, 0.9, 80)]
    llm = ScriptedLLM(default={"fake_probability": 0.5, "reasoning": "r"})
    state = State(face_detections=dets, data_dir=str(tmp_path))
    delta = v5_forensics.run(state, providers=Providers(llm=llm))
    # only 3 analyzed (top-K), 4th skipped
    assert len(delta["texture_ela_details"]) == 3
