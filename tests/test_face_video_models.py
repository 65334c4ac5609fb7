"""Real-model path over procedural-face video.

The reference's V-nodes run real pretrained models (SSD v1:105-108, FAN
v3:130/v4:131). Here the trained JAX checkpoints analyze a rendered face
video: the detector must find the face, and the landmark regressor's mouth
aperture (MAR) must track the audio gate — the signal C1's lip-sync score
is built on.
"""

import os

import numpy as np
import pytest

CKPT_DIR = os.path.join(os.path.dirname(__file__), "..", "checkpoints")
HAS_CKPTS = all(
    os.path.exists(os.path.join(CKPT_DIR, f))
    for f in ("face_ssd.npz", "landmarks.npz")
)


def _mar(mouth: np.ndarray) -> float:
    v = (abs(mouth[2, 1] - mouth[10, 1]) + abs(mouth[3, 1] - mouth[9, 1])
         + abs(mouth[4, 1] - mouth[8, 1]))
    h = abs(mouth[0, 0] - mouth[6, 0])
    return float(v / (3 * h)) if h > 0 else 0.0


@pytest.mark.skipif(not HAS_CKPTS, reason="no trained vision checkpoints")
def test_trained_models_handle_heldout_video(tmp_path):
    """make_face_video(heldout=True): striped background, out-of-range
    eccentricity/skin, glasses + hair — the shipped (augmentation-hardened)
    detector must still find the face on most frames."""
    from fvd_tpu.providers.factory import production_providers
    from fvd_tpu.providers.media import VideoReader, clear_frame_cache
    from fvd_tpu.synthetic import make_face_video

    path = make_face_video(str(tmp_path), "ho", duration=2.0, fps=10.0,
                           gate_hz=1.0, seed=7, heldout=True)
    prov = production_providers(checkpoint_dir=os.path.abspath(CKPT_DIR),
                                use_llm=False, use_search=False)
    clear_frame_cache()
    frames, kept = VideoReader().sample(path, list(range(20)))
    assert len(kept) >= 15
    dets = prov.face_detector.detect_batch(frames)
    det_rate = sum(1 for d in dets if d) / len(dets)
    assert det_rate >= 0.6, f"held-out detection rate {det_rate}"


@pytest.mark.skipif(not HAS_CKPTS, reason="no trained vision checkpoints")
def test_trained_models_track_face_video(tmp_path):
    from fvd_tpu.providers.factory import production_providers
    from fvd_tpu.providers.media import VideoReader, clear_frame_cache
    from fvd_tpu.synthetic import make_face_video

    fps, gate_hz = 10.0, 1.0
    path = make_face_video(str(tmp_path), "face", duration=4.0, fps=fps,
                           gate_hz=gate_hz)
    prov = production_providers(checkpoint_dir=os.path.abspath(CKPT_DIR),
                                use_llm=False, use_search=False)
    clear_frame_cache()
    frames, kept = VideoReader().sample(path, list(range(40)))
    assert len(kept) >= 30

    dets = prov.face_detector.detect_batch(frames)
    det_rate = sum(1 for d in dets if d) / len(dets)
    assert det_rate >= 0.8, f"detection rate {det_rate}"

    lms = prov.landmarks.landmarks_batch(frames)
    ok = [i for i, l in enumerate(lms) if l]
    assert len(ok) >= 0.8 * len(lms)

    mars = np.array([_mar(np.asarray(lms[i][0])[48:68]) for i in ok])
    gate = 0.5 * (1 + np.sin(2 * np.pi * gate_hz * (np.asarray(kept)[ok] / fps)))
    corr = float(np.corrcoef(mars, gate)[0, 1])
    # aperture-varied retrain reaches ~0.98; the margin keeps CPU/TPU
    # numeric drift from flaking the suite
    assert corr > 0.8, f"MAR/gate correlation {corr}"


def test_sensor_noise_degrades_whole_frame(tmp_path):
    """sensor_noise (the hard-real false-positive lever) is whole-frame
    capture degradation: background pixels move, not just the face region
    (unlike texture_noise), and the clip remains decodable."""
    import cv2

    from fvd_tpu.synthetic import make_face_video

    clean = make_face_video(str(tmp_path), "clean", duration=1.0, fps=5.0,
                            seed=3)
    noisy = make_face_video(str(tmp_path), "noisy", duration=1.0, fps=5.0,
                            seed=3, sensor_noise=24.0)
    fc, fn = cv2.VideoCapture(clean), cv2.VideoCapture(noisy)
    ok_c, a = fc.read()
    ok_n, b = fn.read()
    fc.release(), fn.release()
    assert ok_c and ok_n
    # corner patch is pure background in both renders
    corner_delta = (a[:40, :40].astype(int) - b[:40, :40].astype(int))
    assert float(np.abs(corner_delta).mean()) > 5.0


def test_hard_real_recipes_have_no_claimable_sentence():
    """HARD_REAL_RECIPES pair degradation with <4-word exclamations, so C3
    extracts zero claims and claim/evidence reliability stay 0 (the
    reference's Biden-clip signature); labels must parse as REAL."""
    from fvd_tpu.batch import get_label
    from tools.make_labeled_corpus import HARD_REAL_RECIPES

    for recipe, text in HARD_REAL_RECIPES:
        assert len(text.split()) < 4
        assert recipe.get("sensor_noise", 0) > 0
        assert "mouth_gate_hz" not in recipe  # genuine clips: no manipulation
        assert "texture_noise" not in recipe
    assert get_label("clip16_real_vlog.mp4") == 0


@pytest.mark.skipif(not HAS_CKPTS, reason="no trained vision checkpoints")
def test_detector_heldout_all_factors_floor():
    """Pin the round-3 photometric continuation's weakest-cell gain: the
    all-factors held-out cell (stripes + ecc/skin + accessories + rotation
    at once) measured 0.757 at n=64; guard a sampling-safe floor so a
    future checkpoint adoption can't silently regress it."""
    import jax.numpy as jnp

    from fvd_tpu.models import face_ssd
    from tools.diagnose_det_heldout import render_factored
    from tools.eval_heldout import _iou

    params = face_ssd.load_params(os.path.join(CKPT_DIR, "face_ssd.npz"))
    rng = np.random.RandomState(11)
    n = 24
    frames = np.zeros((n, 300, 300, 3), np.uint8)
    gts = np.zeros((n, 4), np.float32)
    for i in range(n):
        frames[i], gts[i], _ = render_factored(
            rng, 300, stripes=True, ecc_skin=True, accessories=True,
            rotation=True)
    boxes, _ = face_ssd.detect_batch_jit(params, jnp.asarray(frames))
    boxes = np.asarray(boxes)
    iou = float(np.mean([_iou(boxes[i, 0], gts[i]) for i in range(n)]))
    assert iou >= 0.62, f"held-out all-factors IoU regressed: {iou}"
