"""C1 lip-sync tests.

Ports the reference's synthetic-signal golden bands
(``tests/test_c1_lip_sync_score.py``: perfect > 0.8, delayed > 0.7,
random < 0.4, silence == 0, static face == 0) and the half-silence
robustness case (``tests/test_robustness_fixes.py``), plus XLA-vs-Pallas
kernel equivalence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fvd_tpu.nodes import c1_lipsync
from fvd_tpu.ops import lipsync
from fvd_tpu.state import State


def generate_signals(duration, fps, sync_type="perfect", seed=42):
    """Reference generator (test_c1_lip_sync_score.py:22-56)."""
    rng = np.random.RandomState(seed)
    num_frames = int(duration * fps)
    t = np.linspace(0, duration, num_frames)

    envelope = 0.5 * (1 + np.sin(2 * np.pi * 2 * t))
    envelope += 0.1 * rng.rand(len(t))
    envelope = np.clip(envelope, 0, 1)

    audio = envelope
    if sync_type == "perfect":
        mouth = envelope
    elif sync_type == "delayed":
        mouth = np.roll(envelope, int(0.1 * fps))
    elif sync_type == "random":
        mouth = rng.rand(len(t))
    elif sync_type == "silence":
        audio = np.zeros_like(t)
        mouth = envelope
    elif sync_type == "static_face":
        mouth = np.zeros_like(t)
    else:
        mouth = envelope

    landmarks = [{"timestamp": t[i], "mar": v * 0.5 + 0.1} for i, v in enumerate(mouth)]
    return audio, landmarks, mouth


def _state(audio, landmarks, duration=5.0, fps=30.0):
    return State(
        input_path="dummy.mp4",
        metadata={"duration": duration, "fps": fps},
        mouth_landmarks=landmarks,
        face_detections=[{"box": [0, 0, 100, 100]}],
        test_audio_signal=audio,
    )


# ---------------------------------------------------------------------------
# Reference golden bands (node-level)
# ---------------------------------------------------------------------------
def test_perfect_sync():
    audio, landmarks, _ = generate_signals(5.0, 30.0, "perfect")
    delta = c1_lipsync.run(_state(audio, landmarks))
    assert delta["lip_sync_score"] > 0.8


def test_delayed_sync():
    audio, landmarks, _ = generate_signals(5.0, 30.0, "delayed")
    delta = c1_lipsync.run(_state(audio, landmarks))
    assert delta["lip_sync_score"] > 0.7


def test_no_sync_random():
    audio, landmarks, _ = generate_signals(5.0, 30.0, "random")
    delta = c1_lipsync.run(_state(audio, landmarks))
    assert delta["lip_sync_score"] < 0.4


def test_silence():
    audio, landmarks, _ = generate_signals(5.0, 30.0, "silence")
    delta = c1_lipsync.run(_state(audio, landmarks))
    assert delta["lip_sync_score"] == 0.0


def test_static_face():
    audio, landmarks, _ = generate_signals(5.0, 30.0, "static_face")
    delta = c1_lipsync.run(_state(audio, landmarks))
    assert delta["lip_sync_score"] == 0.0


def test_half_silence_robustness():
    """Half speech + half silence must still score well on the speaking half
    (reference tests/test_robustness_fixes.py:12-50)."""
    duration, fps = 10.0, 30.0
    audio, landmarks, mouth = generate_signals(duration, fps, "perfect")
    n = len(audio)
    audio = audio.copy()
    audio[n // 2 :] = 0.0
    for lm in landmarks[n // 2 :]:
        lm["mar"] = 0.1
    delta = c1_lipsync.run(_state(audio, landmarks, duration, fps))
    assert delta["lip_sync_score"] > 0.5


# ---------------------------------------------------------------------------
# Early-outs (c1:35-97)
# ---------------------------------------------------------------------------
def test_no_faces_early_out():
    audio, landmarks, _ = generate_signals(5.0, 30.0)
    st = _state(audio, landmarks)
    st.face_detections = []
    assert c1_lipsync.run(st)["lip_sync_score"] == 0.0


def test_no_landmarks_early_out():
    audio, _, _ = generate_signals(5.0, 30.0)
    st = _state(audio, [])
    assert c1_lipsync.run(st)["lip_sync_score"] == 0.0


def test_no_fps_early_out():
    audio, landmarks, _ = generate_signals(5.0, 30.0)
    st = _state(audio, landmarks)
    st.metadata = {"duration": 5.0}
    assert c1_lipsync.run(st)["lip_sync_score"] == 0.0


def test_no_audio_early_out():
    _, landmarks, _ = generate_signals(5.0, 30.0)
    st = _state(None, landmarks)
    st.test_audio_signal = None
    st.audio_envelope = None
    assert c1_lipsync.run(st)["lip_sync_score"] == 0.0


def test_audio_length_mismatch_reconciled():
    audio, landmarks, _ = generate_signals(5.0, 30.0, "perfect")
    short_audio = audio[::2]  # half-length audio -> np.interp resize path
    delta = c1_lipsync.run(_state(short_audio, landmarks))
    assert delta["lip_sync_score"] > 0.7


# ---------------------------------------------------------------------------
# MAR math
# ---------------------------------------------------------------------------
def test_calculate_mar_known_geometry():
    pts = np.zeros((20, 2))
    pts[0] = [0, 0]
    pts[6] = [6, 0]          # horizontal D = 6
    pts[2], pts[10] = [2, 1], [2, -1]   # A = 2
    pts[3], pts[9] = [3, 2], [3, -2]    # B = 4
    pts[4], pts[8] = [4, 1.5], [4, -1.5]  # C = 3
    assert c1_lipsync.calculate_mar(pts) == pytest.approx((2 + 4 + 3) / (3 * 6))


def test_calculate_mar_degenerate():
    assert c1_lipsync.calculate_mar(np.zeros((19, 2))) == 0.0
    assert c1_lipsync.calculate_mar(np.zeros((20, 2))) == 0.0  # D == 0


def test_mar_batch_matches_scalar():
    rng = np.random.RandomState(0)
    pts = rng.rand(7, 20, 2).astype(np.float32) * 100
    batch = np.asarray(lipsync.mar_from_points(jnp.asarray(pts)))
    scalars = [c1_lipsync.calculate_mar(p) for p in pts]
    np.testing.assert_allclose(batch, scalars, rtol=1e-5)


# ---------------------------------------------------------------------------
# Kernel equivalence: XLA einsum path vs Pallas path (interpret on CPU)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("sync_type", ["perfect", "delayed", "random", "silence"])
def test_xla_vs_pallas(sync_type):
    audio, _, mouth = generate_signals(12.0, 30.0, sync_type)
    interpret = jax.default_backend() != "tpu"
    r_xla = lipsync.lip_sync_score_xla(jnp.asarray(mouth), jnp.asarray(audio), 30.0)
    r_pl = lipsync.lip_sync_score_pallas(
        jnp.asarray(mouth), jnp.asarray(audio), 30.0, interpret=interpret
    )
    assert float(r_xla.score) == pytest.approx(float(r_pl.score), abs=1e-5)
    assert int(r_xla.n_valid) == int(r_pl.n_valid)


def test_short_signal_single_window_normalization():
    """A 2 s signal at 30 fps is one 60-sample window but the reference still
    normalizes by int(5*fps)=150 — scores shrink accordingly."""
    audio, _, mouth = generate_signals(2.0, 30.0, "perfect")
    r = lipsync.lip_sync_score_xla(jnp.asarray(mouth), jnp.asarray(audio), 30.0)
    assert int(r.n_windows) == 1
    # perfect correlation of a 60-sample z-normed window ≈ 60/150 = 0.4
    assert 0.25 < float(r.score) < 0.55


def test_multi_window_counts():
    audio, _, mouth = generate_signals(20.0, 30.0, "perfect")
    r = lipsync.lip_sync_score_xla(jnp.asarray(mouth), jnp.asarray(audio), 30.0)
    # n = 600, W = 150, step 75 -> (600-150)//75+1 = 7
    assert int(r.n_windows) == 7
    assert int(r.n_valid) == 7
