"""Progressive (streaming) analysis: chunk updates, prefix scoring."""

import numpy as np
import pytest

from fvd_tpu.providers import Providers
from fvd_tpu.streaming import ProgressiveAnalyzer, analyze_progressive
from fvd_tpu.synthetic import SyntheticLandmarks, make_synthetic_video


@pytest.fixture
def video(tmp_path):
    # 6 s at 10 fps with a gate-matched sibling wav
    return make_synthetic_video(str(tmp_path), name="stream", duration=6.0,
                                fps=10.0, width=160, height=120)


def _providers():
    return Providers(landmarks=SyntheticLandmarks(fps=10.0, gate_hz=1.0))


def test_progressive_updates_cover_video(video):
    updates = list(analyze_progressive(video, providers=_providers(),
                                       chunk_seconds=2.0))
    # 6 s sampled at 5 fps = 30 samples; 2 s chunks of 10 -> 3 updates
    assert len(updates) == 3
    fractions = [u.fraction for u in updates]
    assert fractions == sorted(fractions)
    assert fractions[-1] == pytest.approx(1.0, abs=0.05)
    assert updates[-1].mouth_samples == 30
    for u in updates:
        assert 0.0 <= u.fake_probability <= 1.0
        assert set(u.features) == {
            "speech_rate", "pause_ratio", "lip_sync", "gesture_score",
            "blink_rate", "headpose_jerk", "texture", "claim_reliability",
            "evidence_reliability",
        }


def test_progressive_lipsync_converges_positive(video):
    """Synced synthetic media: the running lip-sync signal must be real
    (positive) once enough prefix has accumulated, and blink_rate reflects
    the accumulated samples (reference quirk: counts samples)."""
    updates = list(analyze_progressive(video, providers=_providers(),
                                       chunk_seconds=2.0))
    final = updates[-1]
    assert final.features["lip_sync"] > 0.3
    assert final.features["blink_rate"] == 1.0  # 30 samples over 6 s, capped
    # early prefix already produces a usable probability
    assert updates[0].features["lip_sync"] >= 0.0


def test_progressive_no_landmark_provider_yields_nothing(video):
    updates = list(analyze_progressive(video, providers=Providers()))
    assert updates == []


def test_progressive_no_audio_still_streams(tmp_path):
    import os

    video = make_synthetic_video(str(tmp_path), name="mute", duration=4.0,
                                 fps=10.0, width=160, height=120)
    wav = os.path.splitext(video)[0] + ".wav"
    if os.path.exists(wav):
        os.remove(wav)
    updates = list(analyze_progressive(video, providers=_providers(),
                                       chunk_seconds=2.0))
    assert len(updates) == 2
    assert all(u.features["lip_sync"] == 0.0 for u in updates)
    assert all(0.0 <= u.fake_probability <= 1.0 for u in updates)


def test_progressive_chunking_invariance(video):
    """Different chunk sizes must accumulate identical landmark tracks —
    the final prefix score does not depend on chunk boundaries (the OneEuro
    carry is chunk-resumable)."""
    a = list(analyze_progressive(video, providers=_providers(), chunk_seconds=1.0))
    b = list(analyze_progressive(video, providers=_providers(), chunk_seconds=3.0))
    assert a[-1].mouth_samples == b[-1].mouth_samples
    assert a[-1].features["lip_sync"] == pytest.approx(
        b[-1].features["lip_sync"], abs=1e-9
    )
    assert a[-1].fake_probability == pytest.approx(b[-1].fake_probability, abs=1e-9)
