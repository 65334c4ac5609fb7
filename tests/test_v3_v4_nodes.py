"""V3/V4 node tests with scripted landmarks (reference
tests/test_v3_mouth_landmarks.py / test_v4_blink_headpose.py style)."""

import os

import numpy as np
import pytest

from fvd_tpu.nodes import v3_landmarks, v4_dynamics
from fvd_tpu.providers import Providers
from fvd_tpu.runtime.io_pool import flush_artifacts
from fvd_tpu.providers.vision import ScriptedLandmarks
from fvd_tpu.state import State
from fvd_tpu.synthetic import SyntheticLandmarks, make_synthetic_video


@pytest.fixture
def run_dir(tmp_path):
    video = make_synthetic_video(str(tmp_path), name="video", duration=2.0,
                                 fps=10.0, width=160, height=120)
    assert os.path.basename(video) == "video.mp4"
    return str(tmp_path)


def _providers(fps=10.0):
    return Providers(landmarks=SyntheticLandmarks(fps=fps, gate_hz=1.0))


def test_v3_produces_mouth_timeseries(run_dir):
    delta = v3_landmarks.run(State(data_dir=run_dir), providers=_providers())
    flush_artifacts(run_dir)  # viz close is deferred past node return
    data = delta["mouth_landmarks"]
    # 2s at 10fps sampled at 5fps -> stride 2 -> 10 samples
    assert len(data) == 10
    for entry in data:
        assert set(entry) == {"frame_id", "timestamp", "landmarks"}
        assert len(entry["landmarks"]) == 20  # mouth points 48:68
    # timestamps follow frame_id / fps
    assert data[1]["timestamp"] == pytest.approx(data[1]["frame_id"] / 10.0)
    # viz artifact written
    assert os.path.exists(delta["mouth_landmarks_viz_path"])
    assert delta["metadata"]["landmark_model"].endswith("_smoothed")


def test_v3_no_provider_noop(run_dir):
    assert v3_landmarks.run(State(data_dir=run_dir), providers=Providers()) == {}


def test_v3_missing_video_noop(tmp_path):
    assert v3_landmarks.run(State(data_dir=str(tmp_path)), providers=_providers()) == {}


def test_v3_no_faces_empty_landmarks(run_dir):
    providers = Providers(landmarks=ScriptedLandmarks(frames_landmarks=None))
    delta = v3_landmarks.run(State(data_dir=run_dir), providers=providers)
    assert all(e["landmarks"] == [] for e in delta["mouth_landmarks"])


def test_v4_blink_and_pose_tracks(run_dir):
    delta = v4_dynamics.run(State(data_dir=run_dir), providers=_providers())
    flush_artifacts(run_dir)
    blink = delta["blink_data"]
    pose = delta["head_pose_data"]
    assert len(blink) == 10
    for b in blink:
        assert set(b) == {"frame_id", "timestamp", "ear"}
        assert 0.0 < b["ear"] < 1.0
    assert len(pose) == 10
    for p in pose:
        assert set(p["pose"]) == {"pitch", "yaw", "roll"}
    # pose smoothing (OneEuro 0.1/0.1) keeps values near the scripted ramp
    yaws = [p["pose"]["yaw"] for p in pose]
    assert max(yaws) <= 20.5
    assert os.path.exists(delta["headpose_viz_path"])
    assert delta["metadata"]["blink_model"] == "EAR_smoothed"


def test_v4_no_provider_noop(run_dir):
    assert v4_dynamics.run(State(data_dir=run_dir), providers=Providers()) == {}


def test_v3_smoothing_actually_applied(run_dir):
    """Noisy scripted landmarks must come out smoother than they went in."""
    from fvd_tpu.synthetic import SyntheticLandmarks

    rng = np.random.RandomState(0)
    synth = SyntheticLandmarks(fps=10.0)

    def noisy(i, frame):
        lm = synth.landmarks_batch(frame[None])[0]
        if not lm:
            return []
        return [lm[0] + rng.randn(68, 2) * 4.0]

    providers = Providers(landmarks=ScriptedLandmarks(frames_landmarks=noisy))
    delta = v3_landmarks.run(State(data_dir=run_dir), providers=providers)
    mouths = np.array([e["landmarks"] for e in delta["mouth_landmarks"] if e["landmarks"]])
    # frame-to-frame jitter of the smoothed track is well below the injected
    # noise scale (4px std -> diffs ~5.6px unsmoothed)
    diffs = np.abs(np.diff(mouths[2:, :, 0], axis=0)).mean()
    assert diffs < 4.0
