"""Chunked long-video processing: streaming sampler, resumable smoothing,
and chunked V3/V4 equivalence with the unchunked path."""

import dataclasses
import os

import numpy as np
import pytest

from fvd_tpu.config import LandmarkConfig, default_config
from fvd_tpu.nodes import v3_landmarks, v4_dynamics
from fvd_tpu.ops.filters import (
    one_euro_init_carry,
    one_euro_scan,
    one_euro_scan_chunk,
)
from fvd_tpu.providers import Providers
from fvd_tpu.providers.media import StreamingSampler, write_video
from fvd_tpu.synthetic import SyntheticLandmarks, make_synthetic_video


def test_one_euro_chunked_matches_whole_track():
    rng = np.random.RandomState(0)
    T = 60
    times = np.cumsum(0.2 + 0.05 * rng.rand(T))
    values = np.cumsum(rng.randn(T, 68, 2), axis=0)
    valid = rng.rand(T) > 0.2

    whole = np.asarray(one_euro_scan(times, values, valid, min_cutoff=0.5, beta=0.1))

    carry = one_euro_init_carry((68, 2))
    outs = []
    for s in range(0, T, 17):  # uneven chunk boundary
        out, carry = one_euro_scan_chunk(
            carry, times[s : s + 17], values[s : s + 17], valid[s : s + 17],
            min_cutoff=0.5, beta=0.1,
        )
        outs.append(np.asarray(out))
    chunked = np.concatenate(outs)
    np.testing.assert_allclose(
        np.nan_to_num(chunked), np.nan_to_num(whole), rtol=1e-5, atol=1e-5
    )


def test_streaming_sampler_chunks(tmp_path):
    path = str(tmp_path / "v.mp4")
    frames = np.zeros((40, 48, 64, 3), np.uint8)
    for i in range(40):
        frames[i, :, :, 0] = i * 6
    write_video(path, frames, 10.0)

    ids = list(range(0, 40, 2))  # 20 sampled
    chunks = list(StreamingSampler(path, ids, chunk_size=7))
    got_ids = [i for _, kept in chunks for i in kept]
    assert got_ids == ids
    assert [len(k) for _, k in chunks] == [7, 7, 6]
    # frame content is correct per id (red ramp)
    for fr, kept in chunks:
        for f, fid in zip(fr, kept):
            assert abs(int(f[:, :, 0].mean()) - fid * 6) < 12


def test_streaming_sampler_cv2_fallback_matches(tmp_path):
    path = str(tmp_path / "v.mp4")
    write_video(path, np.random.RandomState(0).randint(0, 255, (30, 32, 32, 3)).astype(np.uint8), 10.0)
    ids = list(range(0, 30, 3))
    native = list(StreamingSampler(path, ids, chunk_size=4, prefer_native=True))
    cv2_path = list(StreamingSampler(path, ids, chunk_size=4, prefer_native=False))
    ids_a = [i for _, k in native for i in k]
    ids_b = [i for _, k in cv2_path for i in k]
    assert ids_a == ids_b == ids


def _chunked_cfg(chunk):
    base = default_config()
    return dataclasses.replace(
        base, landmarks=dataclasses.replace(base.landmarks, stream_chunk_frames=chunk)
    )


@pytest.mark.parametrize("node_mod,keys", [
    (v3_landmarks, ("mouth_landmarks",)),
    (v4_dynamics, ("blink_data", "head_pose_data")),
])
def test_chunked_node_matches_unchunked(tmp_path, node_mod, keys):
    """Processing in small chunks must produce identical tracks to one big
    batch (carried tracker + filter state)."""
    from fvd_tpu.state import State

    video = make_synthetic_video(str(tmp_path), name="video", duration=4.0,
                                 fps=10.0, width=160, height=120)
    assert os.path.basename(video) == "video.mp4"

    def run_with(chunk):
        providers = Providers(landmarks=SyntheticLandmarks(fps=10.0, gate_hz=1.0))
        return node_mod.run(State(data_dir=str(tmp_path)),
                            config=_chunked_cfg(chunk), providers=providers)

    big = run_with(1000)     # single chunk (20 sampled frames)
    small = run_with(6)      # 4 chunks with uneven tail

    for key in keys:
        a, b = big[key], small[key]
        assert len(a) == len(b)
        for ea, eb in zip(a, b):
            assert ea.keys() == eb.keys()
            for field in ea:
                va, vb = ea[field], eb[field]
                if isinstance(va, (int, float)):
                    assert va == pytest.approx(vb, abs=1e-4), (key, field)
                elif isinstance(va, dict):
                    for k2 in va:
                        assert va[k2] == pytest.approx(vb[k2], abs=1e-4)
                else:
                    np.testing.assert_allclose(np.asarray(va, float),
                                               np.asarray(vb, float), atol=1e-4)
