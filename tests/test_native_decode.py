"""Native libav decode shim tests (skipped if the shim can't build)."""

import numpy as np
import pytest

from fvd_tpu.providers import native_decode
from fvd_tpu.providers.media import VideoReader, extract_audio, write_video

pytestmark = pytest.mark.skipif(
    not native_decode.available(), reason="native decode shim not available"
)


@pytest.fixture(scope="module")
def sample_video(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("native")
    path = str(tmp / "v.mp4")
    n, h, w = 30, 48, 64
    frames = np.zeros((n, h, w, 3), np.uint8)
    for i in range(n):
        frames[i, :, :, 0] = i * 8  # red ramp encodes the frame index
    write_video(path, frames, 10.0)
    return path, frames


def test_native_probe(sample_video):
    path, frames = sample_video
    with native_decode.NativeVideo(path) as v:
        fps, count, w, h, dur, has_audio = v.probe()
    assert fps == pytest.approx(10.0)
    assert count == 30
    assert (w, h) == (64, 48)
    assert dur == pytest.approx(3.0, abs=0.2)
    assert not has_audio


def test_native_read_frames_values(sample_video):
    path, frames = sample_video
    with native_decode.NativeVideo(path) as v:
        out, kept = v.read_frames([0, 7, 15, 29])
    assert kept == [0, 7, 15, 29]
    assert out.shape == (4, 48, 64, 3)
    for got, fid in zip(out, kept):
        # mp4 lossy encode: red ramp recovered within codec tolerance
        assert abs(int(got[:, :, 0].mean()) - fid * 8) < 12


def test_native_read_frames_out_of_range(sample_video):
    path, _ = sample_video
    with native_decode.NativeVideo(path) as v:
        out, kept = v.read_frames([5, 500])
    assert kept == [5]
    assert out.shape[0] == 1


def test_video_reader_prefers_native(sample_video):
    path, _ = sample_video
    reader = VideoReader()
    assert reader._native is not None
    meta = reader.probe(path)
    assert meta.frame_count == 30
    frames, kept = reader.sample(path, range(0, 30, 10))
    assert kept == [0, 10, 20]
    # native and cv2 paths agree
    frames_cv, kept_cv = reader._sample_cv2(path, range(0, 30, 10))
    assert kept_cv == kept
    assert np.abs(frames.astype(int) - frames_cv.astype(int)).mean() < 8


def test_native_matches_cv2_probe(sample_video):
    path, _ = sample_video
    r = VideoReader()
    m_native = r.probe(path)
    m_cv = r._probe_cv2(path)
    assert m_native.frame_count == m_cv.frame_count
    assert m_native.fps == pytest.approx(m_cv.fps)
    assert (m_native.width, m_native.height) == (m_cv.width, m_cv.height)
