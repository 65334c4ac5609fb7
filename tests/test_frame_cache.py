"""Shared frame cache: single decode across nodes, concurrency, eviction."""

import threading

import numpy as np
import pytest

from fvd_tpu.providers import media


@pytest.fixture(autouse=True)
def fresh_cache():
    media.clear_frame_cache()
    yield
    media.clear_frame_cache()


@pytest.fixture
def video(tmp_path):
    path = str(tmp_path / "v.mp4")
    frames = np.zeros((30, 48, 64, 3), np.uint8)
    for i in range(30):
        frames[i, :, :, 0] = i * 8
    media.write_video(path, frames, 10.0)
    return path


def test_cache_serves_second_reader(video, monkeypatch):
    reader = media.VideoReader()
    decode_calls = []
    orig = reader._sample_uncached

    def counting(path, ids):
        decode_calls.append(list(ids))
        return orig(path, ids)

    monkeypatch.setattr(reader, "_sample_uncached", counting)

    f1, k1 = reader.sample(video, [0, 6, 12])
    f2, k2 = reader.sample(video, [0, 6, 12])
    assert k1 == k2 == [0, 6, 12]
    assert len(decode_calls) == 1  # second call fully cached
    np.testing.assert_array_equal(f1, f2)


def test_identical_grid_resample_skips_stack(video):
    """A warm re-sample of an identical grid returns the memoized stacked
    batch (the ~100 MB np.stack per node per pass was the dominant
    warm-pass host cost on the 1-core host)."""
    reader = media.VideoReader()
    f1, k1 = reader.sample(video, [0, 6, 12])
    f2, k2 = reader.sample(video, [0, 6, 12])
    assert k1 == k2
    assert f2 is f1  # same memoized block, no re-stack
    # a different grid still assembles (and memoizes) its own stack
    f3, k3 = reader.sample(video, [0, 12])
    assert k3 == [0, 12]
    assert f3 is not f1
    np.testing.assert_array_equal(f3[0], f1[0])
    # eviction of the video drops its stack memo with it
    media._frame_cache.clear()
    assert media._frame_cache._stacks == {}


def test_cache_decodes_only_missing(video, monkeypatch):
    reader = media.VideoReader()
    decode_calls = []
    orig = reader._sample_uncached

    def counting(path, ids):
        decode_calls.append(sorted(ids))
        return orig(path, ids)

    monkeypatch.setattr(reader, "_sample_uncached", counting)

    reader.sample(video, [0, 10, 20])        # V1-style coarse grid
    reader.sample(video, [0, 5, 10, 15, 20])  # V3-style finer grid
    assert decode_calls == [[0, 10, 20], [5, 15]]


def test_cache_concurrent_readers_single_decode(video, monkeypatch):
    reader = media.VideoReader()
    decode_calls = []
    orig = reader._sample_uncached

    def counting(path, ids):
        decode_calls.append(sorted(ids))
        return orig(path, ids)

    monkeypatch.setattr(reader, "_sample_uncached", counting)
    ids = list(range(0, 30, 3))
    results = []

    def worker():
        results.append(reader.sample(video, ids))

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(decode_calls) == 1  # the path lock serialized; others hit cache
    for frames, kept in results:
        assert kept == ids


def test_cache_eviction_bounds_memory(tmp_path):
    media._frame_cache.max_frames = 40
    try:
        reader = media.VideoReader()
        paths = []
        for v in range(3):
            p = str(tmp_path / f"v{v}.mp4")
            media.write_video(p, np.full((20, 32, 32, 3), v * 50, np.uint8), 10.0)
            paths.append(p)
            reader.sample(p, range(20))
        total = sum(len(s) for s in media._frame_cache._frames.values())
        assert total <= 40
        # the most recent video is still resident (content-keyed store)
        assert media.content_key(paths[-1]) in media._frame_cache._frames
    finally:
        media._frame_cache.max_frames = 4096


def test_content_identity_shared_across_paths(video, tmp_path, monkeypatch):
    """A byte-identical copy at a different path (each run copies its input
    into a fresh run dir) hits the same cache entry: no second decode."""
    import shutil

    copy = str(tmp_path / "elsewhere" / "video.mp4")
    import os

    os.makedirs(os.path.dirname(copy))
    shutil.copy(video, copy)

    reader = media.VideoReader()
    decode_calls = []
    orig = reader._sample_uncached

    def counting(path, ids):
        decode_calls.append(list(ids))
        return orig(path, ids)

    monkeypatch.setattr(reader, "_sample_uncached", counting)
    f1, k1 = reader.sample(video, [0, 6, 12])
    f2, k2 = reader.sample(copy, [0, 6, 12])
    assert k1 == k2 == [0, 6, 12]
    assert len(decode_calls) == 1  # the copy was served from content identity
    np.testing.assert_array_equal(f1, f2)
    # metadata rides the same identity
    assert reader.probe(copy) is reader.probe(video)


def test_content_key_tracks_rewrites(tmp_path):
    """Same path, new bytes -> new identity (no stale frames)."""
    p = str(tmp_path / "v.mp4")
    media.write_video(p, np.zeros((5, 32, 32, 3), np.uint8), 10.0)
    k1 = media.content_key(p)
    import os
    import time

    time.sleep(0.01)
    media.write_video(p, np.full((5, 32, 32, 3), 200, np.uint8), 10.0)
    os.utime(p)  # ensure mtime_ns moves even on coarse filesystems
    assert media.content_key(p) != k1


def test_cache_probe_memoized(video, monkeypatch):
    reader = media.VideoReader()
    calls = []
    orig = reader._probe_uncached

    def counting(path):
        calls.append(path)
        return orig(path)

    monkeypatch.setattr(reader, "_probe_uncached", counting)
    m1 = reader.probe(video)
    m2 = reader.probe(video)
    assert len(calls) == 1
    assert m1 is m2


def test_sample_survives_concurrent_eviction(video, monkeypatch):
    """Decoded frames must be served even if another path's insert evicts
    this path between insert and return."""
    reader = media.VideoReader()
    orig_insert = media._frame_cache.insert

    def evicting_insert(path, frames, ids):
        orig_insert(path, frames, ids)
        # simulate a concurrent eviction of everything
        media._frame_cache._frames.pop(media.content_key(path), None)

    monkeypatch.setattr(media._frame_cache, "insert", evicting_insert)
    frames, kept = reader.sample(video, [0, 5, 10])
    assert kept == [0, 5, 10]
    assert frames.shape[0] == 3


# ---------------------------------------------------------------------------
# fused landmark+pose sharing
# ---------------------------------------------------------------------------
class _FusedProvider:
    """Counts forwards; supports the fused landmark+pose program."""

    model_name = "fused_fake"
    accepts_device_frames = True

    def __init__(self):
        self.lm_calls = 0
        self.fused_calls = 0

    def landmarks_batch(self, frames, device_frames=None):
        self.lm_calls += 1
        return [[np.zeros((68, 2))] for _ in frames]

    def landmarks_pose_batch(self, frames, device_frames=None, pose_pad=0.0):
        self.fused_calls += 1
        return ([[np.zeros((68, 2))] for _ in frames],
                [[np.array([1.0, 2.0, pose_pad])] for _ in frames])


def test_shared_landmarks_fused_entry_served_to_pose_consumer():
    """V3's landmarks-only call (with pose_pad) computes the fused entry
    ONCE; V4's pose-aware call reuses it — no second forward, no separate
    pose dispatch."""
    prov = _FusedProvider()
    frames = np.zeros((3, 8, 8, 3), np.uint8)
    dev = object()  # share only gates on "not None"
    lm = media.shared_landmarks("vidA", [0, 1, 2], prov, frames, dev,
                                pose_pad=0.1)
    assert len(lm) == 3
    lm2, poses = media.shared_landmarks_pose("vidA", [0, 1, 2], prov, frames,
                                             dev, pose_pad=0.1)
    assert poses is not None and poses[0][0][2] == 0.1
    assert prov.fused_calls == 1 and prov.lm_calls == 0

    # a pad mismatch must not serve stale poses
    _, poses_mismatch = media.shared_landmarks_pose(
        "vidA", [0, 1, 2], prov, frames, dev, pose_pad=0.25)
    assert poses_mismatch is None


def test_shared_landmarks_fused_disabled_by_env(monkeypatch):
    monkeypatch.setenv("FVD_TPU_NO_FUSED_POSE", "1")
    prov = _FusedProvider()
    frames = np.zeros((2, 8, 8, 3), np.uint8)
    lm2, poses = media.shared_landmarks_pose("vidB", [0, 1], prov, frames,
                                             object(), pose_pad=0.1)
    assert poses is None
    assert prov.fused_calls == 0 and prov.lm_calls == 1
