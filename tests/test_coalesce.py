"""Cross-video forward coalescing: grouping, padding, splits, errors."""

import threading

import numpy as np
import pytest

from fvd_tpu.providers import Providers
from fvd_tpu.providers.coalesce import (
    CoalescingClip,
    CoalescingDetector,
    CoalescingLandmarks,
    CoalescingOCR,
    coalesce_providers,
)


class FakeLandmarks:
    """Host-path landmark provider: landmark value encodes the source pixel,
    so callers can verify they got THEIR frames' results back."""

    model_name = "fake_lm"
    accepts_device_frames = False

    def __init__(self):
        self.calls = []
        self.lock = threading.Lock()

    def landmarks_batch(self, frames, device_frames=None):
        with self.lock:
            self.calls.append(len(frames))
        return [[np.full((68, 2), float(f[0, 0, 0]))] for f in frames]

    def pose_batch(self, crops):
        return np.zeros((len(crops), 3))


class FakeDeviceLandmarks(FakeLandmarks):
    """Device-path provider: reads pixels from the device tensor (the host
    array is a zero-copy shape proxy, as with the real FANLandmarks)."""

    accepts_device_frames = True

    def landmarks_batch(self, frames, device_frames=None):
        with self.lock:
            self.calls.append(len(frames))
        assert device_frames is not None
        dev = np.asarray(device_frames)
        return [[np.full((68, 2), float(d[0, 0, 0]))] for d in dev]

    def pose_boxes_batch(self, device_frames, boxes, owners):
        dev = np.asarray(device_frames)
        return np.stack([
            np.array([float(dev[o][0, 0, 0]), 0.0, 0.0]) for o in owners
        ])

    def landmarks_pose_batch(self, frames, device_frames=None, pose_pad=0.0):
        with self.lock:
            self.calls.append(len(frames))
        assert device_frames is not None
        dev = np.asarray(device_frames)
        lm = [[np.full((68, 2), float(d[0, 0, 0]))] for d in dev]
        poses = [[np.array([float(d[0, 0, 0]), pose_pad, 0.0])] for d in dev]
        return lm, poses


class FakeDetector:
    model_name = "fake_det"
    accepts_device_frames = False

    def __init__(self):
        self.calls = []

    def detect_batch(self, frames):
        self.calls.append(len(frames))
        return [[("box", float(f[0, 0, 0]))] for f in frames]


def _submit_concurrently(fns):
    results = [None] * len(fns)
    errs = []

    def run(i):
        try:
            results[i] = fns[i]()
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(len(fns))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return results, errs


def test_landmarks_coalesce_host_path():
    inner = FakeLandmarks()
    co = CoalescingLandmarks(inner, bucket_frames=64, max_wait_ms=80.0)
    try:
        a = np.full((10, 8, 8, 3), 7, np.uint8)
        b = np.full((12, 8, 8, 3), 9, np.uint8)
        (ra, rb), errs = _submit_concurrently([
            lambda: co.landmarks_batch(a),
            lambda: co.landmarks_batch(b),
        ])
        assert not errs
        # one merged inner call, padded to the next power-of-two rung
        # (22 frames -> 32), not the full 64 bucket
        assert inner.calls == [32]
        assert len(ra) == 10 and len(rb) == 12
        assert all(lm[0][0, 0] == 7.0 for lm in ra)
        assert all(lm[0][0, 0] == 9.0 for lm in rb)
    finally:
        co.close()


def test_landmarks_coalesce_device_path_and_pose_offsets():
    inner = FakeDeviceLandmarks()
    co = CoalescingLandmarks(inner, bucket_frames=32, max_wait_ms=80.0)
    try:
        import jax.numpy as jnp

        host_a = np.full((4, 8, 8, 3), 5, np.uint8)
        host_b = np.full((6, 8, 8, 3), 11, np.uint8)
        dev_a = jnp.asarray(host_a)
        dev_b = jnp.asarray(host_b)
        (ra, rb), errs = _submit_concurrently([
            lambda: co.landmarks_batch(host_a, device_frames=dev_a),
            lambda: co.landmarks_batch(host_b, device_frames=dev_b),
        ])
        assert not errs
        assert inner.calls == [32]
        assert all(lm[0][0, 0] == 5.0 for lm in ra)
        assert all(lm[0][0, 0] == 11.0 for lm in rb)

        # pose: owner ids offset per group member; each caller sees poses
        # computed from ITS frames
        (pa, pb), errs = _submit_concurrently([
            lambda: co.pose_boxes_batch(dev_a, [(0, 0, 4, 4)] * 2, [0, 1]),
            lambda: co.pose_boxes_batch(dev_b, [(0, 0, 4, 4)] * 3, [0, 2, 4]),
        ])
        assert not errs
        assert pa.shape == (2, 3) and pb.shape == (3, 3)
        assert all(p[0] == 5.0 for p in pa)
        assert all(p[0] == 11.0 for p in pb)
    finally:
        co.close()


def test_landmarks_pose_fused_stage_coalesces():
    """Two videos' fused landmark+pose requests merge into ONE inner
    dispatch; each caller gets its own slices of both outputs."""
    inner = FakeDeviceLandmarks()
    co = CoalescingLandmarks(inner, bucket_frames=32, max_wait_ms=80.0)
    try:
        import jax.numpy as jnp

        host_a = np.full((4, 8, 8, 3), 5, np.uint8)
        host_b = np.full((6, 8, 8, 3), 11, np.uint8)
        dev_a = jnp.asarray(host_a)
        dev_b = jnp.asarray(host_b)
        (res_a, res_b), errs = _submit_concurrently([
            lambda: co.landmarks_pose_batch(host_a, device_frames=dev_a,
                                            pose_pad=0.1),
            lambda: co.landmarks_pose_batch(host_b, device_frames=dev_b,
                                            pose_pad=0.1),
        ])
        assert not errs
        assert inner.calls == [32]  # 10 frames -> ONE group (ladder floor 32)
        lm_a, pose_a = res_a
        lm_b, pose_b = res_b
        assert len(lm_a) == 4 and len(pose_a) == 4
        assert len(lm_b) == 6 and len(pose_b) == 6
        assert all(lm[0][0, 0] == 5.0 for lm in lm_a)
        assert all(p[0][0] == 5.0 and p[0][1] == 0.1 for p in pose_a)
        assert all(lm[0][0, 0] == 11.0 for lm in lm_b)
        assert all(p[0][0] == 11.0 and p[0][1] == 0.1 for p in pose_b)
    finally:
        co.close()


def test_landmarks_pose_fused_stage_host_fallback():
    """Without device frames the fused stage degrades to landmarks-only
    (pose None) so callers can run the two-stage path."""
    inner = FakeLandmarks()
    co = CoalescingLandmarks(inner, bucket_frames=32, max_wait_ms=20.0)
    try:
        frames = np.full((3, 8, 8, 3), 7, np.uint8)
        lm, poses = co.landmarks_pose_batch(frames, device_frames=None,
                                            pose_pad=0.1)
        assert poses is None
        assert len(lm) == 3
    finally:
        co.close()


def test_detector_coalesce_and_split():
    inner = FakeDetector()
    co = CoalescingDetector(inner, bucket_frames=16, max_wait_ms=80.0)
    try:
        a = np.full((3, 8, 8, 3), 1, np.uint8)
        b = np.full((5, 8, 8, 3), 2, np.uint8)
        (ra, rb), errs = _submit_concurrently([
            lambda: co.detect_batch(a),
            lambda: co.detect_batch(b),
        ])
        assert not errs
        assert inner.calls == [16]
        assert [d[0][1] for d in ra] == [1.0] * 3
        assert [d[0][1] for d in rb] == [2.0] * 5
    finally:
        co.close()


def test_oversized_request_runs_alone():
    inner = FakeLandmarks()
    co = CoalescingLandmarks(inner, bucket_frames=8, max_wait_ms=10.0)
    try:
        big = np.full((20, 8, 8, 3), 3, np.uint8)
        res = co.landmarks_batch(big)
        assert len(res) == 20
        assert inner.calls == [20]  # no padding past an oversized request
    finally:
        co.close()


def test_group_error_propagates_to_all_callers():
    class Exploding(FakeLandmarks):
        def landmarks_batch(self, frames, device_frames=None):
            raise RuntimeError("forward failed")

    co = CoalescingLandmarks(Exploding(), bucket_frames=16, max_wait_ms=50.0)
    try:
        a = np.zeros((2, 8, 8, 3), np.uint8)
        results, errs = _submit_concurrently([
            lambda: co.landmarks_batch(a),
            lambda: co.landmarks_batch(a),
        ])
        assert len(errs) == 2
        assert all("forward failed" in str(e) for e in errs)
    finally:
        co.close()


def test_incompatible_shapes_group_separately():
    inner = FakeLandmarks()
    co = CoalescingLandmarks(inner, bucket_frames=64, max_wait_ms=80.0)
    try:
        a = np.full((4, 8, 8, 3), 1, np.uint8)
        b = np.full((4, 16, 16, 3), 2, np.uint8)
        (ra, rb), errs = _submit_concurrently([
            lambda: co.landmarks_batch(a),
            lambda: co.landmarks_batch(b),
        ])
        assert not errs
        # two groups (different H, W), each padded to the ladder floor
        assert sorted(inner.calls) == [32, 32]
        assert all(lm[0][0, 0] == 1.0 for lm in ra)
        assert all(lm[0][0, 0] == 2.0 for lm in rb)
    finally:
        co.close()


def test_coalesce_providers_wraps_only_device_models():
    host = Providers(landmarks=FakeLandmarks(), face_detector=FakeDetector())
    same, close = coalesce_providers(host)
    assert same is host
    close()

    dev = Providers(landmarks=FakeDeviceLandmarks())
    wrapped, close = coalesce_providers(dev)
    try:
        assert isinstance(wrapped.landmarks, CoalescingLandmarks)
        # idempotent: re-wrapping returns the same bundle
        again, close2 = coalesce_providers(wrapped)
        assert again is wrapped
        close2()
    finally:
        close()


def test_coalesce_window_adapts_to_slow_groups():
    """Behind a degraded tunnel (group round trips of 100s of ms) the
    batching window widens toward 0.15x the RTT EMA (capped 50 ms), merging
    more staggered arrivals per dispatch; healthy windows keep the base."""
    import time as _time

    class SlowLandmarks(FakeLandmarks):
        def landmarks_batch(self, frames):
            _time.sleep(0.12)  # a degraded-window group round trip
            return super().landmarks_batch(frames)

    co = CoalescingLandmarks(SlowLandmarks(), bucket_frames=8, max_wait_ms=6.0)
    try:
        assert co._co.max_wait_s == pytest.approx(0.006)
        frames = np.zeros((1, 8, 8, 3), np.uint8)
        for _ in range(4):
            co.landmarks_batch(frames)
        assert co._co.max_wait_s > 0.010  # widened toward 0.15 * ~0.12 s
        assert co._co.max_wait_s <= 0.050
    finally:
        co.close()


def test_coalesce_window_env_override(monkeypatch):
    """FVD_TPU_COALESCE_WAIT_MS widens the batching window (tunnel-RTT
    tuning lever: fewer, larger device dispatches)."""
    monkeypatch.setenv("FVD_TPU_COALESCE_WAIT_MS", "25")
    wrapped, close = coalesce_providers(Providers(landmarks=FakeDeviceLandmarks()))
    try:
        assert abs(wrapped.landmarks._co.max_wait_s - 0.025) < 1e-9
    finally:
        close()


class FakeOCR:
    model_name = "fake_ocr"
    coalescable = True

    def __init__(self):
        self.calls = []

    def read_text_batch(self, images):
        self.calls.append(len(images))
        return [[{"text": str(int(im[0, 0, 0])), "confidence": 1.0}]
                if im[0, 0, 0] else [] for im in images]


class FakeClip:
    model_name = "fake_clip"
    coalescable = True

    def __init__(self):
        self.calls = []

    def image_text_similarity_batch(self, images, texts):
        self.calls.append(len(images))
        return np.array([float(im[0, 0, 0]) / 100.0 for im in images])


def test_ocr_coalesce_pads_and_splits():
    inner = FakeOCR()
    co = CoalescingOCR(inner, bucket_images=32, max_wait_ms=80.0)
    try:
        a = [np.full((8, 8, 3), 3, np.uint8)] * 4
        b = [np.full((8, 8, 3), 7, np.uint8)] * 6
        (ra, rb), errs = _submit_concurrently([
            lambda: co.read_text_batch(a),
            lambda: co.read_text_batch(b),
        ])
        assert not errs
        assert inner.calls == [32]  # one padded group
        assert [d[0]["text"] for d in ra] == ["3"] * 4
        assert [d[0]["text"] for d in rb] == ["7"] * 6
        # single-image convenience path
        assert co.read_text(np.full((8, 8, 3), 9, np.uint8))[0]["text"] == "9"
    finally:
        co.close()


def test_clip_coalesce_pairs():
    inner = FakeClip()
    co = CoalescingClip(inner, bucket_pairs=16, max_wait_ms=80.0)
    try:
        a_imgs = [np.full((4, 4, 3), 50, np.uint8)] * 3
        b_imgs = [np.full((4, 4, 3), 80, np.uint8)] * 2
        (ra, rb), errs = _submit_concurrently([
            lambda: co.image_text_similarity_batch(a_imgs, ["x"] * 3),
            lambda: co.image_text_similarity_batch(b_imgs, ["y"] * 2),
        ])
        assert not errs
        assert inner.calls == [16]
        np.testing.assert_allclose(ra, [0.5] * 3)
        np.testing.assert_allclose(rb, [0.8] * 2)
        assert co.image_text_similarity(a_imgs[0], "z") == 0.5
    finally:
        co.close()


def test_coalesce_providers_wraps_marked_ocr_clip():
    bundle = Providers(ocr=FakeOCR(), clip=FakeClip())
    wrapped, close = coalesce_providers(bundle)
    try:
        assert isinstance(wrapped.ocr, CoalescingOCR)
        assert isinstance(wrapped.clip, CoalescingClip)
    finally:
        close()


def test_pose_boxes_attr_none_when_inner_lacks_it():
    co = CoalescingLandmarks(FakeLandmarks(), bucket_frames=8)
    try:
        # V4 feature-detects this: None must disable the fused path
        assert getattr(co, "pose_boxes_batch", None) is None
    finally:
        co.close()


def test_run_program_inactive_runs_directly():
    from fvd_tpu.providers import coalesce

    calls = []

    def run_batch(payloads):
        calls.append(len(payloads))
        return [p * 2 for p in payloads]

    assert not coalesce.program_coalescing_active()
    assert coalesce.run_program("x", (1,), 21, run_batch) == 42
    assert calls == [1]


def test_run_program_coalesces_concurrent_calls():
    """Concurrent same-key programs run as one batched group; different
    keys stay separate; results map back to their callers."""
    from concurrent.futures import ThreadPoolExecutor

    from fvd_tpu.providers import coalesce

    deactivate = coalesce._activate_program_coalescer(max_wait_ms=30.0)
    try:
        batch_sizes = []

        def run_batch(payloads):
            batch_sizes.append(len(payloads))
            return [p + 100 for p in payloads]

        with ThreadPoolExecutor(max_workers=8) as pool:
            futs = [pool.submit(coalesce.run_program, "k",
                                (7,), i, run_batch) for i in range(8)]
            results = [f.result() for f in futs]
        assert results == [100 + i for i in range(8)]
        assert sum(batch_sizes) == 8
        assert max(batch_sizes) > 1  # at least one group actually merged
    finally:
        deactivate()
    assert not coalesce.program_coalescing_active()


def test_pipeline_results_identical_with_program_coalescing(tmp_cwd):
    """The audio-chain + lip-sync features of an overlapped run must equal
    the sequential run's (the coalesced programs are vmaps of the same
    kernels)."""
    import dataclasses

    from fvd_tpu.batch import run_pipeline, run_pipeline_many
    from fvd_tpu.config import default_config
    from fvd_tpu.graph import build_graph  # noqa: F401  (config only)
    from fvd_tpu.synthetic import hermetic_providers, make_synthetic_video

    videos = [make_synthetic_video("m", name=f"v{i}", duration=3.0, fps=10.0,
                                   width=96, height=72) for i in range(2)]
    providers = hermetic_providers(fps=10.0)
    config = default_config()
    seq = [run_pipeline(v, None, config, providers) for v in videos]
    par = run_pipeline_many(videos, config, providers, concurrency=2)
    # vmapped programs may round differently than their single-signal
    # compilations (batched matmul/reduce orders); equality holds to
    # float32 working precision, not bit-exactly
    assert seq == pytest.approx(par, abs=2e-3)


def test_pad_target_ladder():
    from fvd_tpu.providers.coalesce import _pad_target

    # power-of-two rungs clamped to [floor, bucket]
    assert _pad_target(1, 256) == 32        # floor
    assert _pad_target(30, 256) == 32
    assert _pad_target(33, 256) == 64
    assert _pad_target(150, 256) == 256
    assert _pad_target(256, 256) == 256
    assert _pad_target(300, 256) == 300     # oversized: exact shape
    assert _pad_target(5, 16) == 16         # floor clamps to small buckets
    assert _pad_target(22, 64) == 32
