"""Background artifact writer: ordering, durability, failure surfacing."""

import os

import numpy as np
import pytest

from fvd_tpu.runtime.io_pool import (
    ArtifactWriter,
    AsyncFrameSink,
    defer_artifact,
    flush_artifacts,
)


def test_artifact_writer_files_exist_after_drain(tmp_path):
    w = ArtifactWriter()
    rgb = np.full((32, 32, 3), 128, np.uint8)
    paths = [str(tmp_path / f"f{i}.jpg") for i in range(8)]
    for p in paths:
        w.save_jpeg(p, rgb)
    w.drain()
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_artifact_writer_surfaces_failure(tmp_path):
    w = ArtifactWriter()

    def boom():
        raise RuntimeError("disk on fire")

    w.submit(boom)
    w.save_jpeg(str(tmp_path / "ok.jpg"), np.zeros((8, 8, 3), np.uint8))
    with pytest.raises(RuntimeError, match="disk on fire"):
        w.drain()
    # drained: a subsequent drain is clean
    w.drain()


def test_async_frame_sink_preserves_order_and_flushes():
    seen = []
    closed = []
    sink = AsyncFrameSink(lambda b: seen.append(b.copy()),
                          lambda: closed.append(True), maxsize=2)
    batches = [np.full((2, 4, 4, 3), i, np.uint8) for i in range(5)]
    for b in batches:
        sink.append(b)
    sink.append(np.zeros((0, 4, 4, 3), np.uint8))  # empty batch is a no-op
    sink.close()
    assert closed == [True]
    assert len(seen) == 5
    for i, b in enumerate(seen):
        assert b[0, 0, 0, 0] == i


def test_async_frame_sink_raises_worker_error_on_close():
    def bad_write(_):
        raise ValueError("encode failed")

    sink = AsyncFrameSink(bad_write, lambda: None)
    sink.append(np.zeros((1, 4, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="encode failed"):
        sink.close()


def test_async_frame_sink_close_async_resolves_after_flush():
    import time

    seen = []
    closed = []

    def slow_write(b):
        time.sleep(0.05)
        seen.append(b.copy())

    sink = AsyncFrameSink(slow_write, lambda: closed.append(True))
    sink.append(np.zeros((2, 4, 4, 3), np.uint8))
    fut = sink.close_async()
    fut.result(timeout=5)
    assert len(seen) == 1 and closed == [True]


def test_close_async_surfaces_worker_error_via_future():
    def bad_write(_):
        raise ValueError("encode failed")

    sink = AsyncFrameSink(bad_write, lambda: None)
    sink.append(np.zeros((1, 4, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="encode failed"):
        sink.close_async().result(timeout=5)


def test_deferred_artifacts_flush_per_run_dir(tmp_path):
    from concurrent.futures import Future

    ok: Future = Future()
    ok.set_result(None)
    bad: Future = Future()
    bad.set_exception(RuntimeError("viz write failed"))
    other: Future = Future()
    other.set_result(None)

    defer_artifact(str(tmp_path / "runA"), ok)
    defer_artifact(str(tmp_path / "runA"), bad)
    defer_artifact(str(tmp_path / "runB"), other)

    errs = flush_artifacts(str(tmp_path / "runA"))
    assert len(errs) == 1 and "viz write failed" in errs[0]
    # runB's entry is still pending until its own flush
    assert flush_artifacts(str(tmp_path / "runB")) == []
    assert flush_artifacts(None) == []  # nothing left


def test_deferred_viz_close_writes_file(tmp_path):
    from fvd_tpu.providers.media import IncrementalVideoWriter, VideoReader

    path = str(tmp_path / "viz.mp4")
    wtr = IncrementalVideoWriter(path, fps=5.0)
    wtr.append(np.full((4, 48, 64, 3), 90, np.uint8))
    assert wtr.appended
    defer_artifact(str(tmp_path), wtr.close_async())
    assert flush_artifacts(str(tmp_path)) == []
    meta = VideoReader().probe(path)
    assert meta is not None and meta.frame_count == 4


def test_incremental_video_writer_async_roundtrip(tmp_path):
    from fvd_tpu.providers.media import IncrementalVideoWriter, VideoReader

    path = str(tmp_path / "viz.mp4")
    wtr = IncrementalVideoWriter(path, fps=5.0)
    for i in range(3):
        wtr.append(np.full((2, 48, 64, 3), 40 * i, np.uint8))
    wtr.close()
    meta = VideoReader().probe(path)
    assert meta is not None
    assert meta.frame_count == 6
