"""Content-addressed artifact-encode cache (io_pool / IncrementalVideoWriter).

Re-analysis of identical content must re-run forwards (per-run sharing
rule) but may skip identical cv2 ENCODES: JPEG bytes and viz videos are
cached under keys pinning their exact inputs.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from fvd_tpu.runtime import io_pool


@pytest.fixture(autouse=True)
def _fresh_caches():
    io_pool.clear_artifact_caches()
    yield
    io_pool.clear_artifact_caches()


def _frame(seed: int, hw=(48, 64)) -> np.ndarray:
    return np.random.RandomState(seed).randint(
        0, 255, (*hw, 3)).astype(np.uint8)


def test_jpeg_cache_bytes_identical(tmp_path):
    f = _frame(0)
    p1, p2, p3 = (str(tmp_path / f"{i}.jpg") for i in range(3))
    io_pool._encode_jpeg(p1, f, key=None)            # uncached reference
    io_pool._encode_jpeg(p2, f, key=("ck", "kf", 5))  # miss -> encode + store
    io_pool._encode_jpeg(p3, f, key=("ck", "kf", 5))  # hit -> bytes copy
    b1, b2, b3 = (open(p, "rb").read() for p in (p1, p2, p3))
    assert b1 == b2 == b3
    assert io_pool._jpeg_cache.get(("ck", "kf", 5)) == b2


def test_jpeg_cache_disabled_by_env(tmp_path, monkeypatch):
    monkeypatch.setenv("FVD_TPU_NO_ARTIFACT_CACHE", "1")
    io_pool._encode_jpeg(str(tmp_path / "x.jpg"), _frame(1), key=("k",))
    assert io_pool._jpeg_cache.get(("k",)) is None


def test_encode_cache_lru_eviction():
    c = io_pool._EncodeCache(max_bytes=100)
    c.put("a", b"x" * 60)
    c.put("b", b"y" * 60)  # evicts a
    assert c.get("a") is None and c.get("b") is not None


def test_viz_writer_cached_mode_serves_second_encode(tmp_path):
    from fvd_tpu.providers.media import IncrementalVideoWriter

    frames = np.stack([_frame(i) for i in range(4)])
    draws = {"n": 0}

    def make_writer(path):
        w = IncrementalVideoWriter(str(path), 5.0, cache_scope=("ck", "V3"))

        def draw():
            draws["n"] += 1
            return frames

        w.append(draw, fingerprint=b"landmarks-v1")
        return w

    w1 = make_writer(tmp_path / "a.mp4")
    w1.close()
    assert draws["n"] == 1 and os.path.getsize(tmp_path / "a.mp4") > 0

    w2 = make_writer(tmp_path / "b.mp4")
    w2.close()
    assert draws["n"] == 1, "second identical encode must come from cache"
    assert (open(tmp_path / "a.mp4", "rb").read()
            == open(tmp_path / "b.mp4", "rb").read())

    # different fingerprint -> real encode
    w3 = IncrementalVideoWriter(str(tmp_path / "c.mp4"), 5.0,
                                cache_scope=("ck", "V3"))
    w3.append(lambda: (draws.__setitem__("n", draws["n"] + 1), frames)[1],
              fingerprint=b"landmarks-v2")
    w3.close()
    assert draws["n"] == 2


def test_viz_writer_close_async_cached(tmp_path):
    from fvd_tpu.providers.media import IncrementalVideoWriter

    frames = np.stack([_frame(i) for i in range(3)])
    w = IncrementalVideoWriter(str(tmp_path / "d.mp4"), 4.0,
                               cache_scope=("ck2", "V4"))
    w.append(frames, fingerprint=b"fp")
    fut = w.close_async()
    fut.result(timeout=30)
    assert os.path.getsize(tmp_path / "d.mp4") > 0


def test_viz_writer_degrades_without_fingerprint(tmp_path):
    """A callable appended without a fingerprint cannot be identified —
    the writer must fall back to streaming mode and still produce the file."""
    from fvd_tpu.providers.media import IncrementalVideoWriter

    frames = np.stack([_frame(i) for i in range(3)])
    w = IncrementalVideoWriter(str(tmp_path / "e.mp4"), 4.0,
                               cache_scope=("ck3", "V3"))
    w.append(frames, fingerprint=b"fp0")
    w.append(lambda: frames)  # no fingerprint
    w.close()
    assert os.path.getsize(tmp_path / "e.mp4") > 0
    assert w.appended


def test_viz_writer_array_append_fingerprints_pixels(tmp_path):
    """Raw-array appends without an explicit fingerprint hash the pixels."""
    from fvd_tpu.providers.media import IncrementalVideoWriter

    a = np.stack([_frame(7)])
    w1 = IncrementalVideoWriter(str(tmp_path / "f.mp4"), 4.0,
                                cache_scope=("ck4", "V3"))
    w1.append(a)
    w1.close()
    w2 = IncrementalVideoWriter(str(tmp_path / "g.mp4"), 4.0,
                                cache_scope=("ck4", "V3"))
    w2.append(a)
    w2.close()
    assert (open(tmp_path / "f.mp4", "rb").read()
            == open(tmp_path / "g.mp4", "rb").read())
