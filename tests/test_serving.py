"""Serving layer: dynamic micro-batching + fused batched scoring."""

import json
import os
import threading
import time

import numpy as np
import pytest

from fvd_tpu.ops import fusion
from fvd_tpu.ops.lipsync import lip_sync_score_xla
from fvd_tpu.serving import MicroBatcher, ScoreRequest, ScoringService

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "lr_parity.json")
with open(FIXTURE) as f:
    WEIGHTS = json.load(f)["weights"]


def test_microbatcher_batches_concurrent_requests():
    calls = []

    def batch_fn(items):
        calls.append(len(items))
        return [x * 2 for x in items]

    mb = MicroBatcher(batch_fn, max_batch=8, max_wait_ms=50.0)
    try:
        futures = [mb.submit(i) for i in range(6)]
        results = [f.result(timeout=5) for f in futures]
        assert results == [0, 2, 4, 6, 8, 10]
        assert mb.items_served == 6
        # concurrent submits coalesced into far fewer batches than items
        assert mb.batches_run <= 3
        # padding: batch sizes are power-of-two buckets
        assert all(c in (1, 2, 4, 8) for c in calls)
    finally:
        mb.close()


def test_microbatcher_propagates_errors():
    def batch_fn(items):
        raise ValueError("device on fire")

    mb = MicroBatcher(batch_fn, max_batch=4, max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError):
            mb.score("x", timeout=5)
    finally:
        mb.close()


def _request(seed, n, fps, sync=True):
    rng = np.random.RandomState(seed)
    t = np.linspace(0, n / fps, n)
    env = np.clip(0.5 * (1 + np.sin(2 * np.pi * 2 * t)) + 0.1 * rng.rand(n), 0, 1)
    mouth = env if sync else rng.rand(n)
    return ScoreRequest(
        mouth=mouth.astype(np.float32),
        audio=env.astype(np.float32),
        other_feats=rng.rand(8).astype(np.float32),
    )


def test_scoring_service_matches_unbatched_kernels():
    n, fps = 300, 30.0
    svc = ScoringService(WEIGHTS, n=n, fps=fps, max_batch=8, max_wait_ms=20.0)
    try:
        reqs = [_request(i, n, fps, sync=(i % 2 == 0)) for i in range(5)]
        futures = [svc.submit(r) for r in reqs]
        results = [f.result(timeout=60) for f in futures]

        w, b = fusion.weights_to_vectors(WEIGHTS)
        for r, res in zip(reqs, results):
            lip = float(lip_sync_score_xla(r.mouth, r.audio, fps).score)
            feats = np.concatenate([r.other_feats[:2], [lip], r.other_feats[2:]])
            expected = 1 / (1 + np.exp(-(feats @ w + float(b))))
            assert res["lip_sync_score"] == pytest.approx(lip, abs=1e-5)
            assert res["fake_probability"] == pytest.approx(expected, abs=1e-5)
        # all five went through at most 2 compiled batches
        assert svc.batcher.batches_run <= 2
    finally:
        svc.close()


def test_scoring_service_sync_scores_higher():
    n, fps = 300, 30.0
    svc = ScoringService({"bias": 0.0, "lip_sync": 1.0}, n=n, fps=fps, max_wait_ms=5.0)
    try:
        synced = svc.score(_request(1, n, fps, sync=True))
        random = svc.score(_request(2, n, fps, sync=False))
        assert synced["lip_sync_score"] > random["lip_sync_score"]
        assert synced["fake_probability"] > random["fake_probability"]
    finally:
        svc.close()


def test_scoring_service_throughput_under_concurrency():
    """Many threads submitting simultaneously must coalesce."""
    n, fps = 150, 30.0
    svc = ScoringService(WEIGHTS, n=n, fps=fps, max_batch=16, max_wait_ms=30.0)
    try:
        results = []
        lock = threading.Lock()

        def client(i):
            res = svc.score(_request(i, n, fps))
            with lock:
                results.append(res)

        threads = [threading.Thread(target=client, args=(i,)) for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 12
        assert svc.batcher.batches_run < 12  # batching actually happened
    finally:
        svc.close()


def test_microbatcher_close_fails_pending_cleanly():
    import queue as _q

    started = threading.Event()

    def slow_batch(items):
        started.set()
        time.sleep(0.2)
        return items

    mb = MicroBatcher(slow_batch, max_batch=1, max_wait_ms=1.0)
    f1 = mb.submit("a")
    started.wait(timeout=5)
    f2 = mb.submit("b")  # queued behind the in-flight batch
    mb.close()
    assert f1.result(timeout=5) == "a"
    with pytest.raises(RuntimeError):
        f2.result(timeout=5)
    # submit after close fails immediately
    with pytest.raises(RuntimeError):
        mb.submit("c").result(timeout=1)


def test_scoring_service_shards_over_mesh():
    """Under the 8-virtual-device conftest the service runs each micro-batch
    as one SPMD program over the data mesh axis; request counts that don't
    divide the device count are padded internally and results stay exact."""
    import jax

    n, fps = 150, 30.0
    svc = ScoringService(WEIGHTS, n=n, fps=fps, max_batch=16, max_wait_ms=5.0)
    try:
        assert svc._n_shards == jax.device_count()
        reqs = [_request(i, n, fps, sync=(i % 2 == 0)) for i in range(3)]
        results = [svc.score(r) for r in reqs]
        for r, res in zip(reqs, results):
            lip = float(lip_sync_score_xla(r.mouth, r.audio, fps).score)
            assert res["lip_sync_score"] == pytest.approx(lip, abs=1e-5)
    finally:
        svc.close()
