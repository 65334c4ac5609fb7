"""Batched scoring service.

Production-serving layer (no reference analog — the reference serves one
video at a time through Streamlit): concurrent scoring requests are
micro-batched into single device programs, the TPU-native answer to
high-QPS serving where per-request dispatch would waste the chip.

Two layers:

* :class:`MicroBatcher` — generic dynamic batching: requests queue up, a
  worker drains up to ``max_batch`` every ``max_wait_ms``, pads to the next
  power-of-two bucket (bounded compilation count), runs ONE batched call,
  and distributes results to futures.
* :class:`ScoringService` — the flagship use: per-video signal tracks
  (mouth MAR + audio envelope + remaining features) scored through the
  fused lip-sync + LR program from ``__graft_entry__``-style fusion.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, List, Optional

import numpy as np


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class MicroBatcher:
    """Dynamic request batching onto a batched callable.

    ``batch_fn(inputs: list) -> list`` must accept a padded batch; padding
    uses the first request's input (results for pad slots are discarded).
    """

    def __init__(
        self,
        batch_fn: Callable[[List[Any]], List[Any]],
        max_batch: int = 32,
        max_wait_ms: float = 5.0,
    ):
        self.batch_fn = batch_fn
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self._queue: "queue.Queue[Optional[Tuple[Any, Future]]]" = queue.Queue()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._running = True
        self._closed = False
        self.batches_run = 0
        self.items_served = 0
        self._thread.start()

    def submit(self, item: Any) -> Future:
        fut: Future = Future()
        if self._closed:
            fut.set_exception(RuntimeError("MicroBatcher is closed"))
            return fut
        self._queue.put((item, fut))
        return fut

    def score(self, item: Any, timeout: Optional[float] = 60.0) -> Any:
        return self.submit(item).result(timeout=timeout)

    def close(self):
        self._closed = True
        self._running = False
        self._queue.put(None)
        self._thread.join(timeout=5)

    def _drain_pending(self):
        """Fail any requests still queued at shutdown instead of leaving
        their futures to time out."""
        while True:
            try:
                entry = self._queue.get_nowait()
            except queue.Empty:
                return
            if entry is not None:
                entry[1].set_exception(RuntimeError("MicroBatcher closed"))

    def _worker(self):
        while self._running:
            first = self._queue.get()
            if first is None:
                self._drain_pending()
                return
            batch = [first]
            deadline = self.max_wait_s
            import time

            t0 = time.monotonic()
            while len(batch) < self.max_batch:
                remaining = deadline - (time.monotonic() - t0)
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    self._running = False
                    break
                batch.append(nxt)

            items = [b[0] for b in batch]
            futures = [b[1] for b in batch]
            # pad to a power-of-two bucket to bound compile count
            padded = list(items)
            target = min(_next_pow2(len(items)), self.max_batch)
            while len(padded) < target:
                padded.append(items[0])
            try:
                results = self.batch_fn(padded)
                self.batches_run += 1
                self.items_served += len(items)
                for fut, res in zip(futures, results):
                    fut.set_result(res)
            except Exception as e:
                for fut in futures:
                    fut.set_exception(e)
        self._drain_pending()


@dataclass
class ScoreRequest:
    """One video's device-side scoring inputs.

    mouth: [N] MAR track on the fps grid; audio: [N] envelope;
    other_feats: [8] remaining feature values (order: speech_rate,
    pause_ratio, gesture, blink, jerk, texture, claim_rel, evidence_rel);
    all tracks must share the service's configured N and fps.
    """

    mouth: np.ndarray
    audio: np.ndarray
    other_feats: np.ndarray


class ScoringService:
    """Micro-batched fused scoring: lip-sync cross-correlation + LR fusion
    for a batch of videos in ONE device program per micro-batch."""

    def __init__(
        self,
        weights: Dict[str, float],
        n: int,
        fps: float,
        max_batch: int = 32,
        max_wait_ms: float = 5.0,
    ):
        import jax
        import jax.numpy as jnp

        from fvd_tpu.ops import fusion
        from fvd_tpu.ops.lipsync import lip_sync_score_xla

        self.n = n
        self.fps = fps
        w, b = fusion.weights_to_vectors(weights)
        self._w = jnp.asarray(w)
        self._b = jnp.asarray(b)

        # Multi-chip: shard the request batch over every visible device
        # (mesh axis "data"); XLA runs each micro-batch as one SPMD program
        # across the slice. Single-chip keeps the plain jit path.
        devices = jax.devices()
        self._n_shards = len(devices)
        if self._n_shards > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec

            self._mesh = Mesh(np.array(devices), ("data",))
            self._batch_sharding = NamedSharding(self._mesh, PartitionSpec("data"))
        else:
            self._batch_sharding = None

        @partial(jax.jit, static_argnames=())
        def batch_program(mouth, audio, other, w, b):
            def one(m, a):
                return lip_sync_score_xla(m, a, fps).score

            lip = jax.vmap(one)(mouth, audio)
            feats = jnp.concatenate([other[:, :2], lip[:, None], other[:, 2:]], axis=1)
            return jax.nn.sigmoid(feats @ w + b), lip

        self._program = batch_program

        def batch_fn(items: List[ScoreRequest]) -> List[Dict[str, float]]:
            n_req = len(items)
            # batch must divide evenly across the mesh's data axis
            if self._n_shards > 1 and n_req % self._n_shards:
                items = items + [items[0]] * (self._n_shards - n_req % self._n_shards)
            mouth = np.stack([i.mouth for i in items]).astype(np.float32)
            audio = np.stack([i.audio for i in items]).astype(np.float32)
            other = np.stack([i.other_feats for i in items]).astype(np.float32)
            if self._batch_sharding is not None:
                mouth, audio, other = (
                    jax.device_put(x, self._batch_sharding)
                    for x in (mouth, audio, other)
                )
            probs, lips = self._program(mouth, audio, other, self._w, self._b)
            probs = np.asarray(probs)[:n_req]
            lips = np.asarray(lips)[:n_req]
            return [
                {"fake_probability": float(p), "lip_sync_score": float(l)}
                for p, l in zip(probs, lips)
            ]

        self.batcher = MicroBatcher(batch_fn, max_batch=max_batch, max_wait_ms=max_wait_ms)

    def score(self, request: ScoreRequest, timeout: Optional[float] = 60.0) -> Dict[str, float]:
        return self.batcher.score(request, timeout)

    def submit(self, request: ScoreRequest) -> Future:
        return self.batcher.submit(request)

    def close(self):
        self.batcher.close()
