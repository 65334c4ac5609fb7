"""Media decode / download providers.

The reference ingests via yt-dlp + ffprobe/ffmpeg subprocesses + OpenCV +
MoviePy (``main.py:56-290``); every V-node then re-opens the file and seeks
per frame (``v1:93-183``, ``v3:120-124``).  Here decode happens ONCE per run:
``VideoReader.sample`` returns a contiguous ``uint8[T, H, W, 3]`` RGB batch
(host-pinned numpy, ready for a single host->HBM transfer), and all vision
nodes consume slices of that tensor.

This image has no ffmpeg binary: decode is cv2 (its bundled native codecs);
audio extraction uses ffmpeg when present, else a sibling ``.wav`` next to
the input, else none (reference tolerates missing audio, main.py:267-271).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class VideoMeta:
    fps: float
    frame_count: int
    width: int
    height: int

    @property
    def duration(self) -> float:
        return self.frame_count / self.fps if self.fps else 0.0

    @property
    def size(self) -> Tuple[int, int]:
        return (self.width, self.height)


import threading as _threading

_identity_lock = _threading.Lock()
_identity_memo: "dict[tuple, str]" = {}


def content_key(path: str) -> str:
    """Stable content identity for a media file (sha1 of the bytes).

    The frame / device-frame caches key on content, not path: every run
    copies its input into a fresh ``processed/video_<ts>/video.mp4``
    (reference behavior, main.py:60-62), so a path-keyed cache can never
    hit across runs of the same video.  Re-analysis of identical content —
    the reference's own batch harness replays videos repeatedly
    (batch_test.py:153-189) — skips the host decode AND the multi-MB
    host->HBM frame upload, the dominant per-video cost behind a slow
    device link.  Digests are memoized on (realpath, size, mtime_ns).
    """
    import hashlib

    try:
        real = os.path.realpath(path)
        st = os.stat(real)
    except OSError:
        return path
    memo_key = (real, st.st_size, st.st_mtime_ns)
    with _identity_lock:
        cached = _identity_memo.get(memo_key)
    if cached is not None:
        return cached
    h = hashlib.sha1()
    try:
        with open(real, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
    except OSError:
        return path
    key = f"content:{h.hexdigest()}:{st.st_size}"
    with _identity_lock:
        if len(_identity_memo) > 4096:
            _identity_memo.clear()
        _identity_memo[memo_key] = key
    return key


class _FrameCache:
    """Content-keyed decoded-frame cache shared across nodes and runs.

    V1 (1 fps), V3 and V4 (5 fps each) all read the same video; without
    sharing, a run decodes the file three times.  The cache holds
    {content_key -> {frame_id: rgb}} with per-key locks (the scheduler runs
    V3/V4 concurrently) and evicts whole entries beyond a frame budget.
    Keying on content (see :func:`content_key`) also serves repeated
    analysis of the same video from fresh run dirs.
    """

    def __init__(self, max_frames: int = 4096):
        import threading

        self._frames: "dict[str, dict[int, np.ndarray]]" = {}
        self._meta: "dict[str, VideoMeta]" = {}
        # {content_key -> {ids_tuple: stacked [T,H,W,3]}}: memo of the
        # STACKED batch per sample grid. Re-sampling an identical grid of a
        # resident video (every warm pass; V3+V4 share a grid) returns the
        # memoized block instead of re-running a ~100 MB np.stack — on the
        # 1-core host that stack was the dominant warm-pass "decode" cost.
        # Consumers never mutate sampled batches in place (viz draws copy;
        # crops are read-only views), same contract the per-frame store
        # already relies on.
        self._stacks: "dict[str, dict[tuple, np.ndarray]]" = {}
        self._order: List[str] = []
        self._locks: "dict[str, threading.Lock]" = {}
        self._global = threading.Lock()
        self.max_frames = max_frames

    def lock_for(self, path: str):
        import threading

        key = content_key(path)
        with self._global:
            if key not in self._locks:
                self._locks[key] = threading.Lock()
            return self._locks[key]

    def get_meta(self, path: str) -> Optional["VideoMeta"]:
        return self._meta.get(content_key(path))

    def put_meta(self, path: str, meta: "VideoMeta") -> None:
        self._meta[content_key(path)] = meta

    def lookup(self, path: str, ids: Sequence[int]):
        """Copy out cached frame refs for ``ids`` (under the global lock so a
        concurrent eviction can't tear the view). Returns (found, missing)."""
        key = content_key(path)
        with self._global:
            store = self._frames.get(key, {})
            found = {i: store[i] for i in ids if i in store}
        missing = [i for i in ids if i not in found]
        return found, missing

    def get_stack(self, path: str, ids: Sequence[int]) -> Optional[np.ndarray]:
        key = content_key(path)
        with self._global:
            return self._stacks.get(key, {}).get(tuple(ids))

    def put_stack(self, path: str, ids: Sequence[int], arr: np.ndarray) -> None:
        key = content_key(path)
        with self._global:
            per = self._stacks.setdefault(key, {})
            per[tuple(ids)] = arr
            while len(per) > 4:  # a video sees ~3 grids (union/5fps/1fps)
                per.pop(next(iter(per)))

    def insert(self, path: str, frames: np.ndarray, ids: Sequence[int]) -> None:
        key = content_key(path)
        with self._global:
            store = self._frames.setdefault(key, {})
            if key not in self._order:
                self._order.append(key)
            for f, i in zip(frames, ids):
                store[i] = f
            total = sum(len(s) for s in self._frames.values())
            while total > self.max_frames and len(self._order) > 1:
                victim = self._order.pop(0)
                if victim == key:
                    self._order.append(victim)
                    continue
                total -= len(self._frames.pop(victim, {}))
                self._meta.pop(victim, None)
                self._stacks.pop(victim, None)

    def clear(self) -> None:
        with self._global:
            self._frames.clear()
            self._meta.clear()
            self._stacks.clear()
            self._order.clear()


_frame_cache = _FrameCache()


def _accepts_device_frames_kwarg(provider) -> bool:
    """Does ``provider.landmarks_batch`` take a ``device_frames`` kwarg?"""
    import inspect

    try:
        sig = inspect.signature(provider.landmarks_batch)
    except (TypeError, ValueError):
        return False
    params = sig.parameters.values()
    return any(
        p.name == "device_frames" or p.kind is inspect.Parameter.VAR_KEYWORD
        for p in params
    )


class _LandmarkShare:
    """Cross-branch model-result sharing.

    V3 and V4 run the same landmark forward over the same sampled frames
    (the reference runs FAN twice, v3:130 and v4:131); the DAG scheduler
    executes them concurrently, so the second branch would duplicate a full
    device forward. Results are shared per (path, provider, chunk): the
    first arrival computes under a per-key lock, the concurrent branch
    blocks briefly and reuses. Consumers treat landmark lists as read-only.
    """

    def __init__(self, max_entries: int = 64):
        import threading

        self._results: "dict[tuple, list]" = {}
        self._locks: "dict[tuple, threading.Lock]" = {}
        self._order: List[tuple] = []
        self._global = threading.Lock()
        self.max_entries = max_entries

    def get(self, path: str, ids: Sequence[int], provider, frames: np.ndarray,
            device_frames=None, pose_pad=None):
        """Returns ``(lm_lists, pose_lists_or_None, entry_pad)``.

        When ``pose_pad`` is given and the provider supports the fused
        landmark+pose program, the shared forward computes BOTH in one
        dispatch (V3 discards the poses; V4 consumes them, skipping its
        separate pose dispatch).  ``entry_pad`` tells a pose consumer which
        pad the cached poses were computed with (a mismatched request falls
        back to its own pose dispatch — in practice V3/V4/streaming all pass
        ``cfg.pose_crop_pad_frac``, so one entry serves everyone).
        """
        # full ids in the key (same first/last/len with different interiors
        # must not collide); the cached entry keeps a strong ref to the
        # provider so a recycled id() can never alias a dead provider's
        # results
        key = (path, id(provider), tuple(int(i) for i in ids))
        import threading

        with self._global:
            lock = self._locks.setdefault(key, threading.Lock())
        with lock:
            with self._global:
                if key in self._results:
                    return self._results[key][1]
            fused = (pose_pad is not None
                     and device_frames is not None
                     and hasattr(provider, "landmarks_pose_batch")
                     and not os.environ.get("FVD_TPU_NO_FUSED_POSE"))
            # Signature-probe (not try/except TypeError: a coalesced group
            # forward can legitimately raise TypeError for dtype/shape
            # errors, which must propagate, not silently retry host-side).
            if fused:
                lm, poses = provider.landmarks_pose_batch(
                    frames, device_frames=device_frames,
                    pose_pad=float(pose_pad))
                result = (lm, poses, float(pose_pad))
            elif _accepts_device_frames_kwarg(provider):
                result = (provider.landmarks_batch(
                    frames, device_frames=device_frames), None, None)
            else:
                result = (provider.landmarks_batch(frames), None, None)
            with self._global:
                self._results[key] = (provider, result)
                self._order.append(key)
                while len(self._order) > self.max_entries:
                    victim = self._order.pop(0)
                    self._results.pop(victim, None)
                    self._locks.pop(victim, None)
            return result

    def clear(self) -> None:
        with self._global:
            self._results.clear()
            self._locks.clear()
            self._order.clear()


_landmark_share = _LandmarkShare()


class _DeviceFrameCache:
    """One HBM-resident uint8 frame tensor per (video, sample grid).

    The north-star design (BASELINE.json): decode once on host, upload once,
    and let every V-node consume device-side slices. V1 uploads the union
    sampling grid; V3/V4 (and any other consumer of a subset grid) get their
    frames via an on-device gather instead of a second 30+ MB host->HBM
    transfer — the dominant per-video cost behind a slow host link.
    """

    def __init__(self, max_bytes: int = 1 << 30):
        import threading

        self._entries: "dict[str, list]" = {}  # path -> [(ids_tuple, dev_array)]
        self._order: List[tuple] = []  # (path, ids_tuple) LRU
        self._lock = threading.Lock()
        self.max_bytes = max_bytes

    def get(self, path: str, ids: Sequence[int], frames_host=None):
        """Device frames for ``ids`` of ``path`` or None.

        Served from an exact entry, gathered on device from a superset
        entry, or uploaded from ``frames_host`` when provided.
        """
        import jax
        import jax.numpy as jnp

        path = content_key(path)  # HBM entries are content-addressed
        ids_t = tuple(int(i) for i in ids)
        if not ids_t:
            return None
        with self._lock:
            for eids, arr in self._entries.get(path, []):
                if eids == ids_t:
                    return arr
                eset = dict((fid, i) for i, fid in enumerate(eids))
                if all(fid in eset for fid in ids_t):
                    pos = jnp.asarray([eset[fid] for fid in ids_t])
                    return jnp.take(arr, pos, axis=0)
            if frames_host is None or len(frames_host) != len(ids_t):
                return None
            dev = jax.device_put(np.ascontiguousarray(frames_host))
            self._entries.setdefault(path, []).append((ids_t, dev))
            self._order.append((path, ids_t))
            self._evict_locked()
            return dev

    def _evict_locked(self) -> None:
        def total() -> int:
            return sum(arr.nbytes for es in self._entries.values() for _, arr in es)

        while total() > self.max_bytes and len(self._order) > 1:
            path, ids_t = self._order.pop(0)
            self._entries[path] = [
                (e, a) for e, a in self._entries.get(path, []) if e != ids_t
            ]

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()
            self._order.clear()


_device_frames = _DeviceFrameCache()


def device_frames_for(path: str, ids: Sequence[int], frames_host=None):
    """HBM-resident frames for a sample grid (see _DeviceFrameCache)."""
    return _device_frames.get(path, ids, frames_host)


def shared_landmarks(path: str, ids: Sequence[int], provider, frames: np.ndarray,
                     device_frames=None, pose_pad=None):
    """Landmark forward for ``frames`` (sampled ``ids`` of ``path``), shared
    across concurrently-running nodes.  Pass ``pose_pad`` (the V4 tracker's
    crop pad) so the shared program also computes per-detection poses in the
    same dispatch when the provider supports it — a landmarks-only caller
    that passes it makes the shared entry reusable by V4."""
    if len(ids) == 0:
        return []
    return _landmark_share.get(path, ids, provider, frames, device_frames,
                               pose_pad)[0]


def shared_landmarks_pose(path: str, ids: Sequence[int], provider,
                          frames: np.ndarray, device_frames=None,
                          pose_pad: float = 0.0):
    """Like :func:`shared_landmarks` but returns ``(lm_lists, pose_lists)``;
    ``pose_lists`` is None when the fused program is unavailable (host-crop
    provider, FVD_TPU_NO_FUSED_POSE, no device frames) or when the cached
    entry was computed with a different pad — the caller then runs its own
    pose dispatch."""
    if len(ids) == 0:
        return [], None
    lm, poses, entry_pad = _landmark_share.get(
        path, ids, provider, frames, device_frames, pose_pad)
    if poses is not None and entry_pad == float(pose_pad):
        return lm, poses
    return lm, None


def cached_keyframe_images(paths: Sequence[str]) -> List[Optional[np.ndarray]]:
    """Raw frames for V1's keyframe artifacts (``<dir>/keyframes/frame_<id>.jpg``).

    Served from the host frame cache when the source video's decoded frames
    are still resident — no JPEG decode, no compression artifacts; falls
    back to reading the file. V2/C2 consume every keyframe per video, so
    this drops ~30 JPEG decodes per node per video on the 1-core host.
    """
    out: List[Optional[np.ndarray]] = []
    for p in paths:
        frame = None
        base = os.path.basename(p)
        digits = [t for t in base.replace(".", "_").split("_") if t.isdigit()]
        if digits:
            fid = int(digits[0])
            video = os.path.join(os.path.dirname(os.path.dirname(p)), "video.mp4")
            found, _ = _frame_cache.lookup(video, [fid])
            frame = found.get(fid)
        if frame is None and os.path.exists(p):
            import cv2

            bgr = cv2.imread(p)
            if bgr is not None:
                frame = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        out.append(frame)
    return out


def keyframe_device_frames(paths: Sequence[str]):
    """HBM-resident native frames for V1 keyframe artifacts, or None.

    Parses ``<dir>/keyframes/frame_<id>.jpg`` like
    :func:`cached_keyframe_images` and serves the frames via an on-device
    gather from the union grid V1 uploaded (see ``_DeviceFrameCache``).
    Returns None unless every path maps into one cached video — callers
    fall back to the host batch path.
    """
    if not paths:
        return None
    ids: List[int] = []
    video: Optional[str] = None
    for p in paths:
        base = os.path.basename(p)
        digits = [t for t in base.replace(".", "_").split("_") if t.isdigit()]
        if not digits:
            return None
        v = os.path.join(os.path.dirname(os.path.dirname(p)), "video.mp4")
        if video is None:
            video = v
        elif v != video:
            return None
        ids.append(int(digits[0]))
    return _device_frames.get(video, ids)


def clear_frame_cache() -> None:
    _frame_cache.clear()
    _landmark_share.clear()
    _device_frames.clear()


class VideoReader:
    """Batched probe + frame sampling.

    Prefers the native libav shim (native/decode_shim.cc via
    fvd_tpu.providers.native_decode): one sequential decode pass fills a
    contiguous RGB buffer.  Falls back to cv2 when the shim isn't built.
    Decoded frames are shared across nodes via a process-wide cache.
    """

    def __init__(self, prefer_native: bool = True, use_cache: bool = True):
        from fvd_tpu.providers import native_decode

        self._native = native_decode if (prefer_native and native_decode.available()) else None
        self._cache = _frame_cache if use_cache else None

    def probe(self, path: str) -> Optional[VideoMeta]:
        if self._cache is not None:
            cached = self._cache.get_meta(path)
            if cached is not None:
                return cached
        meta = self._probe_uncached(path)
        if meta is not None and self._cache is not None:
            self._cache.put_meta(path, meta)
        return meta

    def _probe_uncached(self, path: str) -> Optional[VideoMeta]:
        if self._native is not None:
            try:
                with self._native.NativeVideo(path) as v:
                    fps, frames, w, h, _, _ = v.probe()
                if fps > 0 and frames > 0:
                    return VideoMeta(fps=fps, frame_count=int(frames), width=w, height=h)
            except Exception:
                pass  # fall through to cv2
        return self._probe_cv2(path)

    def _probe_cv2(self, path: str) -> Optional[VideoMeta]:
        import cv2

        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            return None
        meta = VideoMeta(
            fps=cap.get(cv2.CAP_PROP_FPS) or 0.0,
            frame_count=int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
            width=int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            height=int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
        )
        ok, _ = cap.read()
        cap.release()
        if not ok or meta.fps <= 0 or meta.frame_count <= 0:
            return None
        return meta

    def sample(self, path: str, frame_ids: Sequence[int]) -> Tuple[np.ndarray, List[int]]:
        """Decode the requested frames -> (uint8 [T, H, W, 3] RGB, kept ids).

        Sequential single-pass decode (no per-frame seek): dramatically
        faster than the reference's ``cap.set(POS_FRAMES)`` per sample and
        the natural feeding pattern for an HBM-resident frame tensor.
        Results are served from / folded into the shared frame cache so
        concurrent V-nodes decode each file at most once.
        """
        wanted = sorted(set(int(i) for i in frame_ids))
        if self._cache is None:
            return self._sample_uncached(path, wanted)
        with self._cache.lock_for(path):
            found, missing = self._cache.lookup(path, wanted)
            if missing:
                frames, kept = self._sample_uncached(path, missing)
                # serve decoded frames directly — a concurrent eviction of
                # this path between insert and a re-lookup must not lose them
                found.update(dict(zip(kept, frames)))
                self._cache.insert(path, frames, kept)
            kept = [i for i in wanted if i in found]
            if not kept:
                return np.zeros((0, 0, 0, 3), np.uint8), []
            if not missing and not os.environ.get("FVD_TPU_NO_STACK_MEMO"):
                # fully resident: an identical grid was likely stacked before
                memo = self._cache.get_stack(path, kept)
                if memo is not None:
                    return memo, kept
            stacked = np.stack([found[i] for i in kept])
            if missing:
                # re-point the store at the stack's rows so the transient
                # decode buffer isn't held alive as a duplicate copy
                self._cache.insert(path, stacked, kept)
            self._cache.put_stack(path, kept, stacked)
            return stacked, kept

    def _sample_uncached(self, path: str, frame_ids: Sequence[int]) -> Tuple[np.ndarray, List[int]]:
        if self._native is not None:
            try:
                with self._native.NativeVideo(path) as v:
                    return v.read_frames(frame_ids)
            except Exception:
                pass  # fall through to cv2
        return self._sample_cv2(path, frame_ids)

    def _sample_cv2(self, path: str, frame_ids: Sequence[int]) -> Tuple[np.ndarray, List[int]]:
        import cv2

        wanted = sorted(set(int(i) for i in frame_ids))
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            return np.zeros((0, 0, 0, 3), np.uint8), []
        frames: List[np.ndarray] = []
        kept: List[int] = []
        idx = 0
        next_i = 0
        while next_i < len(wanted):
            ok, frame = cap.read()
            if not ok:
                break
            if idx == wanted[next_i]:
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
                kept.append(idx)
                next_i += 1
            idx += 1
        cap.release()
        if not frames:
            return np.zeros((0, 0, 0, 3), np.uint8), []
        return np.stack(frames), kept

    def sample_at_fps(self, path: str, sample_fps: float) -> Tuple[np.ndarray, List[int], VideoMeta]:
        """Sample frames at ``sample_fps`` using the reference's stride rule
        (``v3:105-106``: stride = max(1, round(fps / target)))."""
        meta = self.probe(path)
        if meta is None:
            return np.zeros((0, 0, 0, 3), np.uint8), [], VideoMeta(0, 0, 0, 0)
        stride = max(1, int(round(meta.fps / sample_fps))) if meta.fps else 1
        ids = list(range(0, meta.frame_count, stride))
        frames, kept = self.sample(path, ids)
        return frames, kept, meta


class StreamingSampler:
    """Chunked sequential frame sampling for long videos.

    Yields ``(frames uint8 [<=chunk, H, W, 3], kept_ids)`` batches while the
    underlying decoder makes ONE pass over the file (the native shim keeps
    its decode position across calls; the cv2 fallback keeps the capture
    open) — memory stays bounded by the chunk size regardless of duration.
    """

    def __init__(self, path: str, frame_ids: Sequence[int], chunk_size: int = 512,
                 prefer_native: bool = True):
        self.path = path
        self.ids = sorted(set(int(i) for i in frame_ids))
        self.chunk_size = max(1, chunk_size)
        from fvd_tpu.providers import native_decode

        self._native = native_decode if (prefer_native and native_decode.available()) else None

    def __iter__(self):
        # Short videos (one chunk) go through the shared frame cache so
        # concurrent nodes sampling the same grid decode the file once;
        # genuinely long videos stream uncached with bounded memory.
        if len(self.ids) <= self.chunk_size:
            frames, kept = VideoReader().sample(self.path, self.ids)
            if len(kept) > 0:
                yield frames, kept
            return
        if self._native is not None:
            try:
                with self._native.NativeVideo(self.path) as v:
                    for start in range(0, len(self.ids), self.chunk_size):
                        chunk_ids = self.ids[start : start + self.chunk_size]
                        frames, kept = v.read_frames(chunk_ids)
                        if len(kept) == 0:
                            return
                        yield frames, kept
                return
            except Exception:
                pass  # fall through to cv2
        yield from self._iter_cv2()

    def _iter_cv2(self):
        import cv2

        cap = cv2.VideoCapture(self.path)
        if not cap.isOpened():
            return
        try:
            wanted = self.ids
            next_i = 0
            idx = 0
            frames: List[np.ndarray] = []
            kept: List[int] = []
            while next_i < len(wanted):
                ok, frame = cap.read()
                if not ok:
                    break
                if idx == wanted[next_i]:
                    frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
                    kept.append(idx)
                    next_i += 1
                    if len(frames) >= self.chunk_size:
                        yield np.stack(frames), kept
                        frames, kept = [], []
                idx += 1
            if frames:
                yield np.stack(frames), kept
        finally:
            cap.release()


class IncrementalVideoWriter:
    """Append-as-you-go mp4 writer (viz artifacts for chunked processing).

    Encoding happens on a dedicated background thread (runtime.io_pool): the
    node thread hands off a drawn chunk and immediately returns to decode /
    device dispatch; ``close()`` flushes and surfaces any encode failure.
    """

    def __init__(self, path: str, fps: float, cache_scope=None):
        """``cache_scope``: stable content identity (e.g. ``(content_key,
        node)``).  When set and the artifact cache is enabled, encoding is
        lazy: appends queue with caller-supplied fingerprints, and close
        either writes the cached encoded bytes (identical content re-run)
        or encodes once and stores them."""
        from fvd_tpu.runtime import io_pool

        self.path = path
        self.fps = fps
        self._writer = None
        #: True once any frames were handed to the sink — the file will
        #: exist (barring encode failure) even if close is deferred
        self.appended = False
        self._sink = None
        self._pending: list = []
        self._fp = None
        if cache_scope is not None and io_pool.artifact_cache_enabled():
            import hashlib

            self._cache_scope = cache_scope
            self._fp = hashlib.blake2b(digest_size=16)
        else:
            self._cache_scope = None
            self._sink = io_pool.AsyncFrameSink(self._write_batch, self._release)

    def _write_batch(self, frames_rgb: np.ndarray) -> None:
        import cv2

        if self._writer is None:
            h, w = frames_rgb.shape[1:3]
            self._writer = cv2.VideoWriter(
                self.path, cv2.VideoWriter_fourcc(*"mp4v"), self.fps, (w, h)
            )
        for f in frames_rgb:
            self._writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))

    def _release(self) -> None:
        if self._writer is not None:
            self._writer.release()
            self._writer = None

    def append(self, frames_rgb, fingerprint: bytes | None = None) -> None:
        """RGB uint8 [T,H,W,3] batch, or a zero-arg callable returning one
        (drawing then happens on the encoder thread).

        ``fingerprint``: bytes pinning the drawn content of this batch (the
        landmark/pose arrays the caller will draw) — required for the
        cached mode to identify a repeated-content encode without running
        the draw.  A callable without a fingerprint degrades the writer to
        the streaming (uncached) mode.
        """
        if not callable(frames_rgb) and len(frames_rgb) == 0:
            return
        self.appended = True
        if self._cache_scope is not None:
            if fingerprint is None and callable(frames_rgb):
                self._degrade_to_streaming()
            else:
                if fingerprint is None:
                    fingerprint = np.ascontiguousarray(frames_rgb).tobytes()
                self._fp.update(fingerprint)
                self._pending.append(frames_rgb)
                return
        self._sink.append(frames_rgb)

    def _degrade_to_streaming(self) -> None:
        from fvd_tpu.runtime.io_pool import AsyncFrameSink

        self._cache_scope = None
        self._sink = AsyncFrameSink(self._write_batch, self._release)
        for b in self._pending:
            self._sink.append(b)
        self._pending.clear()

    def _finish_cached(self) -> None:
        import os

        from fvd_tpu.runtime import io_pool

        key = (self._cache_scope, round(self.fps, 3), self._fp.hexdigest())
        data = io_pool.viz_cache_get(key)
        if data is not None:
            with open(self.path, "wb") as f:
                f.write(data)
            self._pending.clear()
            return
        try:
            for b in self._pending:
                if callable(b):
                    b = b()
                if len(b):
                    self._write_batch(np.asarray(b))
        finally:
            self._pending.clear()
            self._release()
        if os.path.exists(self.path):
            with open(self.path, "rb") as f:
                io_pool.viz_cache_put(key, f.read())

    def close(self) -> None:
        if self._cache_scope is not None:
            self._finish_cached()
            return
        self._sink.close()

    def close_async(self):
        """Deferred close: flush + encoder release happen on the sink
        thread (or, in cached mode, the artifact pool); returns a Future
        for ``runtime.io_pool.defer_artifact``."""
        if self._cache_scope is not None:
            from fvd_tpu.runtime.io_pool import _get_pool

            return _get_pool().submit(self._finish_cached)
        return self._sink.close_async()


def write_video(path: str, frames: np.ndarray, fps: float) -> None:
    """RGB uint8 [T, H, W, 3] -> mp4 (test fixtures + viz artifacts)."""
    import cv2

    t, h, w, _ = frames.shape
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    writer.release()


def ffmpeg_bin() -> Optional[str]:
    return shutil.which("ffmpeg")


def extract_audio(video_path: str, out_wav: str, target_sr: int = 44100) -> Optional[str]:
    """Extract an audio track to WAV.

    Priority: native libav shim -> ffmpeg binary -> sibling .wav next to the
    source video -> None (reference tolerates missing audio, main.py:267-271).
    """
    from fvd_tpu.providers import native_decode

    if native_decode.available():
        try:
            with native_decode.NativeVideo(video_path) as v:
                _, _, _, _, _, has_audio = v.probe()
                if has_audio:
                    samples = v.extract_audio(target_sr)
                    if samples is not None and len(samples) > 0:
                        from fvd_tpu.utils.wav import write_wav

                        write_wav(out_wav, samples, target_sr)
                        return out_wav
        except Exception:
            pass
    ff = ffmpeg_bin()
    if ff:
        proc = subprocess.run(
            [ff, "-y", "-i", video_path, "-ac", "2", "-f", "wav", out_wav],
            capture_output=True,
        )
        if proc.returncode == 0 and os.path.exists(out_wav):
            return out_wav
    sibling = os.path.splitext(video_path)[0] + ".wav"
    if os.path.exists(sibling):
        shutil.copy2(sibling, out_wav)
        return out_wav
    return None


class Downloader:
    """URL ingest with retries (reference main.py:175-250).

    yt-dlp is not in this image; the provider reports unavailability and the
    ingest node raises the same way the reference does after exhausting
    retries.
    """

    def __init__(self, retries: int = 3, backoff_s: float = 5.0):
        self.retries = retries
        self.backoff_s = backoff_s

    @property
    def available(self) -> bool:
        try:
            import yt_dlp  # type: ignore # noqa: F401

            return True
        except ImportError:
            return False

    def download(self, url: str, out_dir: str, debug: bool = False) -> Tuple[str, dict]:
        """Returns (video_path, metadata). Raises RuntimeError on failure."""
        if not self.available:
            raise RuntimeError(
                "URL ingest requires yt-dlp, which is not available in this "
                "environment. Provide a local file path instead."
            )
        import yt_dlp  # type: ignore

        from fvd_tpu.runtime.retry import retry

        opts = {
            "outtmpl": os.path.join(out_dir, "video.%(ext)s"),
            "format": "bestvideo[ext=mp4]+bestaudio[ext=m4a]/best[ext=mp4]/best",
            "quiet": not debug,
            "no_warnings": not debug,
        }
        cookies = "cookies.txt"
        if os.path.exists(cookies):
            opts["cookiefile"] = cookies

        def escalate_oauth2() -> None:
            # reference main.py:240-245: before the FINAL retry, switch
            # yt-dlp to its OAuth2 device-code flow (username 'oauth2',
            # empty password) so an age/region-gated download gets one
            # authenticated attempt after cookie-based ones fail
            print("IN: [ESCALATION] standard download failed; attempting "
                  "OAuth2 authentication (watch for a device code)")
            opts["username"] = "oauth2"
            opts["password"] = ""

        @retry(
            attempts=self.retries,
            backoff_s=self.backoff_s,
            on_retry=lambda n, e: print(f"IN: download attempt {n} failed: {e}"),
            escalate_on_last=escalate_oauth2,
        )
        def attempt() -> Tuple[str, dict]:  # pragma: no cover - network path
            with yt_dlp.YoutubeDL(opts) as ydl:
                info = ydl.extract_info(url, download=True)
                path = ydl.prepare_filename(info)
                meta = {
                    "title": info.get("title"),
                    "duration": info.get("duration"),
                    "uploader": info.get("uploader"),
                    "original_url": url,
                }
                return path, meta

        return attempt()
