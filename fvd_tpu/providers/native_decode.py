"""ctypes bindings for the native libav decode shim (native/decode_shim.cc).

Build-on-demand (``make -C native``) with graceful fallback: callers check
:func:`available` and fall back to the cv2 path when the shim or its
libav dependencies are missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libfvd_decode.so"))

_lib = None
_lib_lock = threading.Lock()
_build_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH) and not _build_attempted:
            _build_attempted = True
            try:
                subprocess.run(
                    ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                    capture_output=True, timeout=120,
                )
            except Exception:
                pass
        if not os.path.exists(_SO_PATH):
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.fvd_open.restype = ctypes.c_void_p
        lib.fvd_open.argtypes = [ctypes.c_char_p]
        lib.fvd_close.argtypes = [ctypes.c_void_p]
        lib.fvd_probe.restype = ctypes.c_int
        lib.fvd_probe.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ]
        lib.fvd_read_frames.restype = ctypes.c_int64
        lib.fvd_read_frames.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.fvd_extract_audio.restype = ctypes.c_int64
        lib.fvd_extract_audio.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        # fvd_probe_extra landed after the first shim build; absent on a
        # stale .so (callers treat it as "no extra metadata")
        if hasattr(lib, "fvd_probe_extra"):
            lib.fvd_probe_extra.restype = ctypes.c_int
            lib.fvd_probe_extra.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
                ctypes.c_char_p, ctypes.c_int,
            ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NativeVideo:
    """One decode session (the shim reads each stream in a single pass, so
    open a fresh session per operation)."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native decode shim unavailable")
        self._lib = lib
        self._h = lib.fvd_open(path.encode())
        if not self._h:
            raise IOError(f"native shim cannot open {path}")

    def close(self):
        if self._h:
            self._lib.fvd_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def probe(self) -> Tuple[float, int, int, int, float, bool]:
        fps = ctypes.c_double()
        frames = ctypes.c_int64()
        w = ctypes.c_int()
        h = ctypes.c_int()
        dur = ctypes.c_double()
        has_audio = ctypes.c_int()
        rc = self._lib.fvd_probe(self._h, ctypes.byref(fps), ctypes.byref(frames),
                                 ctypes.byref(w), ctypes.byref(h),
                                 ctypes.byref(dur), ctypes.byref(has_audio))
        if rc != 0:
            raise IOError("probe failed")
        return fps.value, frames.value, w.value, h.value, dur.value, bool(has_audio.value)

    def probe_extra(self) -> Tuple[int, str]:
        """(rotation degrees [0, 360), codec name) — the ffprobe metadata
        the reference's ingest reads (main.py:77-170)."""
        if not hasattr(self._lib, "fvd_probe_extra"):
            return 0, ""
        rot = ctypes.c_int()
        buf = ctypes.create_string_buffer(64)
        rc = self._lib.fvd_probe_extra(self._h, ctypes.byref(rot), buf, len(buf))
        if rc != 0:
            return 0, ""
        return rot.value, buf.value.decode(errors="replace")

    def read_frames(self, frame_ids) -> Tuple[np.ndarray, List[int]]:
        fps, n_frames, w, h, _, _ = self.probe()
        ids = np.asarray(sorted(set(int(i) for i in frame_ids)), np.int64)
        out = np.empty((len(ids), h, w, 3), np.uint8)
        kept = np.empty(len(ids), np.int64)
        n = self._lib.fvd_read_frames(
            self._h,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(ids),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            kept.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if n < 0:
            raise IOError("frame decode failed")
        return out[:n], kept[:n].tolist()

    def extract_audio(self, target_sr: int, max_seconds: float = 7200.0) -> Optional[np.ndarray]:
        max_samples = int(target_sr * max_seconds)
        out = np.empty(max_samples, np.float32)
        n = self._lib.fvd_extract_audio(
            self._h, target_sr,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_samples,
        )
        if n < 0:
            return None
        return out[:n].copy()
