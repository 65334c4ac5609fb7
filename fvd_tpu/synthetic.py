"""Synthetic media + model stand-ins.

Used by the benchmark, the demo path and the hermetic test-suite: generates
videos with a trackable "face" whose mouth aperture is driven by the same
gate as the audio track (so the lip-sync kernel has real signal), plus
deterministic detector/landmark providers with the production batch APIs.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from fvd_tpu.providers.media import write_video
from fvd_tpu.providers.vision import FaceBox
from fvd_tpu.utils.wav import write_wav


def make_synthetic_video(
    dirpath: str,
    name: str = "clip",
    duration: float = 6.0,
    fps: float = 10.0,
    width: int = 160,
    height: int = 120,
    gate_hz: float = 1.0,
    sr: int = 16000,
) -> str:
    """Bright-square 'face' video + gated-tone sibling wav; the mouth strip
    and the audio share the same gate -> positive lip-sync correlation."""
    os.makedirs(dirpath, exist_ok=True)
    n = int(fps * duration)
    x1, y1 = int(width * 0.25), int(height * 0.17)
    x2, y2 = int(width * 0.69), int(height * 0.75)
    frames = np.zeros((n, height, width, 3), np.uint8)
    for i in range(n):
        frames[i, :, :] = 16
        frames[i, y1:y2, x1:x2] = 200
        gate = 0.5 * (1 + np.sin(2 * np.pi * gate_hz * (i / fps)))
        mh = int(4 + 10 * gate)
        my = int(height * 0.58)
        frames[i, my : my + mh, int(width * 0.38) : int(width * 0.56)] = 60
    video_path = os.path.join(dirpath, f"{name}.mp4")
    write_video(video_path, frames, fps)

    t = np.arange(int(sr * duration)) / sr
    gate = (np.sin(2 * np.pi * gate_hz * t) > 0).astype(np.float32)
    sig = 0.5 * np.sin(2 * np.pi * 330 * t).astype(np.float32) * gate
    write_wav(os.path.join(dirpath, f"{name}.wav"), sig, sr)
    return video_path


TONE_ALPHABET = "abcdefghijklmnopqrstuvwxyz "
TONE_SR = 16000
TONE_CHAR_S = 0.08
TONE_BASE_HZ = 300.0
TONE_STEP_HZ = 60.0


def tone_speech(text: str, rng: np.random.RandomState | None = None) -> np.ndarray:
    """Tone-coded 'speech': each character is a Hann-windowed sine on a
    frequency ladder. The training domain for the JAX ASR stack
    (tools/pretrain_asr.py) and the hermetic transcription fixture —
    the role Whisper audio plays in the reference (a2_vad_asr.py:27-30).
    """
    n = int(TONE_SR * TONE_CHAR_S)
    t = np.arange(n) / TONE_SR
    chunks = []
    for ch in text:
        k = TONE_ALPHABET.index(ch)
        f = TONE_BASE_HZ + k * TONE_STEP_HZ
        chunks.append(0.4 * np.sin(2 * np.pi * f * t) * np.hanning(n))
    audio = np.concatenate(chunks) if chunks else np.zeros(n)
    if rng is not None:
        audio = audio + 0.01 * rng.randn(len(audio))
    return audio.astype(np.float32)


class SyntheticFaceDetector:
    """Finds the bright square — a deterministic FaceDetectorProvider."""

    model_name = "synthetic_blob"

    def detect_batch(self, frames: np.ndarray) -> List[List[FaceBox]]:
        out = []
        for frame in frames:
            mask = frame.mean(axis=-1) > 120
            ys, xs = np.nonzero(mask)
            if len(xs) == 0:
                out.append([])
                continue
            out.append(
                [FaceBox(float(xs.min()), float(ys.min()),
                         float(xs.max() + 1), float(ys.max() + 1), 0.95)]
            )
        return out


class SyntheticLandmarks:
    """68-point landmark + pose provider driven by the bright-square layout.

    Mouth aperture follows the configured gate so C1 sees a syncable MAR
    track; eyes get plausible EAR geometry; poses drift smoothly.
    """

    model_name = "synthetic_landmarks"

    def __init__(self, fps: float = 10.0, gate_hz: float = 1.0):
        self.fps = fps
        self.gate_hz = gate_hz
        self._call = 0

    def _points_for(self, frame: np.ndarray, i: int) -> np.ndarray:
        mask = frame.mean(axis=-1) > 120
        ys, xs = np.nonzero(mask)
        if len(xs) == 0:
            return None
        cx, cy = (xs.min() + xs.max()) / 2, (ys.min() + ys.max()) / 2
        half = max((xs.max() - xs.min()) / 2, 12)
        pts = np.zeros((68, 2))
        ang = np.linspace(0, 2 * np.pi, 48, endpoint=False)
        pts[:48, 0] = cx + 0.8 * half * np.cos(ang)
        pts[:48, 1] = cy + 0.8 * half * np.sin(ang)
        for base, ex in ((36, cx - 0.4 * half), (42, cx + 0.4 * half)):
            ey = cy - 0.3 * half
            pts[base + 0] = [ex - 6, ey]
            pts[base + 3] = [ex + 6, ey]
            pts[base + 1] = [ex - 2, ey - 2]
            pts[base + 2] = [ex + 2, ey - 2]
            pts[base + 4] = [ex + 2, ey + 2]
            pts[base + 5] = [ex - 2, ey + 2]
        # aperture measured from the rendered mouth strip (content-based, so
        # chunked streaming sees identical landmarks regardless of batch
        # boundaries; the strip height encodes the gate)
        mouth_mask = np.all(np.abs(frame.astype(int) - 60) < 10, axis=-1)
        strip_rows = np.nonzero(mouth_mask.any(axis=1))[0]
        if len(strip_rows) > 0:
            aperture = 2 + (strip_rows.max() - strip_rows.min())
        else:
            gate = 0.5 * (1 + np.sin(2 * np.pi * self.gate_hz * (i / self.fps)))
            aperture = 2 + 10 * gate
        mcx, mcy = cx, cy + 0.5 * half
        outer = np.linspace(0, 2 * np.pi, 12, endpoint=False)
        pts[48:60, 0] = mcx + 12 * np.cos(outer)
        pts[48:60, 1] = mcy + aperture * np.sin(outer)
        inner = np.linspace(0, 2 * np.pi, 8, endpoint=False)
        pts[60:68, 0] = mcx + 8 * np.cos(inner)
        pts[60:68, 1] = mcy + 0.7 * aperture * np.sin(inner)
        return pts

    def landmarks_batch(self, frames: np.ndarray) -> List[List[np.ndarray]]:
        out = []
        for i, frame in enumerate(frames):
            pts = self._points_for(frame, i)
            out.append([pts] if pts is not None else [])
        return out

    def pose_batch(self, crops: np.ndarray) -> np.ndarray:
        n = len(crops)
        idx = np.arange(self._call, self._call + n)
        self._call += n
        return np.stack(
            [10 + 2 * np.sin(idx / 5.0), (idx * 0.5) % 20.0, np.full(n, 5.0)], axis=1
        )


def hermetic_providers(fps: float = 10.0, gate_hz: float = 1.0):
    """Provider bundle with no network / no weights: real device kernels,
    deterministic everything else."""
    from fvd_tpu.providers import Providers
    from fvd_tpu.providers.asr import EnergyVAD

    return Providers(
        asr=EnergyVAD(),
        face_detector=SyntheticFaceDetector(),
        landmarks=SyntheticLandmarks(fps=fps, gate_hz=gate_hz),
    )
