"""Synthetic media + provider fixtures for integration tests.

Mirrors the reference test strategy (SURVEY §4.1-4.2): generated media, no
real models, scripted external services.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from fvd_tpu.providers import (
    Providers,
    ScriptedASR,
    ScriptedLLM,
    ScriptedOCR,
    StaticSearch,
    StubClip,
)
from fvd_tpu.providers.media import write_video
from fvd_tpu.providers.vision import FaceBox
from fvd_tpu.utils.wav import write_wav

FPS = 10.0
DURATION = 6.0
W, H = 160, 120
FACE = (40, 20, 110, 90)  # x1, y1, x2, y2 bright square


def make_video_with_audio(dirpath: str) -> str:
    """A bright-square 'face' video + gated-tone sibling wav, mouth aperture
    and audio gated by the same 1 Hz square wave (sync-able by C1)."""
    os.makedirs(dirpath, exist_ok=True)
    n = int(FPS * DURATION)
    frames = np.zeros((n, H, W, 3), np.uint8)
    for i in range(n):
        frames[i, :, :] = 16
        x1, y1, x2, y2 = FACE
        frames[i, y1:y2, x1:x2] = 200
        # "mouth": darker strip whose height tracks the gate
        gate = 0.5 * (1 + np.sin(2 * np.pi * 1.0 * (i / FPS)))
        mh = int(4 + 10 * gate)
        frames[i, 70 : 70 + mh, 60:90] = 60
    video_path = os.path.join(dirpath, "clip.mp4")
    write_video(video_path, frames, FPS)

    sr = 16000
    t = np.arange(int(sr * DURATION)) / sr
    gate = (np.sin(2 * np.pi * 1.0 * t) > 0).astype(np.float32)
    sig = 0.5 * np.sin(2 * np.pi * 330 * t).astype(np.float32) * gate
    write_wav(os.path.join(dirpath, "clip.wav"), sig, sr)
    return video_path


class SyntheticFaceDetector:
    """Finds the bright square (a real detector stand-in with FaceBox API)."""

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
                [FaceBox(float(xs.min()), float(ys.min()), float(xs.max() + 1),
                         float(ys.max() + 1), 0.95)]
            )
        return out


def landmarks_for_frame(i: int, frame: np.ndarray):
    """68 scripted landmarks inside the face box; mouth aperture follows the
    same 1 Hz gate as the audio -> positive lip-sync correlation."""
    x1, y1, x2, y2 = FACE
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    pts = np.zeros((68, 2))
    # jaw + brows + nose + eyes: a rough ring
    ang = np.linspace(0, 2 * np.pi, 48, endpoint=False)
    pts[:48, 0] = cx + 30 * np.cos(ang)
    pts[:48, 1] = cy + 30 * np.sin(ang)
    # eyes at 36:48 — give them real EAR geometry
    for base, ex in ((36, cx - 15), (42, cx + 15)):
        pts[base + 0] = [ex - 6, cy - 10]
        pts[base + 3] = [ex + 6, cy - 10]
        pts[base + 1] = [ex - 2, cy - 12]
        pts[base + 2] = [ex + 2, cy - 12]
        pts[base + 4] = [ex + 2, cy - 8]
        pts[base + 5] = [ex - 2, cy - 8]
    # mouth 48:68
    gate = 0.5 * (1 + np.sin(2 * np.pi * 1.0 * (i / FPS)))
    aperture = 2 + 10 * gate
    mouth_cx, mouth_cy = cx, cy + 18
    outer = np.linspace(0, 2 * np.pi, 12, endpoint=False)
    pts[48:60, 0] = mouth_cx + 12 * np.cos(outer)
    pts[48:60, 1] = mouth_cy + aperture * np.sin(outer)
    inner = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    pts[60:68, 0] = mouth_cx + 8 * np.cos(inner)
    pts[60:68, 1] = mouth_cy + 0.7 * aperture * np.sin(inner)
    return [pts]


def scripted_providers() -> Providers:
    from fvd_tpu.providers.vision import ScriptedLandmarks

    llm = ScriptedLLM(
        responses={
            "fact-checking assistant": {"claims": ["the moon landing happened in 1969"]},
            "forensic image analyst": {"fake_probability": 0.3, "reasoning": "low ELA noise"},
            "source reliability": {"score": 0.85, "reason": "reputable outlet"},
            "Does the image support": {"consistent": True, "reason": "matches"},
        },
        default=None,
    )
    search = StaticSearch(
        {
            "moon landing": [
                {"url": "https://bbc.com/a", "title": "Moon landing fact check",
                 "snippet": "the moon landing happened in 1969", "source": "stub",
                 "date": None, "relevance_score": 0.0},
                {"url": "https://nasa.gov/apollo", "title": "Apollo 11",
                 "snippet": "moon landing 1969", "source": "stub",
                 "date": None, "relevance_score": 0.0},
            ]
        }
    )
    asr = ScriptedASR(
        text="the moon landing happened in nineteen sixty nine and it was real",
        segments=[
            {"start": 0.0, "end": 2.0, "text": "the moon landing happened"},
            {"start": 2.5, "end": 4.5, "text": "in nineteen sixty nine"},
            {"start": 5.0, "end": 6.0, "text": "and it was real"},
        ],
    )
    poses = np.stack(
        [10 + 2 * np.sin(np.arange(60) / 5.0),
         np.arange(60) * 0.5 % 20,
         np.full(60, 5.0)],
        axis=1,
    )
    return Providers(
        llm=llm,
        search=search,
        clip=StubClip(default=0.3),
        asr=asr,
        ocr=ScriptedOCR([{"text": "BREAKING NEWS", "confidence": 0.9,
                          "bbox": [[0, 0], [50, 0], [50, 10], [0, 10]]}]),
        face_detector=SyntheticFaceDetector(),
        landmarks=ScriptedLandmarks(frames_landmarks=landmarks_for_frame, poses=poses),
    )
