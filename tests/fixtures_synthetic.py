"""Synthetic media + provider fixtures for integration tests.

Media/vision generators live in fvd_tpu.synthetic (shared with bench and
demos); this module adds the scripted external-service providers the
integration tests use (the reference test strategy, SURVEY §4.1-4.2).
"""

from __future__ import annotations

import os

import numpy as np

from fvd_tpu.providers import (
    Providers,
    ScriptedASR,
    ScriptedLLM,
    ScriptedOCR,
    StaticSearch,
    StubClip,
)
from fvd_tpu.synthetic import (  # noqa: F401  (re-exported for tests)
    SyntheticFaceDetector,
    SyntheticLandmarks,
    make_synthetic_video,
)

FPS = 10.0
DURATION = 6.0


def make_video_with_audio(dirpath: str) -> str:
    return make_synthetic_video(dirpath, name="clip", duration=DURATION, fps=FPS,
                                width=160, height=120, gate_hz=1.0)


def scripted_providers() -> Providers:
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
    landmarks = SyntheticLandmarks(fps=FPS, gate_hz=1.0)
    landmarks._poses = poses  # scripted pose track (reference V4 test style)
    landmarks.pose_batch = lambda crops, _p=poses: _p[
        np.arange(len(crops)) % len(_p)
    ]
    return Providers(
        llm=llm,
        search=search,
        clip=StubClip(default=0.3),
        asr=asr,
        ocr=ScriptedOCR([{"text": "BREAKING NEWS", "confidence": 0.9,
                          "bbox": [[0, 0], [50, 0], [50, 10], [0, 10]]}]),
        face_detector=SyntheticFaceDetector(),
        landmarks=landmarks,
    )
