"""Pluggable host-side providers.

The reference talks to five external services (YouTube via yt-dlp, OpenAI,
Serper, Google CSE, DuckDuckGo) plus heavyweight local models (Whisper,
EasyOCR, CLIP, MiniLM, SSD, FAN, SixDRepNet) through hard imports scattered
across nodes.  Its tests then ``unittest.mock.patch`` every one of them
(SURVEY.md §4.2).

Here the seams are explicit: every external capability is a small protocol
with (a) a production implementation where the environment allows, and
(b) a deterministic Null/Scripted implementation used by default in hermetic
runs — nodes behave exactly like the reference does with no API key / no
model available.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from fvd_tpu.providers.llm import LLMProvider, NullLLM, ScriptedLLM  # noqa: F401
from fvd_tpu.providers.search import (  # noqa: F401
    NullSearch,
    SearchProvider,
    StaticSearch,
)
from fvd_tpu.providers.encoders import (  # noqa: F401
    ClipProvider,
    HashingTextEncoder,
    StubClip,
    TextEncoder,
)
from fvd_tpu.providers.asr import ASRProvider, NullASR, ScriptedASR  # noqa: F401
from fvd_tpu.providers.vision import (  # noqa: F401
    FaceDetectorProvider,
    LandmarkProvider,
    NullOCR,
    OCRProvider,
    ScriptedLandmarks,
    ScriptedOCR,
)


@dataclass
class Providers:
    """The full provider bundle a pipeline run uses."""

    llm: LLMProvider = field(default_factory=NullLLM)
    search: SearchProvider = field(default_factory=NullSearch)
    text_encoder: TextEncoder = field(default_factory=HashingTextEncoder)
    clip: ClipProvider = field(default_factory=StubClip)
    asr: ASRProvider = field(default_factory=NullASR)
    ocr: OCRProvider = field(default_factory=NullOCR)
    face_detector: Optional[FaceDetectorProvider] = None
    landmarks: Optional[LandmarkProvider] = None


_default: Providers = Providers()
_default_is_custom: bool = False


def get_providers() -> Providers:
    return _default


def providers_installed() -> bool:
    """True once set_providers() has replaced the inert default bundle."""
    return _default_is_custom


def set_providers(providers: Providers) -> Providers:
    global _default, _default_is_custom
    _default = providers
    _default_is_custom = True
    return _default
