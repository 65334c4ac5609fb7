"""LLM provider seam.

The reference calls GPT-4o in four nodes (V5 vision forensics, C2 gesture
fallback, C3 claim extraction, E2 reliability scoring) and degrades
gracefully without an API key.  The protocol here carries both modalities;
the Null implementation reproduces the no-key behavior exactly, and
ScriptedLLM reproduces the reference's canned-response test style
(e.g. ``tests/test_v5_texture_ela.py:57-92``).

An OpenAI-backed implementation can be plugged in where the environment has
credentials; it is intentionally import-gated so the framework has zero hard
network deps.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Protocol, Sequence


class LLMProvider(Protocol):
    def chat_json(self, system: str, prompt: str) -> Optional[Dict[str, Any]]:
        """JSON-mode chat completion; None on failure/unavailable."""
        ...

    def vision_json(
        self, system: str, prompt: str, images: Sequence[bytes]
    ) -> Optional[Dict[str, Any]]:
        """JSON-mode vision completion over JPEG byte images; None on
        failure/unavailable."""
        ...

    @property
    def available(self) -> bool: ...


class NullLLM:
    """No API key: every call returns None (reference no-key paths)."""

    available = False

    def chat_json(self, system: str, prompt: str) -> Optional[Dict[str, Any]]:
        return None

    def vision_json(self, system, prompt, images) -> Optional[Dict[str, Any]]:
        return None


class ScriptedLLM:
    """Deterministic canned responses for tests and hermetic benchmarks.

    ``responses`` maps a substring of the prompt to a response dict; first
    match wins.  ``default`` is returned when nothing matches; a queue can be
    provided instead for strictly ordered responses.
    """

    available = True

    def __init__(
        self,
        responses: Optional[Dict[str, Dict[str, Any]]] = None,
        queue: Optional[List[Dict[str, Any]]] = None,
        default: Optional[Dict[str, Any]] = None,
    ):
        self.responses = responses or {}
        self.queue = list(queue) if queue else None
        self.default = default
        self.calls: List[Dict[str, Any]] = []

    def _next(self, system: str, prompt: str) -> Optional[Dict[str, Any]]:
        self.calls.append({"system": system, "prompt": prompt})
        if self.queue is not None:
            return self.queue.pop(0) if self.queue else self.default
        for key, resp in self.responses.items():
            if key in prompt or key in system:
                return resp
        return self.default

    def chat_json(self, system: str, prompt: str) -> Optional[Dict[str, Any]]:
        return self._next(system, prompt)

    def vision_json(self, system, prompt, images) -> Optional[Dict[str, Any]]:
        return self._next(system, prompt)


class OpenAILLM:
    """OpenAI-backed implementation (gated on key + package availability).

    Mirrors the reference call shapes: JSON response format, temperature 0.1,
    gpt-4o (``c3_claim_extraction.py:56-65``, ``v5_texture_ela.py:102-125``).
    """

    def __init__(self, model: str = "gpt-4o", api_key: Optional[str] = None):
        self.model = model
        self._client = None
        key = api_key or os.getenv("OPENAI_API_KEY")
        if key:
            try:
                from openai import OpenAI  # type: ignore

                self._client = OpenAI(api_key=key)
            except Exception:
                self._client = None

    @property
    def available(self) -> bool:
        return self._client is not None

    def chat_json(self, system: str, prompt: str) -> Optional[Dict[str, Any]]:
        if not self._client:
            return None
        try:
            resp = self._client.chat.completions.create(
                model=self.model,
                messages=[
                    {"role": "system", "content": system},
                    {"role": "user", "content": prompt},
                ],
                temperature=0.1,
                response_format={"type": "json_object"},
                timeout=30.0,
            )
            content = resp.choices[0].message.content
            return json.loads(content) if content else None
        except Exception:
            return None

    def vision_json(self, system, prompt, images) -> Optional[Dict[str, Any]]:
        if not self._client:
            return None
        import base64

        try:
            content: List[Dict[str, Any]] = [{"type": "text", "text": prompt}]
            for img in images:
                b64 = base64.b64encode(img).decode()
                content.append(
                    {
                        "type": "image_url",
                        "image_url": {"url": f"data:image/jpeg;base64,{b64}"},
                    }
                )
            resp = self._client.chat.completions.create(
                model=self.model,
                messages=[
                    {"role": "system", "content": system},
                    {"role": "user", "content": content},
                ],
                response_format={"type": "json_object"},
                timeout=30.0,
            )
            body = resp.choices[0].message.content
            return json.loads(body) if body else None
        except Exception:
            return None
