"""Web-search provider seam.

The reference's E1 node implements a Serper -> Google CSE -> DuckDuckGo
fallback chain with an HTTP retry adapter (``e1_web_evidence.py:220-319``).
Here each backend is one provider and the chain itself is a provider
(``ChainSearch``), so the fallback behavior is testable exactly like the
reference's ``tests/test_e1_robustness.py:57-77`` without monkeypatching.

Result schema matches the reference ``EvidenceResult`` TypedDict
(``e1:34-41``): url, title, snippet, source, date, relevance_score.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Protocol

SearchResult = Dict[str, Any]


def make_result(
    url: str,
    title: str = "",
    snippet: str = "",
    source: str = "stub",
    date: Optional[str] = None,
) -> SearchResult:
    return {
        "url": url,
        "title": title,
        "snippet": snippet,
        "source": source,
        "date": date,
        "relevance_score": 0.0,
    }


class SearchProvider(Protocol):
    def search(self, query: str, max_results: int = 5) -> List[SearchResult]: ...


class NullSearch:
    """No network: every query returns no results."""

    def search(self, query: str, max_results: int = 5) -> List[SearchResult]:
        return []


class StaticSearch:
    """Deterministic results from a mapping (substring match on query)."""

    def __init__(self, mapping: Dict[str, List[SearchResult]], default: Optional[List[SearchResult]] = None):
        self.mapping = mapping
        self.default = default or []
        self.queries: List[str] = []

    def search(self, query: str, max_results: int = 5) -> List[SearchResult]:
        self.queries.append(query)
        for key, results in self.mapping.items():
            if key in query:
                return results[:max_results]
        return self.default[:max_results]


class FailingSearch:
    """Always raises — for exercising the fallback chain in tests."""

    def __init__(self, exc: Exception = RuntimeError("search backend down")):
        self.exc = exc
        self.calls = 0

    def search(self, query: str, max_results: int = 5) -> List[SearchResult]:
        self.calls += 1
        raise self.exc


class ChainSearch:
    """Try providers in order; first non-empty result wins; failures fall
    through (the reference's search_robust, e1:220-261)."""

    def __init__(self, providers: List[SearchProvider]):
        self.providers = providers

    def search(self, query: str, max_results: int = 5) -> List[SearchResult]:
        for p in self.providers:
            try:
                results = p.search(query, max_results)
            except Exception:
                continue
            if results:
                return results
        return []


class SerperSearch:
    """Serper.dev backend (gated on key; reference e1:263-282)."""

    def __init__(self, api_key: Optional[str] = None):
        self.api_key = api_key or os.environ.get("SERPER_API_KEY")

    def search(self, query: str, max_results: int = 5) -> List[SearchResult]:
        if not self.api_key:
            return []
        import json

        import requests

        resp = requests.post(
            "https://google.serper.dev/search",
            headers={"X-API-KEY": self.api_key, "Content-Type": "application/json"},
            data=json.dumps({"q": query, "num": max_results}),
            timeout=5,
        )
        resp.raise_for_status()
        return [
            make_result(
                item.get("link", ""),
                item.get("title", ""),
                item.get("snippet", ""),
                "serper",
                item.get("date"),
            )
            for item in resp.json().get("organic", [])
        ]


class GoogleCSESearch:
    """Google Custom Search backend (reference e1:284-302)."""

    def __init__(self, api_key: Optional[str] = None, cx: Optional[str] = None):
        self.api_key = api_key or os.environ.get("GOOGLE_API_KEY")
        self.cx = cx or os.environ.get("GOOGLE_CX")

    def search(self, query: str, max_results: int = 5) -> List[SearchResult]:
        if not (self.api_key and self.cx):
            return []
        import requests

        resp = requests.get(
            "https://www.googleapis.com/customsearch/v1",
            params={"key": self.api_key, "cx": self.cx, "q": query, "num": max_results},
            timeout=5,
        )
        resp.raise_for_status()
        return [
            make_result(
                item.get("link", ""), item.get("title", ""), item.get("snippet", ""), "google"
            )
            for item in resp.json().get("items", [])
        ]


def default_chain() -> SearchProvider:
    """Serper -> Google -> nothing (DDG requires an extra package; slot in a
    backend here when available)."""
    return ChainSearch([SerperSearch(), GoogleCSESearch()])
