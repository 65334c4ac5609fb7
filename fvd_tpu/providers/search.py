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


class DuckDuckGoSearch:
    """Keyless DuckDuckGo backend (reference ``e1:304-319`` uses the ``ddgs``
    package; that package is absent here, so this talks to the public HTML
    endpoint directly and parses it with the stdlib parser — same position
    in the fallback chain, no extra dependency)."""

    ENDPOINT = "https://html.duckduckgo.com/html/"

    def search(self, query: str, max_results: int = 5) -> List[SearchResult]:
        import requests

        resp = requests.post(
            self.ENDPOINT,
            data={"q": query},
            headers={"User-Agent": "Mozilla/5.0 (fvd-tpu evidence fetcher)"},
            timeout=8,
        )
        resp.raise_for_status()
        return self.parse_html(resp.text)[:max_results]

    @staticmethod
    def parse_html(html: str) -> List[SearchResult]:
        """Extract (url, title, snippet) triples from a DDG html/ page."""
        from html.parser import HTMLParser

        class _P(HTMLParser):
            def __init__(self):
                super().__init__()
                self.results: List[SearchResult] = []
                self._mode: Optional[str] = None  # "title" | "snippet"
                self._href = ""
                self._text: List[str] = []

            def handle_starttag(self, tag, attrs):
                a = dict(attrs)
                cls = a.get("class", "")
                if tag == "a" and "result__a" in cls:
                    self._mode = "title"
                    self._href = a.get("href", "")
                    self._text = []
                elif tag == "a" and "result__snippet" in cls:
                    self._mode = "snippet"
                    self._text = []

            def handle_data(self, data):
                if self._mode:
                    self._text.append(data)

            def handle_endtag(self, tag):
                if tag != "a" or not self._mode:
                    return
                text = "".join(self._text).strip()
                if self._mode == "title":
                    url = DuckDuckGoSearch._unwrap_redirect(self._href)
                    self.results.append(make_result(url, text, "", "duckduckgo"))
                elif self._mode == "snippet" and self.results:
                    self.results[-1]["snippet"] = text
                self._mode = None

        p = _P()
        p.feed(html)
        return [r for r in p.results if r["url"]]

    @staticmethod
    def _unwrap_redirect(href: str) -> str:
        """DDG links via //duckduckgo.com/l/?uddg=<urlencoded target>."""
        from urllib.parse import parse_qs, unquote, urlparse

        if "uddg=" in href:
            qs = parse_qs(urlparse(href).query)
            target = qs.get("uddg", [""])[0]
            if target:
                return unquote(target)
        return href


class CachedSearch:
    """Disk-backed cross-process query cache around any backend.

    The reference declares Redis (``pyproject.toml:23``, E-nodes README) but
    ships only an in-memory per-run dict (``e1:190-191,356-362``).  This is
    the shared-cache capability done host-side: one JSON file per query
    under ``cache_dir`` (atomic rename writes, so concurrent batch workers
    can share it), with a TTL.  E1's in-run dict still sits above this.
    """

    def __init__(self, backend: SearchProvider, cache_dir: str,
                 ttl_s: float = 7 * 24 * 3600.0):
        self.backend = backend
        self.cache_dir = cache_dir
        self.ttl_s = ttl_s
        os.makedirs(cache_dir, exist_ok=True)

    def _path(self, query: str, max_results: int) -> str:
        import hashlib

        key = hashlib.sha1(f"{max_results}|{query}".encode()).hexdigest()
        return os.path.join(self.cache_dir, f"{key}.json")

    def search(self, query: str, max_results: int = 5) -> List[SearchResult]:
        import json
        import time

        path = self._path(query, max_results)
        try:
            with open(path) as f:
                entry = json.load(f)
            if time.time() - entry["t"] <= self.ttl_s:
                return entry["results"]
        except (OSError, ValueError, KeyError):
            pass
        results = self.backend.search(query, max_results)
        if results:  # only cache hits; misses may be transient backend state
            tmp = f"{path}.tmp.{os.getpid()}"
            try:
                with open(tmp, "w") as f:
                    json.dump({"t": time.time(), "query": query,
                               "results": results}, f)
                os.replace(tmp, path)
            except OSError:
                pass
        return results


def default_chain() -> SearchProvider:
    """Serper -> Google CSE -> DuckDuckGo (the reference chain, e1:220-261),
    optionally wrapped in the shared disk cache when FVD_SEARCH_CACHE_DIR is
    set."""
    chain: SearchProvider = ChainSearch(
        [SerperSearch(), GoogleCSESearch(), DuckDuckGoSearch()])
    cache_dir = os.environ.get("FVD_SEARCH_CACHE_DIR")
    if cache_dir:
        chain = CachedSearch(chain, cache_dir)
    return chain
