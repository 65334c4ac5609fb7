"""DDG backend parsing + shared disk cache (reference e1:220-319 analogs)."""

import json
import os

from fvd_tpu.providers.search import (
    CachedSearch,
    ChainSearch,
    DuckDuckGoSearch,
    FailingSearch,
    StaticSearch,
    make_result,
)

DDG_HTML = """
<html><body>
<div class="result">
  <a class="result__a" href="//duckduckgo.com/l/?uddg=https%3A%2F%2Fexample.com%2Ffact%2Dcheck&amp;rut=abc">Moon landing fact check</a>
  <a class="result__snippet" href="//duckduckgo.com/l/?uddg=https%3A%2F%2Fexample.com%2Ffact%2Dcheck">The claim was <b>verified</b> by experts.</a>
</div>
<div class="result">
  <a class="result__a" href="https://news.example.org/story">Plain link result</a>
</div>
</body></html>
"""


def test_ddg_parse_unwraps_redirects_and_snippets():
    results = DuckDuckGoSearch.parse_html(DDG_HTML)
    assert len(results) == 2
    assert results[0]["url"] == "https://example.com/fact-check"
    assert results[0]["title"] == "Moon landing fact check"
    assert "verified by experts" in results[0]["snippet"]
    assert results[0]["source"] == "duckduckgo"
    assert results[1]["url"] == "https://news.example.org/story"
    assert results[1]["snippet"] == ""


def test_ddg_sits_last_in_fallback_chain(monkeypatch):
    ddg = DuckDuckGoSearch()
    monkeypatch.setattr(
        ddg, "search", lambda q, max_results=5: [make_result("https://d.dg/x", "hit")]
    )
    chain = ChainSearch([FailingSearch(), FailingSearch(), ddg])
    out = chain.search("anything")
    assert out and out[0]["url"] == "https://d.dg/x"


def test_cached_search_hits_disk_not_backend(tmp_path):
    backend = StaticSearch({"cats": [make_result("https://a/", "A")]})
    cached = CachedSearch(backend, str(tmp_path))
    assert cached.search("cats on mars")[0]["url"] == "https://a/"
    assert len(backend.queries) == 1
    # second identical query served from disk
    assert cached.search("cats on mars")[0]["url"] == "https://a/"
    assert len(backend.queries) == 1
    # a DIFFERENT process sharing the dir sees the entry too
    other = CachedSearch(StaticSearch({}), str(tmp_path))
    assert other.search("cats on mars")[0]["url"] == "https://a/"


def test_cached_search_expires_and_skips_empty(tmp_path):
    backend = StaticSearch({"q1": [make_result("https://b/", "B")]})
    cached = CachedSearch(backend, str(tmp_path), ttl_s=0.0)
    cached.search("q1")
    cached.search("q1")  # TTL 0: every lookup refetches
    assert len(backend.queries) == 2
    # empty results are never persisted
    cached.search("nohit")
    assert not [p for p in os.listdir(tmp_path) if "tmp" in p]
    files = sorted(os.listdir(tmp_path))
    for fn in files:
        entry = json.load(open(os.path.join(tmp_path, fn)))
        assert entry["results"], "cache must not store empty result sets"
