"""E1/E2/E3 tests — ports the reference's golden arithmetic and fallback
behavior (``tests/test_e2_reliability.py``, ``tests/test_e3_scorer.py``,
``tests/test_e1_robustness.py``).
"""

import dataclasses

import pytest

from fvd_tpu.config import EvidenceConfig, default_config
from fvd_tpu.nodes import e1_evidence, e2_reliability, e3_scorer
from fvd_tpu.providers import Providers, ScriptedLLM, StaticSearch
from fvd_tpu.providers.search import ChainSearch, FailingSearch, make_result
from fvd_tpu.state import State

FAST_CFG = dataclasses.replace(
    default_config(), evidence=EvidenceConfig(rate_limit_s=0.0, max_workers=2)
)

TRUSTED = {"high_trust": ["trusted.com"], "medium_trust": ["semi-trusted.com"]}


# ---------------------------------------------------------------------------
# E2 golden arithmetic (reference tests/test_e2_reliability.py:29-44)
# ---------------------------------------------------------------------------
def test_get_domain():
    assert e2_reliability.get_domain("https://www.example.com/page") == "example.com"
    assert e2_reliability.get_domain("http://sub.domain.org") == "sub.domain.org"
    assert e2_reliability.get_domain("invalid-url") == ""


@pytest.mark.parametrize(
    "url,expected",
    [
        ("https://unknown.com", 0.6),           # base 0.5 + https 0.1
        ("https://usa.gov", 1.0),               # 0.5+0.4+0.1 capped
        ("https://www.trusted.com/news", 0.9),  # 0.5+0.3+0.1
        ("http://semi-trusted.com", 0.6),       # 0.5+0.1 (no https)
    ],
)
def test_heuristic_golden_values(url, expected):
    result = e2_reliability.heuristic_reliability(url, TRUSTED, consensus_count=0)
    assert result["score"] == pytest.approx(expected)


def test_heuristic_consensus_boost():
    # reference :92-107 — unknown https + consensus of 3 domains -> 0.7
    result = e2_reliability.heuristic_reliability(
        "https://unknown.com", TRUSTED, consensus_count=3
    )
    assert result["score"] == pytest.approx(0.7)


def test_heuristic_edu_and_subdomain_trust():
    assert e2_reliability.heuristic_reliability("https://mit.edu", TRUSTED, 0)["score"] == pytest.approx(0.9)
    # subdomain of a trusted domain counts (endswith '.' + trusted)
    assert e2_reliability.heuristic_reliability(
        "https://news.trusted.com", TRUSTED, 0
    )["score"] == pytest.approx(0.9)


def test_e2_about_page_probe_enabled():
    """The +0.1 about-page bonus with the probe ENABLED, against a local
    http.server (reference e2_source_reliability.py:96-104 always probes;
    here it is config-gated for the no-network sandbox — this exercises the
    enabled path)."""
    import http.server
    import threading

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/about":
                self.send_response(200)
                self.send_header("Content-Length", "2")
                self.end_headers()
                self.wfile.write(b"ok")
            else:
                self.send_error(404)

        def log_message(self, *args):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        cfg = dataclasses.replace(
            FAST_CFG,
            evidence=dataclasses.replace(
                FAST_CFG.evidence, enable_about_page_probe=True
            ),
        )
        # direct probe helper
        assert e2_reliability.check_about_page(base + "/article") is True
        # heuristic arithmetic: base 0.5 (http, unknown) + about 0.1
        r = e2_reliability.heuristic_reliability(
            base + "/article", TRUSTED, 0, config=cfg, probe_about=True)
        assert r["score"] == pytest.approx(0.6)
        assert any("About page" in d for d in r["details"])
        # full node path with the probe config-enabled (NullLLM -> heuristic)
        state = State(evidence=[
            {"url": base + "/article", "claim_text": "c", "snippet": ""}])
        delta = e2_reliability.run(state, cfg, Providers())
        assert delta["evidence"][0]["reliability_score"] == pytest.approx(0.6)
    finally:
        srv.shutdown()
        srv.server_close()


def test_e2_about_page_probe_missing_page():
    """No /about -> no bonus, probe failure swallowed (reference e2:96-104)."""
    import http.server
    import threading

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_error(404)

        def log_message(self, *args):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        assert e2_reliability.check_about_page(base + "/x") is False
        r = e2_reliability.heuristic_reliability(
            base + "/x", TRUSTED, 0, probe_about=True)
        assert r["score"] == pytest.approx(0.5)
    finally:
        srv.shutdown()
        srv.server_close()


def test_e2_llm_primary_path():
    llm = ScriptedLLM(default={"score": 0.85, "reason": "reputable"})
    providers = Providers(llm=llm)
    state = State(evidence=[{"url": "https://x.com", "claim_text": "c", "snippet": "s"}])
    delta = e2_reliability.run(state, FAST_CFG, providers)
    assert delta["evidence"][0]["reliability_score"] == pytest.approx(0.85)
    assert "LLM" in delta["evidence"][0]["reliability_details"][0]


def test_e2_llm_failure_falls_back_to_heuristic():
    # LLM available but returns garbage -> heuristic (reference :74-89)
    llm = ScriptedLLM(default={"nonsense": True})
    providers = Providers(llm=llm)
    state = State(evidence=[{"url": "https://unknown.com", "claim_text": "c", "snippet": ""}])
    delta = e2_reliability.run(state, FAST_CFG, providers)
    assert delta["evidence"][0]["reliability_score"] == pytest.approx(0.6)


def test_e2_llm_score_clamped():
    llm = ScriptedLLM(default={"score": 1.7, "reason": "overenthusiastic"})
    providers = Providers(llm=llm)
    state = State(evidence=[{"url": "https://x.com", "claim_text": "c"}])
    delta = e2_reliability.run(state, FAST_CFG, providers)
    assert delta["evidence"][0]["reliability_score"] == 1.0


def test_e2_no_evidence_noop():
    assert e2_reliability.run(State(), FAST_CFG, Providers()) == {}


def test_e2_missing_url_scores_zero():
    state = State(evidence=[{"claim_text": "c"}])
    delta = e2_reliability.run(state, FAST_CFG, Providers())
    assert delta["evidence"][0]["reliability_score"] == 0.0


# ---------------------------------------------------------------------------
# E3 verdict bands + aggregation (reference tests/test_e3_scorer.py)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "score,verdict",
    [(0.71, "Highly Likely"), (0.7, "Likely"), (0.41, "Likely"),
     (0.4, "Possible"), (0.21, "Possible"), (0.2, "Unverified"), (0.0, "Unverified")],
)
def test_verdict_bands(score, verdict):
    assert e3_scorer.get_verdict(score) == verdict


def test_e3_averages_matched_evidence():
    state = State(
        claims=[{"id": "c1", "claim_text": "the sky is blue"}],
        evidence=[
            {"claim_id": "c1", "claim_text": "the sky is blue", "reliability_score": 0.8},
            {"claim_id": "c1", "claim_text": "the sky is blue", "reliability_score": 0.6},
        ],
    )
    delta = e3_scorer.run(state)
    claim = delta["claims"][0]
    assert claim["evidence_score"] == pytest.approx(0.7)
    assert claim["verdict"] == "Likely"
    assert claim["evidence_count"] == 2


def test_e3_loose_substring_match():
    state = State(
        claims=[{"claim_text": "sky is blue"}],
        evidence=[{"claim_text": "scientists say the SKY IS BLUE today",
                   "reliability_score": 0.9}],
    )
    delta = e3_scorer.run(state)
    assert delta["claims"][0]["evidence_score"] == pytest.approx(0.9)


def test_e3_unmatched_claim_gets_half_global_average():
    state = State(
        claims=[{"claim_text": "completely unrelated"}],
        evidence=[{"claim_text": "other", "reliability_score": 0.8}],
    )
    delta = e3_scorer.run(state)
    assert delta["claims"][0]["evidence_score"] == pytest.approx(0.4)
    assert delta["claims"][0]["evidence_count"] == 1  # falls back to len(evidence)


def test_e3_string_claims_normalized():
    state = State(claims=["a plain string claim"], evidence=[])
    delta = e3_scorer.run(state)
    assert delta["claims"][0]["text"] == "a plain string claim"
    assert delta["claims"][0]["verdict"] == "Unverified"


def test_e3_no_claims_noop():
    assert e3_scorer.run(State(evidence=[{"reliability_score": 1.0}])) == {}


# ---------------------------------------------------------------------------
# E1 query construction / dedup / ranking / fallback chain
# ---------------------------------------------------------------------------
def test_construct_queries_seven_variants():
    claim = {"id": "x", "claim_text": "cats rule", "who": None, "what": None,
             "when": None, "where": None}
    queries = e1_evidence.construct_queries(claim)
    assert len(queries) == 7
    assert "cats rule fact check" in queries
    assert "cats rule debunked" in queries
    assert "proof that cats rule" in queries


def test_construct_queries_entity_variant():
    claim = {"id": "x", "claim_text": "c", "who": "elon", "what": "crypto scam",
             "when": None, "where": None}
    queries = e1_evidence.construct_queries(claim)
    assert "elon crypto scam controversy" in queries
    assert len(queries) == 8


def test_e1_dedup_and_rank():
    results = [
        make_result("https://a.com", "moon landing happened", "apollo 11 moon landing"),
        make_result("https://a.com", "dup", "dup"),
        make_result("https://b.com", "cooking pasta", "boil water for pasta"),
    ]
    deduped = e1_evidence.deduplicate(results)
    assert len(deduped) == 2
    ranked = e1_evidence.rank_results(deduped, "moon landing", Providers())
    assert ranked[0]["url"] == "https://a.com"
    assert ranked[0]["relevance_score"] > ranked[1]["relevance_score"]


def test_e1_end_to_end_flattening():
    search = StaticSearch({"fact check": [make_result("https://bbc.com/x", "t", "s")]})
    providers = Providers(search=search)
    state = State(claims=["the earth is round"])
    delta = e1_evidence.run(state, FAST_CFG, providers)
    assert delta["claims"][0]["id"]  # uuid assigned
    assert delta["evidence"]
    item = delta["evidence"][0]
    assert item["claim_id"] == delta["claims"][0]["id"]
    assert item["claim_text"] == "the earth is round"
    assert len(item["query_variants"]) == 7
    assert "retrieval_timestamp" in item


def test_e1_fallback_chain():
    """First two backends raise -> third serves (reference
    tests/test_e1_robustness.py:57-77)."""
    good = StaticSearch({}, default=[make_result("https://c.com", "t", "s")])
    chain = ChainSearch([FailingSearch(), FailingSearch(), good])
    results = chain.search("anything")
    assert results[0]["url"] == "https://c.com"


def test_e1_no_claims_noop():
    assert e1_evidence.run(State(), FAST_CFG, Providers()) == {}


def test_e1_preserves_existing_claim_ids():
    state = State(claims=[{"id": "keep-me", "claim_text": "x"}])
    delta = e1_evidence.run(state, FAST_CFG, Providers())
    assert delta["claims"][0]["id"] == "keep-me"
