"""Recorded LLM/search fixture providers (providers/recorded.py).

The reference exercises its claim/evidence pipeline by mocking the OpenAI
and search seams in tests (test_c3_openai_primary.py:13-37); the recorded
providers are this framework's deterministic equivalent, so the bench and
demo paths run the full C3 -> E1 -> E2 -> E3 + V5 logic hermetically.
"""

import dataclasses

from fvd_tpu.config import EvidenceConfig, default_config
from fvd_tpu.providers import Providers
from fvd_tpu.providers.recorded import RecordedLLM, RecordedSearch


def _c3_prompt(transcript, ocr=""):
    return (
        "You are a fact-checking assistant. Extract verifiable factual "
        "claims from the following text sources.\n\n"
        f"TRANSCRIPT:\n{transcript}\n\n"
        f"ON-SCREEN TEXT (OCR):\n{ocr}\n\n"
        "Instructions:\n1. Identify specific, factual claims"
    )


def test_recorded_llm_claim_extraction():
    llm = RecordedLLM()
    out = llm.chat_json("", _c3_prompt("the mayor said the city will cut taxes"))
    assert out is not None and out["claims"], out
    assert "mayor" in out["claims"][0]
    # deterministic
    assert out == llm.chat_json("", _c3_prompt("the mayor said the city will cut taxes"))
    # unknown contract -> None (the node's no-result path)
    assert llm.chat_json("", "write a poem") is None


def test_recorded_llm_reliability_and_vision():
    llm = RecordedLLM()
    r = llm.chat_json("", "evaluating source reliability.\n- Domain: reuters.com\n")
    assert r is not None and 0.9 <= r["score"] <= 1.0
    blog = llm.chat_json("", "evaluating source reliability.\n- Domain: someblog.biz\n")
    assert 0.0 <= blog["score"] <= 0.8

    v = llm.vision_json("return fake_probability", "Analyze.", [b"crop-bytes"])
    assert set(v) == {"fake_probability", "reasoning"}
    assert 0.0 <= v["fake_probability"] <= 1.0
    assert v == llm.vision_json("return fake_probability", "Analyze.", [b"crop-bytes"])
    c = llm.vision_json("", "Return JSON with 'consistent' (bool) and 'reason'.", [b"img"])
    assert isinstance(c["consistent"], bool)


def test_recorded_search_schema_and_claim_scoped_urls():
    s = RecordedSearch()
    claim = "the river level rose two feet"
    a = s.search(f"{claim} fact check")
    b = s.search(f"proof that {claim}")
    assert a and b
    for r in a:
        assert {"url", "title", "snippet", "source", "date", "relevance_score"} <= set(r)
    # variant queries about the same claim surface overlapping article URLs
    # (so E1's dedup has real work to do)
    assert {r["url"] for r in a} & {r["url"] for r in b}
    # a different claim surfaces different articles
    c = s.search("the museum opened a wing fact check")
    assert {r["url"] for r in a} != {r["url"] for r in c}
    assert a == s.search(f"{claim} fact check")  # deterministic


def test_claim_chain_end_to_end_with_recorded_services(tmp_cwd):
    """C3 -> E1 -> E2 -> E3 on a transcript-bearing state: claims extracted,
    evidence retrieved/deduped/ranked, reliability scored, verdicts banded."""
    from fvd_tpu.nodes import c3_claims, e1_evidence, e2_reliability, e3_scorer
    from fvd_tpu.state import State, merge_states

    providers = Providers(llm=RecordedLLM(), search=RecordedSearch())
    config = dataclasses.replace(
        default_config(), evidence=EvidenceConfig(rate_limit_s=0.0, max_workers=2)
    )
    state = State(transcript="the state added nine thousand jobs in july")
    for node in (c3_claims, e1_evidence, e2_reliability):
        state = merge_states(state, node.run(state, config, providers))
    state = merge_states(state, e3_scorer.run(state, config))

    claims = state.get("claims")
    assert claims
    evidence = state.get("evidence")
    assert evidence
    assert all("reliability_score" in e for e in evidence)
    # E3 rewrites claims with {evidence_score, verdict, evidence_count}
    assert all(c.get("verdict") and c.get("verdict") != "Unverified" for c in claims)
    assert all(0.0 < c["evidence_score"] <= 1.0 for c in claims)
