"""Full-graph integration test: synthetic video through all 16 nodes.

The analog of the reference's manual batch harness run (SURVEY §4.8), but
hermetic: synthetic media + scripted providers, executed through the real
scheduler and the real DAG.
"""

import json
import os

import numpy as np
import pytest

from fvd_tpu.config import EvidenceConfig, default_config
from fvd_tpu.graph import NODE_ORDER, build_graph
from fvd_tpu.runtime.scheduler import Scheduler
from fvd_tpu.runtime.status import StatusBoard
from fvd_tpu.state import State
from tests.fixtures_synthetic import make_video_with_audio, scripted_providers

import dataclasses


@pytest.fixture(scope="module")
def pipeline_result(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    os.chdir(tmp)  # nodes write cwd-relative artifacts
    video = make_video_with_audio(str(tmp / "media"))

    config = dataclasses.replace(
        default_config(),
        evidence=EvidenceConfig(rate_limit_s=0.0, max_workers=2),
    )
    dag = build_graph(config, scripted_providers())
    events = []
    final = None
    for ev in Scheduler(dag).stream(State(input_path=video, debug=False)):
        events.append(ev)
        if ev.node == "__end__":
            assert ev.status == "done", ev.error
            final = ev.delta["__final_state__"]
    return final, events, tmp


def test_all_nodes_completed(pipeline_result):
    final, events, _ = pipeline_result
    done = {e.node for e in events if e.status == "done" and e.node != "__end__"}
    assert done == set(NODE_ORDER)


def test_event_stream_is_dependency_consistent(pipeline_result):
    """Every completion event must arrive with all parents already done —
    feed the real event stream through the StatusBoard (reference
    app.py:260-267 invariant)."""
    _, events, _ = pipeline_result
    dag_edges = build_graph().edges()
    board = StatusBoard(NODE_ORDER, dag_edges)
    for ev in events:
        if ev.status == "done" and ev.node != "__end__":
            assert board.mark_done([ev.node]) == {ev.node}


def test_final_probability_and_features(pipeline_result):
    final, _, _ = pipeline_result
    assert 0.0 < final.fake_probability < 1.0
    feats = final.features
    assert set(feats) == {
        "speech_rate", "pause_ratio", "lip_sync", "gesture_score", "blink_rate",
        "headpose_jerk", "texture", "claim_reliability", "evidence_reliability",
    }
    # signal-bearing features are nonzero with the scripted providers
    assert feats["speech_rate"] > 0
    assert feats["pause_ratio"] > 0
    assert feats["lip_sync"] > 0          # mouth gate == audio gate
    assert feats["gesture_score"] == 1.0  # CLIP stub always Consistent
    assert feats["blink_rate"] > 0
    assert feats["texture"] == pytest.approx(0.3)  # scripted vision LLM
    assert feats["claim_reliability"] > 0
    assert feats["evidence_reliability"] == pytest.approx(0.85)  # scripted LLM score


def test_artifacts_written(pipeline_result):
    final, _, tmp = pipeline_result
    ddir = final.data_dir
    assert os.path.exists(os.path.join(ddir, "audio.wav"))
    assert os.path.exists(os.path.join(ddir, "audio_16k.wav"))
    assert os.path.exists(os.path.join(ddir, "landmarks_viz.mp4"))
    assert os.path.exists(os.path.join(ddir, "headpose_viz.mp4"))
    assert os.path.isdir(os.path.join(ddir, "keyframes"))
    assert os.path.isdir(os.path.join(ddir, "faces"))
    assert os.path.isdir(os.path.join(ddir, "ela_analysis"))
    # per-node debug artifacts + master log (LR recovery contract)
    for node in ["IN", "A1", "A3", "V1", "V3", "V4", "V5", "C1", "C2", "C3", "E1", "E2", "E3", "LR"]:
        assert os.path.exists(os.path.join(ddir, f"{node}_debug.json")), node
    assert os.path.exists(os.path.join(ddir, "debug_log.txt"))
    # feature cache
    assert os.path.exists("features/clip.mp4.json")
    with open("features/clip.mp4.json") as f:
        assert json.load(f) == final.features


def test_evidence_and_claims_flow(pipeline_result):
    final, _, _ = pipeline_result
    assert final.claims, "claims should survive E3 enrichment"
    claim = final.claims[0]
    assert claim["evidence_score"] > 0
    assert claim["verdict"] in {"Highly Likely", "Likely", "Possible", "Unverified"}
    assert final.evidence
    for ev_item in final.evidence:
        assert "reliability_score" in ev_item
        assert ev_item["claim_id"] == claim["id"]


def test_keyframes_and_detections(pipeline_result):
    final, _, _ = pipeline_result
    assert len(final.keyframes) == 6  # 6s at 1 keyframe/sec
    for det in final.face_detections:
        assert det["faces"], "the synthetic face should be found in every keyframe"
        main = det["faces"][0]
        assert main["is_main"]
        assert main["confidence"] >= 0.5
