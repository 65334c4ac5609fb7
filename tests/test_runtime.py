"""Runtime tests: DAG validation, scheduler semantics, status board.

The status-board cases mirror the reference's orchestration-logic test
(``tests/test_frontend_logic.py``) on the same toy graph.
"""

import threading
import time

import pytest

from fvd_tpu.runtime.dag import DAG, DAGError
from fvd_tpu.runtime.scheduler import NodeFailure, Scheduler
from fvd_tpu.runtime.status import StatusBoard
from fvd_tpu.state import State


def _noop(state):
    return {}


def test_dag_cycle_detection():
    dag = DAG()
    dag.add_node("A", _noop)
    dag.add_node("B", _noop, deps=["A"])
    dag.add_edge("B", "A")
    with pytest.raises(DAGError):
        dag.validate()


def test_dag_unknown_dep():
    dag = DAG()
    dag.add_node("A", _noop, deps=["missing"])
    with pytest.raises(DAGError):
        dag.validate()


def test_topological_order():
    dag = DAG()
    dag.add_node("IN", _noop)
    dag.add_node("A1", _noop, deps=["IN"])
    dag.add_node("V1", _noop, deps=["IN"])
    dag.add_node("C2", _noop, deps=["A1", "V1"])
    order = dag.topological_order()
    assert order.index("IN") < order.index("A1")
    assert order.index("A1") < order.index("C2")
    assert order.index("V1") < order.index("C2")


def test_scheduler_merges_last_writer_wins():
    dag = DAG()
    dag.add_node("IN", lambda s: {"transcript": "from-IN", "word_count": 1})
    dag.add_node("A", lambda s: {"transcript": "from-A"}, deps=["IN"])
    dag.add_node("B", lambda s: {"word_count": 42}, deps=["A"])
    final = Scheduler(dag).invoke(State(input_path="x"))
    assert final.transcript == "from-A"
    assert final.word_count == 42


def test_scheduler_parallel_branches_run_concurrently():
    barrier = threading.Barrier(2, timeout=10)

    def branch(key):
        def fn(state):
            barrier.wait()  # deadlocks unless both run simultaneously
            return {key: "done"}

        return fn

    dag = DAG()
    dag.add_node("IN", _noop)
    dag.add_node("L", branch("transcript"), deps=["IN"])
    dag.add_node("R", branch("data_dir"), deps=["IN"])
    final = Scheduler(dag, max_workers=4).invoke(State())
    assert final.transcript == "done" and final.data_dir == "done"


def test_scheduler_node_sees_parent_output():
    dag = DAG()
    dag.add_node("IN", lambda s: {"word_count": 7})
    dag.add_node("USE", lambda s: {"onset_count": s.word_count * 2}, deps=["IN"])
    final = Scheduler(dag).invoke(State())
    assert final.onset_count == 14


def test_scheduler_fail_fast_raises():
    def boom(state):
        raise RuntimeError("kaput")

    dag = DAG()
    dag.add_node("IN", _noop)
    dag.add_node("BAD", boom, deps=["IN"])
    dag.add_node("AFTER", _noop, deps=["BAD"])
    with pytest.raises(NodeFailure):
        Scheduler(dag).invoke(State())


def test_scheduler_fail_soft_skips_descendants():
    seen = []

    def boom(state):
        raise RuntimeError("kaput")

    def record(state):
        seen.append("ran")
        return {}

    dag = DAG()
    dag.add_node("IN", _noop)
    dag.add_node("BAD", boom, deps=["IN"])
    dag.add_node("CHILD", record, deps=["BAD"])
    dag.add_node("SIBLING", record, deps=["IN"])
    final = Scheduler(dag, fail_fast=False).invoke(State())
    assert seen == ["ran"]  # SIBLING ran, CHILD skipped
    assert isinstance(final, State)


def test_scheduler_stream_events():
    dag = DAG()
    dag.add_node("IN", lambda s: {"word_count": 1})
    dag.add_node("A", lambda s: {"word_count": 2}, deps=["IN"])
    events = list(Scheduler(dag).stream(State()))
    names = [(e.node, e.status) for e in events]
    assert ("IN", "running") in names and ("IN", "done") in names
    assert ("A", "done") in names
    final_ev = events[-1]
    assert final_ev.node == "__end__"
    assert final_ev.delta["__final_state__"].word_count == 2
    # IN must finish before A starts
    assert names.index(("IN", "done")) < names.index(("A", "running"))


def test_state_rejects_unknown_keys():
    dag = DAG()
    dag.add_node("IN", lambda s: {"not_a_field": 1})
    with pytest.raises(NodeFailure):
        Scheduler(dag).invoke(State())


# ---------------------------------------------------------------------------
# Status board — mirrors reference tests/test_frontend_logic.py on the same
# toy DAG and expectations.
# ---------------------------------------------------------------------------
TOY_EDGES = [("IN", "V1"), ("IN", "A1"), ("A1", "A2"), ("V1", "C2"), ("A2", "C2")]
TOY_ORDER = ["IN", "V1", "A1", "A2", "C2"]


def test_status_board_reference_semantics():
    board = StatusBoard(TOY_ORDER, TOY_EDGES)

    assert board.mark_done(["IN"]) == {"IN"}
    st = board.statuses()
    assert st["V1"] == "running" and st["A1"] == "running" and st["A2"] == "queued"

    assert board.mark_done(["V1"]) == {"V1"}
    st = board.statuses()
    assert st["V1"] == "done" and st["A1"] == "running" and st["C2"] == "queued"

    board.mark_done(["A1"])
    assert board.statuses()["A2"] == "running"


def test_status_board_defers_out_of_order_events():
    board = StatusBoard(TOY_ORDER, TOY_EDGES)
    # A2 completion arrives before A1 — must be deferred, not accepted.
    assert board.mark_done(["A2"]) == set()
    assert board.statuses()["A2"] == "queued"
    # Once IN and A1 arrive, the deferred A2 event is accepted too.
    accepted = board.mark_done(["IN", "A1"])
    assert accepted == {"IN", "A1", "A2"}
    assert board.statuses()["A2"] == "done"


def test_status_board_render():
    board = StatusBoard(TOY_ORDER, TOY_EDGES)
    board.mark_done(["IN"])
    lines = board.render_lines()
    assert lines[0] == "[x] IN"
    assert "[~] V1" in lines


def test_metadata_union_merge_across_parallel_branches():
    """metadata is union-merged: concurrent branches adding different keys
    must not clobber each other (the reference mutates one shared dict, so
    union is its effective semantics)."""
    dag = DAG()
    dag.add_node("IN", lambda s: {"metadata": {"duration": 5.0}})
    dag.add_node("A", lambda s: {"metadata": {**s.get("metadata", {}), "audio_sr": 16000}},
                 deps=["IN"])
    dag.add_node("B", lambda s: {"metadata": {**s.get("metadata", {}), "video_fps": 30.0}},
                 deps=["IN"])
    final = Scheduler(dag, max_workers=4).invoke(State())
    assert final.metadata == {"duration": 5.0, "audio_sr": 16000, "video_fps": 30.0}


def test_metadata_union_same_key_last_writer_wins():
    dag = DAG()
    dag.add_node("IN", lambda s: {"metadata": {"x": 1}})
    dag.add_node("A", lambda s: {"metadata": {"x": 2}}, deps=["IN"])
    final = Scheduler(dag).invoke(State())
    assert final.metadata == {"x": 2}


def test_non_metadata_fields_still_overwrite():
    s = State(claims=[{"a": 1}])
    s2 = s.apply({"claims": [{"b": 2}]})
    assert s2.claims == [{"b": 2}]


def test_conflict_detector_flags_concurrent_writers():
    dag = DAG()
    dag.add_node("IN", _noop)
    dag.add_node("A", lambda s: {"transcript": "a"}, deps=["IN"])
    dag.add_node("B", lambda s: {"transcript": "b"}, deps=["IN"])  # concurrent!
    sched = Scheduler(dag, detect_conflicts=True)
    sched.invoke(State())
    assert len(sched.conflicts) == 1
    assert "transcript" in sched.conflicts[0]


def test_conflict_detector_allows_ordered_writers():
    dag = DAG()
    dag.add_node("IN", lambda s: {"transcript": "in"})
    dag.add_node("A", lambda s: {"transcript": "a"}, deps=["IN"])  # ordered: fine
    sched = Scheduler(dag, detect_conflicts=True)
    sched.invoke(State())
    assert sched.conflicts == []


def test_conflict_detector_ignores_union_fields():
    dag = DAG()
    dag.add_node("IN", _noop)
    dag.add_node("A", lambda s: {"metadata": {"a": 1}}, deps=["IN"])
    dag.add_node("B", lambda s: {"metadata": {"b": 2}}, deps=["IN"])
    sched = Scheduler(dag, detect_conflicts=True)
    final = sched.invoke(State())
    assert sched.conflicts == []
    assert final.metadata == {"a": 1, "b": 2}


def test_full_graph_has_no_write_conflicts():
    """The real 16-node graph must be conflict-free under the detector."""
    import dataclasses

    from fvd_tpu.config import EvidenceConfig, default_config
    from fvd_tpu.graph import build_graph
    from fvd_tpu.synthetic import hermetic_providers, make_synthetic_video
    import os, tempfile

    cwd = os.getcwd()
    tmp = tempfile.mkdtemp()
    os.chdir(tmp)
    try:
        video = make_synthetic_video("m", duration=2.0, fps=10.0, width=96, height=72)
        cfg = dataclasses.replace(
            default_config(), evidence=EvidenceConfig(rate_limit_s=0.0, max_workers=2)
        )
        sched = Scheduler(build_graph(cfg, hermetic_providers(fps=10.0)),
                          detect_conflicts=True)
        sched.invoke(State(input_path=video))
        assert sched.conflicts == []
    finally:
        os.chdir(cwd)


def test_scheduler_scrubs_dead_viz_paths(tmp_path):
    """A viz path whose deferred encode never landed is nulled in the final
    state; one that exists on disk is preserved."""
    live = tmp_path / "landmarks_viz.mp4"
    live.write_bytes(b"x")
    dag = DAG()
    dag.add_node("V3", lambda s: {"mouth_landmarks_viz_path": str(live)})
    dag.add_node("V4", lambda s: {
        "headpose_viz_path": str(tmp_path / "never_written.mp4")})
    final = Scheduler(dag).invoke(State(input_path="x"))
    assert final.mouth_landmarks_viz_path == str(live)
    assert final.headpose_viz_path is None
