"""Single-node repro harness (reference ``debug_c3.py`` / ``reproduce_e2.py``
role, generalized).

Re-runs ONE node against a saved run directory: the state is reconstructed
from the per-node debug artifacts plus whatever JSON you provide, so a
failing node can be iterated on without re-running the pipeline.

    python tools/repro_node.py C1 --data-dir processed/video_XXX \
        --state-json extra_state.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fvd_tpu.config import default_config
from fvd_tpu.state import State

NODE_MODULES = {
    "IN": "fvd_tpu.nodes.ingest",
    "A1": "fvd_tpu.nodes.a1_standardize",
    "A2": "fvd_tpu.nodes.a2_asr",
    "A3": "fvd_tpu.nodes.a3_onsets",
    "V1": "fvd_tpu.nodes.v1_faces",
    "V2": "fvd_tpu.nodes.v2_ocr",
    "V3": "fvd_tpu.nodes.v3_landmarks",
    "V4": "fvd_tpu.nodes.v4_dynamics",
    "V5": "fvd_tpu.nodes.v5_forensics",
    "C1": "fvd_tpu.nodes.c1_lipsync",
    "C2": "fvd_tpu.nodes.c2_gesture",
    "C3": "fvd_tpu.nodes.c3_claims",
    "E1": "fvd_tpu.nodes.e1_evidence",
    "E2": "fvd_tpu.nodes.e2_reliability",
    "E3": "fvd_tpu.nodes.e3_scorer",
    "LR": "fvd_tpu.nodes.lr_fusion",
}


def main() -> int:
    ap = argparse.ArgumentParser(description="Re-run one node in isolation")
    ap.add_argument("node", choices=sorted(NODE_MODULES))
    ap.add_argument("--data-dir", help="processed/video_XXX run directory")
    ap.add_argument("--state-json", help="JSON file with extra state fields")
    ap.add_argument("--debug", action="store_true")
    args = ap.parse_args()

    state_dict = {"debug": args.debug}
    if args.data_dir:
        state_dict["data_dir"] = args.data_dir
    if args.state_json:
        with open(args.state_json) as f:
            state_dict.update(json.load(f))
    state = State.from_dict(state_dict)

    import importlib

    module = importlib.import_module(NODE_MODULES[args.node])
    delta = module.run(state, config=default_config().replace(debug=args.debug))

    from fvd_tpu.runtime.io_pool import flush_artifacts

    for err in flush_artifacts(None):  # nodes may defer viz writes
        print(f"WARNING: deferred artifact write failed: {err}")

    def show(v):
        s = repr(v)
        return s if len(s) < 300 else s[:300] + f"... ({len(s)} chars)"

    print(f"\n=== {args.node} delta ===")
    for k, v in (delta or {}).items():
        print(f"{k}: {show(v)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
