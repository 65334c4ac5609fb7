"""The 16-node analysis DAG.

Wiring matches the reference exactly (``main.py:316-341``):

    IN -> A1 -> {A2, A3};  IN -> V1 -> {V2, V3, V4, V5, C2}
    A3, V3 -> C1;  A2 -> C2;  A2, V2 -> C3
    C3 -> E1 -> E2 -> E3
    A2, C1, C2, V4, V5, E3 -> LR

(The reference Streamlit display adds C3->E3 / E1->E3 and drops A2->LR —
a display-only divergence SURVEY §3.2 flags; we wire the real graph.)
"""

from __future__ import annotations

from functools import partial
from typing import Optional

from fvd_tpu.config import Config, default_config
from fvd_tpu.nodes import (
    a1_standardize,
    a2_asr,
    a3_onsets,
    c1_lipsync,
    c2_gesture,
    c3_claims,
    e1_evidence,
    e2_reliability,
    e3_scorer,
    ingest,
    lr_fusion,
    v1_faces,
    v2_ocr,
    v3_landmarks,
    v4_dynamics,
    v5_forensics,
)
from fvd_tpu.providers import Providers, get_providers
from fvd_tpu.runtime.dag import DAG

#: Display order for status boards (reference app.py node list).
NODE_ORDER = [
    "IN", "A1", "V1", "A2", "A3", "V2", "V3", "V4", "V5",
    "C1", "C2", "C3", "E1", "E2", "E3", "LR",
]


def build_graph(
    config: Optional[Config] = None, providers: Optional[Providers] = None
) -> DAG:
    cfg = config or default_config()
    prov = providers or get_providers()

    def with_prov(fn):
        return partial(fn, config=cfg, providers=prov)

    def with_cfg(fn):
        return partial(fn, config=cfg)

    dag = DAG()
    dag.add_node("IN", with_cfg(ingest.run), host_only=True)
    dag.add_node("A1", with_cfg(a1_standardize.run), deps=["IN"])
    dag.add_node("V1", with_prov(v1_faces.run), deps=["IN"])
    dag.add_node("A2", with_prov(a2_asr.run), deps=["A1"])
    dag.add_node("A3", with_cfg(a3_onsets.run), deps=["A1"])
    dag.add_node("V2", with_prov(v2_ocr.run), deps=["V1"])
    dag.add_node("V3", with_prov(v3_landmarks.run), deps=["V1"])
    dag.add_node("V4", with_prov(v4_dynamics.run), deps=["V1"])
    dag.add_node("V5", with_prov(v5_forensics.run), deps=["V1"])
    dag.add_node("C1", with_cfg(c1_lipsync.run), deps=["A3", "V3"])
    dag.add_node("C2", with_prov(c2_gesture.run), deps=["A2", "V1"])
    dag.add_node("C3", with_prov(c3_claims.run), deps=["A2", "V2"], host_only=True)
    dag.add_node("E1", with_prov(e1_evidence.run), deps=["C3"], host_only=True)
    dag.add_node("E2", with_prov(e2_reliability.run), deps=["E1"], host_only=True)
    dag.add_node("E3", with_cfg(e3_scorer.run), deps=["E2"])
    dag.add_node("LR", with_cfg(lr_fusion.run), deps=["A2", "C1", "C2", "V4", "V5", "E3"])
    return dag.validate()
