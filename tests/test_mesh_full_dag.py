"""FULL-DAG multi-device equivalence.

The production multi-chip configuration (bench.py:128-135) is the whole
16-node graph with the DP inference mesh installed AND the cross-video
coalescer active.  This test runs that exact combination on the 8-virtual-
device CPU mesh and asserts the fused probability equals the single-device
run (<= 1e-3, the vmapped-group tolerance) — the reference's single-device
graph semantics (main.py:292-343) must survive sharding untouched.
"""

import dataclasses
import os

import pytest

CKPT_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "checkpoints"))
HAS_CKPTS = all(
    os.path.exists(os.path.join(CKPT_DIR, f))
    for f in ("face_ssd.npz", "landmarks.npz", "pose.npz")
)


@pytest.mark.skipif(not HAS_CKPTS, reason="no trained vision checkpoints")
def test_full_dag_mesh_equals_single_device(tmp_cwd):
    import jax

    from fvd_tpu.config import EvidenceConfig, default_config
    from fvd_tpu.graph import build_graph
    from fvd_tpu.parallel.inference import set_inference_mesh
    from fvd_tpu.parallel.mesh import make_mesh
    from fvd_tpu.providers.coalesce import coalesce_providers
    from fvd_tpu.providers.factory import asr_speech_domain, production_providers
    from fvd_tpu.runtime.scheduler import Scheduler
    from fvd_tpu.state import State
    from fvd_tpu.synthetic import make_face_video

    n = len(jax.devices())
    assert n >= 2, "conftest provisions 8 virtual devices"

    video = make_face_video(
        "media", name="meshdag", duration=4.0, fps=10.0, width=320,
        height=240, seed=11, speech_text="the new bridge opened to traffic",
        speech_renderer=asr_speech_domain(CKPT_DIR))
    cfg = dataclasses.replace(
        default_config(),
        evidence=EvidenceConfig(rate_limit_s=0.0, max_workers=2))

    def run_dag(mesh):
        prev = set_inference_mesh(mesh)
        provs, close = coalesce_providers(production_providers(
            checkpoint_dir=CKPT_DIR, recorded_services=True))
        try:
            final = Scheduler(build_graph(cfg, provs)).invoke(
                State(input_path=video))
            return float(final.fake_probability), dict(final.features)
        finally:
            close()
            set_inference_mesh(prev)

    p_single, f_single = run_dag(None)
    p_mesh, f_mesh = run_dag(make_mesh(n_data=n, n_time=1))

    assert 0.0 < p_single < 1.0
    assert abs(p_single - p_mesh) <= 1e-3, (p_single, p_mesh)
    for k, v in f_single.items():
        assert f_mesh[k] == pytest.approx(v, abs=2e-3), (k, v, f_mesh[k])
