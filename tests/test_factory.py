"""Provider factory + production pipeline smoke test."""

import dataclasses
import os

import pytest

from fvd_tpu.config import EvidenceConfig, default_config
from fvd_tpu.graph import build_graph
from fvd_tpu.providers.factory import production_providers
from fvd_tpu.runtime.scheduler import Scheduler
from fvd_tpu.state import State
from fvd_tpu.synthetic import make_synthetic_video

CHECKPOINT_DIR = os.path.join(os.path.dirname(__file__), "..", "checkpoints")


def test_factory_builds_without_checkpoints(tmp_path):
    prov = production_providers(checkpoint_dir=str(tmp_path / "none"),
                                use_llm=False, use_search=False)
    assert prov.face_detector is not None
    assert prov.landmarks is not None
    assert not prov.llm.available


@pytest.mark.skipif(
    not os.path.exists(os.path.join(CHECKPOINT_DIR, "face_ssd.npz")),
    reason="trained checkpoints not present",
)
def test_production_pipeline_end_to_end(tmp_cwd):
    """Full pipeline with the real trained models (no scripted vision)."""
    video = make_synthetic_video("media", duration=2.0, fps=10.0,
                                 width=160, height=120)
    prov = production_providers(checkpoint_dir=os.path.abspath(CHECKPOINT_DIR),
                                use_llm=False, use_search=False)
    cfg = dataclasses.replace(
        default_config(), evidence=EvidenceConfig(rate_limit_s=0.0, max_workers=2)
    )
    final = Scheduler(build_graph(cfg, prov)).invoke(State(input_path=video))
    assert final.fake_probability is not None
    assert 0.0 <= final.fake_probability <= 1.0
    assert set(final.features) == {
        "speech_rate", "pause_ratio", "lip_sync", "gesture_score", "blink_rate",
        "headpose_jerk", "texture", "claim_reliability", "evidence_reliability",
    }


@pytest.mark.skipif(
    not os.path.exists(os.path.join(CHECKPOINT_DIR, "ocr_rec.npz")),
    reason="trained OCR checkpoints not present",
)
def test_trained_ocr_reads_rendered_text():
    import cv2
    import numpy as np

    from fvd_tpu.providers.factory import _build_ocr

    ocr = _build_ocr(
        os.path.join(CHECKPOINT_DIR, "ocr_det.npz"),
        os.path.join(CHECKPOINT_DIR, "ocr_rec.npz"),
    )
    img = (np.random.RandomState(0).rand(256, 256, 3) * 80).astype(np.uint8)
    img = cv2.blur(img, (5, 5))
    cv2.putText(img, "MOON LANDING 1969", (20, 100),
                cv2.FONT_HERSHEY_SIMPLEX, 0.7, (230, 230, 230), 2)
    out = ocr.read_text(img)
    assert out, "trained OCR found no text regions"
    texts = [d["text"] for d in out]
    assert any("MOON" in t and "1969" in t for t in texts), texts


def test_factory_without_clip_checkpoint_disables_c2(tmp_path):
    from fvd_tpu.nodes import c2_gesture
    from fvd_tpu.providers.encoders import HashingTextEncoder

    prov = production_providers(checkpoint_dir=str(tmp_path / "none"),
                                use_llm=False, use_search=False)
    # no trained CLIP -> C2 skips (reference model-load-failure behavior)
    assert prov.clip is None
    delta = c2_gesture.run(
        State(keyframes=["x.jpg"], segments=[{"start": 0, "end": 1, "text": "t"}],
              metadata={"video_fps": 30.0}),
        providers=prov,
    )
    assert delta == {}
    # evidence ranking uses the lexical hashing encoder, not random weights
    assert isinstance(prov.text_encoder, HashingTextEncoder)


def test_factory_loads_text_encoder_sidecar_dims(tmp_path):
    """text_encoder.npz + json sidecar -> JaxTextEncoder at the trained
    dims (not the class defaults)."""
    import json

    import jax
    import jax.numpy as jnp

    from fvd_tpu.models import encoders

    ckdir = tmp_path / "ck"
    ckdir.mkdir()
    model = encoders.TextTower(dim=32, depth=1, out_dim=16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, encoders.MAX_TEXT_LEN), jnp.int32))
    encoders.save_params(str(ckdir / "text_encoder.npz"), params)
    (ckdir / "text_encoder.json").write_text(
        json.dumps({"dim": 32, "depth": 1, "out_dim": 16}))
    prov = production_providers(checkpoint_dir=str(ckdir),
                                use_llm=False, use_search=False)
    assert isinstance(prov.text_encoder, encoders.JaxTextEncoder)
    assert prov.text_encoder.encode("a claim").shape == (16,)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(CHECKPOINT_DIR, "text_encoder.npz")),
    reason="trained text encoder not present",
)
def test_trained_text_encoder_ranks_paraphrase_first():
    """The shipped encoder must put coverage of the SAME fact above
    same-shaped coverage of a different fact (E1's ranking contract,
    reference e1_web_evidence.py:330-354)."""
    from fvd_tpu.nodes.e1_evidence import rank_results
    from fvd_tpu.providers import Providers
    from fvd_tpu.providers.factory import production_providers

    prov = production_providers(checkpoint_dir=CHECKPOINT_DIR,
                                use_llm=False, use_search=False)
    cases = [
        ("the mayor of riverton said the city will cut property taxes by ten percent",
         "Fact check: riverton mayor announces 10% property tax reduction",
         "Fact check: lakeside governor announces 10% transit fare increase"),
        ("the bear river rose five feet overnight",
         "Reality Check: water levels on the bear river climbed by 5 feet",
         "Reality Check: harbor steel plans to cut 5 jobs in summit"),
    ]
    for claim, same_fact, other_fact in cases:
        results = [
            {"title": other_fact, "snippet": "", "url": "https://a.com/1"},
            {"title": same_fact, "snippet": "", "url": "https://b.com/2"},
        ]
        ranked = rank_results(results, claim, prov)
        assert ranked[0]["url"] == "https://b.com/2", (
            claim, [r.get("relevance_score") for r in ranked])
