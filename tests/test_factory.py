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
