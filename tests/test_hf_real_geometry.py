"""Real-GEOMETRY proof of the HF weight drop-in path.

The reference's real-world capability rests on pretrained checkpoints it
auto-downloads (Whisper base `a2_vad_asr.py:27-30`, CLIP ViT-B/32
`c2_gesture_narration_check.py:49-54`, MiniLM-L6 `e1_web_evidence.py:334-347`).
No network here excuses missing *weights*, not missing *geometry*: this
module fabricates the exact model configs with random init + working
tokenizers at the real vocabulary sizes
(tools/make_hf_geometry_checkpoints.py — same artifact layout as
tools/import_hf_weights.py), then proves factory precedence, tokenizer /
feature-extractor plumbing, provider forwards, and the FULL 16-node
pipeline all survive at real shapes.  Genuine weights drop over these
directories unchanged.
"""

import dataclasses
import os
import wave

import numpy as np
import pytest

pytest.importorskip("transformers")

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
CKPT_DIR = os.path.join(REPO, "checkpoints")
HAS_VISION_CKPTS = all(
    os.path.exists(os.path.join(CKPT_DIR, f))
    for f in ("face_ssd.npz", "landmarks.npz", "pose.npz")
)


@pytest.fixture(scope="module")
def hf_checkpoint_dir(tmp_path_factory):
    """A checkpoint dir with fabricated full-geometry hf/{minilm,clip,whisper}
    plus links to the first-party trained vision checkpoints, mirroring a
    production checkout after `tools/import_hf_weights.py` ran."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_hf_geometry_checkpoints import make_all

    root = tmp_path_factory.mktemp("hf_geom")
    make_all(str(root / "hf"))
    for f in os.listdir(CKPT_DIR):
        if f.endswith((".npz", ".json")):
            os.symlink(os.path.join(CKPT_DIR, f), str(root / f))
    return str(root)


@pytest.fixture(scope="module")
def hf_providers(hf_checkpoint_dir):
    from fvd_tpu.providers.factory import production_providers

    return production_providers(checkpoint_dir=hf_checkpoint_dir,
                                recorded_services=True)


def test_factory_precedence_picks_hf_at_real_geometry(hf_providers):
    """providers/factory.py:149-169: the hf/ directory takes precedence over
    the first-party models for the three reference-lineup roles."""
    assert type(hf_providers.asr).__name__ == "HFWhisperASR"
    assert type(hf_providers.clip).__name__ == "HFClip"
    assert type(hf_providers.text_encoder).__name__ == "HFTextEncoder"


def test_minilm_geometry(hf_providers):
    enc = hf_providers.text_encoder
    # MiniLM-L6-v2 hidden size is 384; vocab 30522
    vecs = enc.encode_batch(["the river rose two feet", "taxes were cut",
                             "the river rose two feet"])
    assert vecs.shape == (3, 384)
    assert np.all(np.isfinite(vecs))
    np.testing.assert_allclose(vecs[0], vecs[2], atol=1e-5)
    enc_max = int(np.max(enc.tokenize(["hello world unseen-token xyzzy"])
                         ["input_ids"]))
    assert enc_max < 30522


def test_clip_geometry(hf_providers):
    clip = hf_providers.clip
    assert clip.image_size == 224  # ViT-B/32 input
    img = np.random.RandomState(0).randint(0, 255, (180, 240, 3), np.uint8)
    sim = clip.image_text_similarity(img, "a person speaking on camera")
    assert np.isfinite(sim) and -1.0 <= sim <= 1.0
    sims = clip.image_text_similarity_batch([img, img], ["a", "b"])
    assert sims.shape == (2,) and np.all(np.isfinite(sims))


def test_whisper_geometry_transcribe_schema(hf_providers, tmp_path):
    asr = hf_providers.asr
    # whisper-base geometry reaches the provider
    assert asr.model.config.d_model == 512
    assert asr.model.config.vocab_size == 51865
    sr = 16000
    tt = np.arange(2 * sr) / sr
    wav = (0.2 * np.sin(2 * np.pi * 220 * tt)).astype(np.float32)
    path = str(tmp_path / "a.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((wav * 32767).astype(np.int16).tobytes())
    out = asr.transcribe(path)
    # random weights produce garbage TEXT; the schema contract must hold
    assert out is not None and set(out) >= {"text", "segments"}
    for seg in out["segments"]:
        assert set(seg) >= {"start", "end", "text"}
        assert 0.0 <= seg["start"] < seg["end"] <= 2.0 + 1e-6


@pytest.mark.skipif(not HAS_VISION_CKPTS, reason="no trained vision checkpoints")
def test_full_pipeline_with_hf_providers(hf_providers, tmp_cwd):
    """The whole 16-node DAG with the HF providers active at real geometry:
    A2 transcribes through Flax Whisper, C2 scores through Flax CLIP, E1
    reranks through Flax BERT — schemas and fusion must survive."""
    from fvd_tpu.config import EvidenceConfig, default_config
    from fvd_tpu.graph import NODE_ORDER, build_graph
    from fvd_tpu.runtime.scheduler import Scheduler
    from fvd_tpu.state import State
    from fvd_tpu.synthetic import make_face_video

    video = make_face_video("media", name="hfgeom", duration=4.0, fps=10.0,
                            width=320, height=240, seed=3)
    cfg = dataclasses.replace(
        default_config(),
        evidence=EvidenceConfig(rate_limit_s=0.0, max_workers=2))
    events = []
    final = None
    for ev in Scheduler(build_graph(cfg, hf_providers)).stream(
            State(input_path=video)):
        events.append(ev)
        if ev.node == "__end__":
            assert ev.status == "done", ev.error
            final = ev.delta["__final_state__"]
    done = {e.node for e in events if e.status == "done" and e.node != "__end__"}
    assert done == set(NODE_ORDER)
    assert 0.0 < final.fake_probability < 1.0
    assert final.metadata.get("transcription_model") == "hf_whisper_flax"
