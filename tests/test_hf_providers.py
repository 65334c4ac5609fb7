"""Weight-compatible HF Flax providers, exercised with random-init configs
(no downloads; the same code paths serve real checkpoints)."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from fvd_tpu.providers import hf_models


@pytest.fixture(scope="module")
def tiny_bert():
    from transformers import BertConfig, FlaxBertModel

    config = BertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
    )
    model = FlaxBertModel(config, seed=0)

    def tokenize(texts):
        ids = np.zeros((len(texts), 16), np.int32)
        mask = np.zeros((len(texts), 16), np.int32)
        for i, t in enumerate(texts):
            toks = [hash(w) % 99 + 1 for w in t.split()][:16]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return {"input_ids": ids, "attention_mask": mask}

    return hf_models.HFTextEncoder(model, tokenize)


def test_hf_text_encoder_shapes_and_determinism(tiny_bert):
    vecs = tiny_bert.encode_batch(["hello world", "hello world", "other text"])
    assert vecs.shape == (3, 32)
    np.testing.assert_allclose(vecs[0], vecs[1], atol=1e-6)
    assert not np.allclose(vecs[0], vecs[2])


def test_hf_text_encoder_mean_pooling_masks_padding(tiny_bert):
    # same tokens, different padding lengths -> same embedding
    def tok_a(texts):
        return {"input_ids": np.array([[5, 7, 0, 0]], np.int32),
                "attention_mask": np.array([[1, 1, 0, 0]], np.int32)}

    def tok_b(texts):
        return {"input_ids": np.array([[5, 7, 0, 0, 0, 0, 0, 0]], np.int32),
                "attention_mask": np.array([[1, 1, 0, 0, 0, 0, 0, 0]], np.int32)}

    enc_a = hf_models.HFTextEncoder(tiny_bert.model, tok_a)
    enc_b = hf_models.HFTextEncoder(tiny_bert.model, tok_b)
    np.testing.assert_allclose(enc_a.encode("x"), enc_b.encode("x"), atol=1e-5)


def test_hf_clip_similarity():
    from transformers import CLIPConfig, CLIPTextConfig, CLIPVisionConfig, FlaxCLIPModel

    config = CLIPConfig.from_text_vision_configs(
        CLIPTextConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=64,
                       max_position_embeddings=16, projection_dim=32),
        CLIPVisionConfig(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=64, image_size=64, patch_size=16,
                         projection_dim=32),
        projection_dim=32,
    )
    model = FlaxCLIPModel(config, seed=0)

    def tokenize(texts):
        ids = np.zeros((len(texts), 16), np.int32)
        mask = np.ones((len(texts), 16), np.int32)
        for i, t in enumerate(texts):
            toks = [hash(w) % 99 + 1 for w in t.split()][:16]
            ids[i, : len(toks)] = toks
        return {"input_ids": ids, "attention_mask": mask}

    clip = hf_models.HFClip(model, tokenize)
    img = np.random.RandomState(0).randint(0, 255, (48, 80, 3)).astype(np.uint8)
    s1 = clip.image_text_similarity(img, "a face on screen")
    s2 = clip.image_text_similarity(img, "a face on screen")
    assert -1.0 <= s1 <= 1.0
    assert s1 == pytest.approx(s2)
    assert clip.image_text_similarity(img, "different words entirely") != pytest.approx(s1)


def test_hf_clip_calibration_affine_and_identity():
    """cal_offset/cal_scale (the JaxClip band convention, carried in
    fvd_train_meta.json for first-party-trained checkpoints) must be an
    exact affine map on the similarity outputs, and the default (genuine
    weights: no meta) the identity."""
    from transformers import CLIPConfig, CLIPTextConfig, CLIPVisionConfig, FlaxCLIPModel

    config = CLIPConfig.from_text_vision_configs(
        CLIPTextConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=64,
                       max_position_embeddings=16, projection_dim=32),
        CLIPVisionConfig(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=64, image_size=64, patch_size=16,
                         projection_dim=32),
        projection_dim=32,
    )
    model = FlaxCLIPModel(config, seed=0)

    def tokenize(texts):
        ids = np.zeros((len(texts), 16), np.int32)
        mask = np.ones((len(texts), 16), np.int32)
        for i, t in enumerate(texts):
            toks = [hash(w) % 99 + 1 for w in t.split()][:16]
            ids[i, : len(toks)] = toks
        return {"input_ids": ids, "attention_mask": mask}

    raw = hf_models.HFClip(model, tokenize)
    cal = hf_models.HFClip(model, tokenize, cal_offset=-0.2, cal_scale=0.5)
    img = np.random.RandomState(1).randint(0, 255, (48, 80, 3)).astype(np.uint8)
    s_raw = raw.image_text_similarity(img, "a face on screen")
    s_cal = cal.image_text_similarity(img, "a face on screen")
    assert s_cal == pytest.approx((s_raw + 0.2) * 0.5, abs=1e-6)


def test_hf_whisper_transcribe_shapes(tmp_path):
    from transformers import FlaxWhisperForConditionalGeneration, WhisperConfig

    config = WhisperConfig(
        vocab_size=120, num_mel_bins=80, d_model=32,
        encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=150, max_target_positions=64,
        decoder_start_token_id=1, eos_token_id=2, pad_token_id=0,
        bos_token_id=3, suppress_tokens=[], begin_suppress_tokens=[],
        forced_decoder_ids=None,
    )
    model = FlaxWhisperForConditionalGeneration(config, seed=0)

    def decode_ids(ids):
        return " ".join(str(i) for i in ids if i > 3)

    from fvd_tpu.utils.wav import write_wav

    path = str(tmp_path / "a.wav")
    write_wav(path, np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1, 16000)

    asr = hf_models.HFWhisperASR(model, processor=None, decode_ids=decode_ids,
                                 chunk_s=1.0)
    result = asr.transcribe(path)
    assert result is not None
    assert "text" in result and "segments" in result
