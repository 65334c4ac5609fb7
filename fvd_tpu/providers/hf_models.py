"""Weight-compatible model providers on transformers' Flax classes.

The reference's exact model lineup — MiniLM-L6-v2 (E1 ranking), CLIP
ViT-B/32 (C2), Whisper base (A2) — exists as Flax architectures inside the
installed ``transformers`` package.  These providers make the framework
*weight-compatible with the reference's checkpoints*: point them at a local
HF checkpoint directory (``tools/import_hf_weights.py``) and the pipeline
runs the genuine models as single jitted TPU forwards; no torch at runtime.

This environment has no network and no cached checkpoints, so the default
providers remain the first-party trainable models (fvd_tpu.models); these
classes are exercised hermetically with random-init configs in tests.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import numpy as np


def available() -> bool:
    try:
        import transformers  # noqa: F401

        return True
    except ImportError:
        return False


# ---------------------------------------------------------------------------
# MiniLM-class sentence encoder (FlaxBertModel + mean pooling)
# ---------------------------------------------------------------------------
class HFTextEncoder:
    """TextEncoder protocol over a BERT-family Flax encoder.

    ``tokenize(texts) -> {input_ids, attention_mask}`` is injectable so the
    provider works with any HF tokenizer or a test stub.
    """

    def __init__(self, model, tokenize: Callable[[List[str]], Dict[str, np.ndarray]],
                 max_len: int = 128):
        import jax

        self.model = model
        self.tokenize = tokenize
        self.max_len = max_len

        def forward(params, input_ids, attention_mask):
            out = self.model.module.apply(
                {"params": params}, input_ids, attention_mask,
                deterministic=True,
            )
            hidden = out.last_hidden_state
            mask = attention_mask[..., None].astype(hidden.dtype)
            # sentence-transformers mean pooling (reference e1 ranking model)
            summed = (hidden * mask).sum(axis=1)
            counts = mask.sum(axis=1).clip(1e-9)
            return summed / counts

        self._forward = jax.jit(forward)

    @classmethod
    def from_local(cls, path: str, max_len: int = 128) -> "HFTextEncoder":
        from transformers import AutoTokenizer, FlaxAutoModel

        tok = AutoTokenizer.from_pretrained(path)
        model = FlaxAutoModel.from_pretrained(path)

        def tokenize(texts):
            enc = tok(texts, padding="max_length", truncation=True,
                      max_length=max_len, return_tensors="np")
            return {"input_ids": enc["input_ids"],
                    "attention_mask": enc["attention_mask"]}

        return cls(model, tokenize, max_len)

    def encode(self, text: str) -> np.ndarray:
        return self.encode_batch([text])[0]

    def encode_batch(self, texts: List[str]) -> np.ndarray:
        enc = self.tokenize(texts)
        out = self._forward(self.model.params, enc["input_ids"], enc["attention_mask"])
        return np.asarray(out)


# ---------------------------------------------------------------------------
# CLIP (FlaxCLIPModel)
# ---------------------------------------------------------------------------
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class HFClip:
    """ClipProvider protocol over FlaxCLIPModel (CLIP ViT-B/32 role).

    ``cal_offset``/``cal_scale`` linearly map a first-party-trained
    checkpoint's cosine range onto the reference CLIP's (whose 0.25/0.15
    C2 thresholds the node inherits) — the same convention as
    models/encoders.JaxClip, computed at train time on the held-out pool
    (tools/pretrain_hf_clip.py) and stored in ``fvd_train_meta.json``.
    Genuine OpenAI weights carry no meta and stay at the identity map."""

    #: device-forward provider: eligible for cross-video coalescing
    coalescable = True

    def __init__(self, model, tokenize: Callable[[List[str]], Dict[str, np.ndarray]],
                 image_size: Optional[int] = None,
                 cal_offset: float = 0.0, cal_scale: float = 1.0):
        import jax

        self.model = model
        self.tokenize = tokenize
        self.cal_offset, self.cal_scale = float(cal_offset), float(cal_scale)
        self.image_size = image_size or model.config.vision_config.image_size

        def similarity(params, pixel_values, input_ids, attention_mask):
            import jax.numpy as jnp

            position_ids = jnp.broadcast_to(
                jnp.arange(input_ids.shape[-1])[None, :], input_ids.shape
            )
            out = self.model.module.apply(
                {"params": params},
                input_ids=input_ids,
                pixel_values=pixel_values,
                attention_mask=attention_mask,
                position_ids=position_ids,
                deterministic=True,
            )
            ie = out.image_embeds / np.float32(1.0)
            te = out.text_embeds
            ie = ie / (jax.numpy.linalg.norm(ie, axis=-1, keepdims=True) + 1e-8)
            te = te / (jax.numpy.linalg.norm(te, axis=-1, keepdims=True) + 1e-8)
            return (ie * te).sum(axis=-1)

        self._similarity = jax.jit(similarity)

    @classmethod
    def from_local(cls, path: str) -> "HFClip":
        import json
        import os

        from transformers import AutoTokenizer, FlaxCLIPModel

        tok = AutoTokenizer.from_pretrained(path)
        model = FlaxCLIPModel.from_pretrained(path)

        def tokenize(texts):
            enc = tok(texts, padding="max_length", truncation=True,
                      max_length=model.config.text_config.max_position_embeddings,
                      return_tensors="np")
            return {"input_ids": enc["input_ids"],
                    "attention_mask": enc["attention_mask"]}

        cal = {}
        meta_path = os.path.join(path, "fvd_train_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            cal = {"cal_offset": float(meta.get("cal_offset", 0.0)),
                   "cal_scale": float(meta.get("cal_scale", 1.0))}
        return cls(model, tokenize, **cal)

    def _preprocess(self, image: np.ndarray) -> np.ndarray:
        import cv2

        s = self.image_size
        img = cv2.resize(image, (s, s)).astype(np.float32) / 255.0
        img = (img - CLIP_MEAN) / CLIP_STD
        # NHWC: flax conv layout (the HF wrapper transposes NCHW itself, but
        # we call module.apply directly)
        return img[None]

    def _calibrate(self, sim: np.ndarray) -> np.ndarray:
        if self.cal_scale == 1.0 and self.cal_offset == 0.0:
            return sim
        return (sim - self.cal_offset) * self.cal_scale

    def image_text_similarity(self, image: np.ndarray, text: str) -> float:
        return float(self.image_text_similarity_batch([image], [text])[0])

    def image_text_similarity_batch(self, images, texts) -> np.ndarray:
        """Paired cosines for the whole keyframe set in one forward."""
        enc = self.tokenize(list(texts))
        pixels = np.concatenate([self._preprocess(im) for im in images])
        sim = self._similarity(
            self.model.params, pixels, enc["input_ids"], enc["attention_mask"]
        )
        return self._calibrate(np.asarray(sim))


# ---------------------------------------------------------------------------
# Whisper (FlaxWhisperForConditionalGeneration)
# ---------------------------------------------------------------------------
class HFWhisperASR:
    """ASRProvider protocol over Flax Whisper (A2's openai-whisper role)."""

    model_name = "hf_whisper_flax"

    def __init__(self, model, processor=None, decode_ids=None, chunk_s: float = 30.0,
                 max_new_tokens: int = 320):
        self.model = model
        self.processor = processor
        self._decode_ids = decode_ids
        self.chunk_s = chunk_s
        self.max_new_tokens = max_new_tokens
        # whisper's host-side mel frontend costs ~5.6 s per 30 s clip on
        # this 1-core host; when the checkpoint uses the standard whisper
        # frontend geometry the extractor's own slaney filter bank runs
        # through the jitted device frontend instead (<1e-5 from the host
        # path, tests/test_whisper_frontend.py)
        # HF's Flax generate runs its greedy loop EAGERLY: one device
        # dispatch per decoder step (x max_new_tokens=320) and params
        # re-uploaded from host numpy — measured ~12 s/video through the
        # tunnel (bench r4 span node/A2).  Jitting the whole generate
        # compiles the loop to ONE lax.while_loop dispatch per 30 s window
        # and pins the params on device once.
        self._gen_cache: dict = {}
        self._dev_params = None
        self._mel_filters = None
        fe = getattr(processor, "feature_extractor", None)
        if (fe is not None and getattr(fe, "sampling_rate", None) == 16000
                and getattr(fe, "hop_length", None) == 160
                and getattr(fe, "n_fft", None) == 400):
            self._mel_filters = np.ascontiguousarray(
                fe.mel_filters, np.float32)  # [201, 80]

    @classmethod
    def from_local(cls, path: str) -> "HFWhisperASR":
        from transformers import FlaxWhisperForConditionalGeneration, WhisperProcessor

        processor = WhisperProcessor.from_pretrained(path)
        model = FlaxWhisperForConditionalGeneration.from_pretrained(path)
        return cls(model, processor=processor)

    def _features(self, audio: np.ndarray, sr: int) -> np.ndarray:
        if self._mel_filters is not None and sr == 16000:
            import jax.numpy as jnp

            from fvd_tpu.ops.whisper_frontend import whisper_log_mel

            feats = whisper_log_mel(
                jnp.asarray(audio, jnp.float32), jnp.asarray(self._mel_filters))
            return np.asarray(feats)[None]
        if self.processor is not None:
            return self.processor(
                audio, sampling_rate=sr, return_tensors="np"
            ).input_features
        # hermetic fallback: our own log-mel frontend shaped to the model
        import jax.numpy as jnp

        from fvd_tpu.models.asr import log_mel

        mel = np.asarray(log_mel(jnp.asarray(audio, jnp.float32), sr))
        n_mels = self.model.config.num_mel_bins
        T = self.model.config.max_source_positions * 2
        out = np.zeros((1, n_mels, T), np.float32)
        t = min(mel.shape[0], T)
        m = min(mel.shape[1], n_mels)
        out[0, :m, :t] = mel[:t, :m].T
        return out

    def _generate(self, feats) -> np.ndarray:
        """Greedy decode of one feature window as a single compiled device
        program (jit per feats shape; params device-resident)."""
        import jax
        import jax.numpy as jnp

        max_len = min(self.max_new_tokens, self.model.config.max_target_positions)
        key = (tuple(feats.shape), max_len)
        fn = self._gen_cache.get(key)
        if fn is None:
            if self._dev_params is None:
                self._dev_params = jax.device_put(self.model.params)

            def gen(f, p):
                return self.model.generate(f, params=p,
                                           max_length=max_len).sequences

            fn = jax.jit(gen)
            self._gen_cache[key] = fn
        return np.asarray(fn(jnp.asarray(feats), self._dev_params))

    def transcribe(self, audio_path: str, audio=None) -> Optional[Dict[str, Any]]:
        from fvd_tpu.utils.wav import read_wav, to_mono

        sr = 16000
        if audio is None:
            try:
                samples, sr = read_wav(audio_path)
            except Exception:
                return None
            audio = to_mono(samples)
        else:
            import numpy as _np

            audio = _np.asarray(audio)
        chunk = int(self.chunk_s * sr)
        segments: List[dict] = []
        texts: List[str] = []
        for start in range(0, max(len(audio), 1), chunk):
            piece = audio[start : start + chunk]
            if len(piece) == 0:
                break
            feats = self._features(piece, sr)
            # dense 30 s windows transcribe to ~1 token/char on the
            # fabricated byte-level vocabulary — 128 would truncate
            ids = self._generate(feats)
            if self.processor is not None:
                text = self.processor.batch_decode(ids, skip_special_tokens=True)[0].strip()
            elif self._decode_ids is not None:
                text = self._decode_ids(np.asarray(ids[0]))
            else:
                text = ""
            t0, t1 = start / sr, min(start + chunk, len(audio)) / sr
            if text:
                segments.append({"start": t0, "end": t1, "text": text})
                texts.append(text)
        return {"text": " ".join(texts), "segments": segments}
