"""Whisper-style ASR encoder-decoder.

Role (SURVEY §2.4): openai-whisper base in A2 (``a2_vad_asr.py:27-30``).
Retrained-equivalent architecture: log-mel frontend (the device kernels from
fvd_tpu.ops.spectral), conv-subsampled transformer encoder, causal
transformer decoder with cross-attention over a byte-level vocabulary, and a
greedy decode loop as ``lax.while_loop`` — the whole transcription is one
compiled program per audio-length bucket.

A converted Whisper checkpoint can be dropped in via load_params; random
init otherwise (the provider stays honest: it reports its model name and
the A2 node records it in metadata).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fvd_tpu.models.transformer import ByteTokenizer, MHABlock, sincos_positions

N_MELS = 80
MAX_AUDIO_FRAMES = 1024   # mel frames after hop (~10.2 s at 16 kHz/160 hop)
MAX_TOKENS = 128
HOP = 160                  # 10 ms at 16 kHz
N_FFT = 400


class AsrEncoder(nn.Module):
    dim: int = 192
    depth: int = 4
    heads: int = 0  # 0 -> dim // 32

    @nn.compact
    def __call__(self, mel):  # [B, T, 80]
        x = nn.Conv(self.dim, (3,), padding="SAME")(mel)
        x = nn.gelu(x)
        x = nn.Conv(self.dim, (3,), strides=(2,), padding="SAME")(x)  # T/2
        x = nn.gelu(x)
        x = x + jnp.asarray(sincos_positions(x.shape[1], self.dim))
        heads = self.heads or max(1, self.dim // 32)
        for _ in range(self.depth):
            x = MHABlock(self.dim, heads)(x)
        return nn.LayerNorm()(x)


class AsrDecoder(nn.Module):
    dim: int = 192
    depth: int = 4
    heads: int = 0  # 0 -> dim // 32

    @nn.compact
    def __call__(self, tokens, memory):  # [B, S] int, [B, T', D]
        x = nn.Embed(ByteTokenizer.vocab_size, self.dim)(tokens)
        x = x + jnp.asarray(sincos_positions(tokens.shape[-1], self.dim))
        heads = self.heads or max(1, self.dim // 32)
        for _ in range(self.depth):
            x = MHABlock(self.dim, heads, causal=True)(x, context=memory)
        x = nn.LayerNorm()(x)
        return nn.Dense(ByteTokenizer.vocab_size)(x)


class AsrModel(nn.Module):
    dim: int = 192
    depth: int = 4

    def setup(self):
        self.encoder = AsrEncoder(dim=self.dim, depth=self.depth)
        self.decoder = AsrDecoder(dim=self.dim, depth=self.depth)

    def __call__(self, mel, tokens):
        return self.decoder(tokens, self.encoder(mel))

    def encode(self, mel):
        return self.encoder(mel)

    def decode(self, tokens, memory):
        return self.decoder(tokens, memory)


@partial(jax.jit, static_argnames=("chunk",))
def mel_chunks(audio: jax.Array, chunk: int) -> jax.Array:
    """audio [n] -> mel chunks [ceil(frames/chunk), chunk, N_MELS], one
    device program (frontend + pad + reshape; all shapes static per length).
    """
    mel = log_mel(audio)
    t = mel.shape[0]
    n_chunks = max(1, -(-t // chunk))
    mel = jnp.pad(mel, ((0, n_chunks * chunk - t), (0, 0)))
    return mel.reshape(n_chunks, chunk, N_MELS)


def log_mel(audio: jax.Array, sr: int = 16000) -> jax.Array:
    """Whisper-style log-mel frontend on the device spectral kernels."""
    from fvd_tpu.ops.spectral import mel_filterbank, stft_power

    power = stft_power(audio, n_fft=N_FFT, hop=HOP)
    fb = jnp.asarray(mel_filterbank(sr, N_FFT, N_MELS))
    mel = power @ fb.T
    logmel = jnp.log10(jnp.maximum(mel, 1e-10))
    logmel = jnp.maximum(logmel, jnp.max(logmel) - 8.0)
    return (logmel + 4.0) / 4.0


def asr_loss(params, model: AsrModel, mel, tokens_in, tokens_out, pad_id=ByteTokenizer.PAD):
    """Teacher-forced cross entropy, pad-masked."""
    logits = model.apply(params, mel, tokens_in)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tokens_out[..., None], axis=-1)[..., 0]
    mask = tokens_out != pad_id
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


@partial(jax.jit, static_argnames=("dim", "depth", "max_tokens"))
def greedy_decode(params, mel, dim=192, depth=4, max_tokens=MAX_TOKENS):
    """Greedy autoregressive decode as a while_loop (compiled once)."""
    model = AsrModel(dim=dim, depth=depth)
    memory = model.apply(params, mel, method=AsrModel.encode)
    b = mel.shape[0]
    tokens = jnp.full((b, max_tokens), ByteTokenizer.PAD, jnp.int32)
    tokens = tokens.at[:, 0].set(ByteTokenizer.BOS)

    def cond(state):
        tokens, i, done = state
        return jnp.logical_and(i < max_tokens - 1, jnp.logical_not(jnp.all(done)))

    def body(state):
        tokens, i, done = state
        logits = model.apply(params, tokens, memory, method=AsrModel.decode)
        nxt = jnp.argmax(logits[:, i], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, ByteTokenizer.PAD, nxt)
        tokens = tokens.at[:, i + 1].set(nxt)
        done = jnp.logical_or(done, nxt == ByteTokenizer.EOS)
        return tokens, i + 1, done

    tokens, _, _ = jax.lax.while_loop(
        cond, body, (tokens, jnp.array(0), jnp.zeros(b, bool))
    )
    return tokens


def init_params(rng, dim: int = 192, depth: int = 4):
    model = AsrModel(dim=dim, depth=depth)
    return model.init(
        rng,
        jnp.zeros((1, MAX_AUDIO_FRAMES, N_MELS), jnp.float32),
        jnp.zeros((1, MAX_TOKENS), jnp.int32),
    )


class JaxASR:
    """ASRProvider over the encoder-decoder (Whisper role).

    Chunks audio into MAX_AUDIO_FRAMES windows, decodes each greedily, and
    emits Whisper-shaped ``{text, segments}``.
    """

    model_name = "fvd_tpu_asr"

    def __init__(self, params=None, dim: int = 192, depth: int = 4,
                 chunk_frames: int = MAX_AUDIO_FRAMES, max_tokens: int = MAX_TOKENS):
        self.dim, self.depth = dim, depth
        self.chunk_frames = chunk_frames
        self.max_tokens = max_tokens
        self.params = params if params is not None else init_params(
            jax.random.PRNGKey(0), dim, depth)
        self.tok = ByteTokenizer()

    @classmethod
    def from_checkpoint(cls, path: str) -> "JaxASR":
        """Load a tools/pretrain_asr.py checkpoint (npz + sibling json meta)."""
        import json
        import os

        from fvd_tpu.models.encoders import load_params

        meta = {}
        meta_path = path.replace(".npz", ".json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        dim = int(meta.get("dim", 192))
        depth = int(meta.get("depth", 4))
        template = init_params(jax.random.PRNGKey(0), dim, depth)
        params = load_params(path, template)
        return cls(
            params=params, dim=dim, depth=depth,
            chunk_frames=int(meta.get("chunk_frames", MAX_AUDIO_FRAMES)),
            max_tokens=int(meta.get("max_tokens", MAX_TOKENS)),
        )

    def transcribe(self, audio_path: str, audio=None) -> Optional[Dict[str, Any]]:
        """``audio`` (host or device-resident array at 16 kHz) skips the file
        read AND the host->HBM upload when A1 left its output on device."""
        sr = 16000
        if audio is None:
            from fvd_tpu.utils.wav import read_wav, to_mono

            try:
                samples, sr = read_wav(audio_path)
            except Exception:
                return None
            audio = to_mono(samples)
        y = jnp.asarray(audio, jnp.float32)
        chunk = self.chunk_frames
        t = 1 + y.shape[0] // HOP  # frame_signal center-mode frame count
        chunks = mel_chunks(y, chunk)
        tokens = greedy_decode(self.params, chunks, dim=self.dim,
                               depth=self.depth, max_tokens=self.max_tokens)
        segments = []
        texts = []
        sec_per_frame = HOP / sr
        for i, row in enumerate(np.asarray(tokens)):
            text = self.tok.decode(row).strip()
            start = i * chunk * sec_per_frame
            end = min((i + 1) * chunk, t) * sec_per_frame
            if text:
                segments.append({"start": start, "end": end, "text": text})
                texts.append(text)
        return {"text": " ".join(texts), "segments": segments}
