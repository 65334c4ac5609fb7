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


def active_spans(
    y: np.ndarray,
    sr: int = 16000,
    rel_thresh: float = 0.05,
    abs_floor: float = 1e-4,
    merge_gap_s: float = 0.2,
    min_span_s: float = 0.05,
    pad_s: float = 0.02,
) -> list:
    """Host-side energy VAD: contiguous speech spans as sample ranges.

    The reference's Whisper handles long-form audio by internally windowing
    around detected speech (a2_vad_asr.py:27-30 relies on that); the
    equivalent here keeps each decoded window inside the trained
    distribution — speech followed by silence (tools/pretrain_asr.py pads
    utterances with zeros) — instead of slicing fixed windows that cut
    through speech/pause boundaries.  Pure numpy: per CLAUDE.md the
    single-core host must not issue tiny device dispatches per clip.
    """
    hop = HOP
    n = len(y) // hop
    if n == 0:
        return [(0, len(y))] if len(y) else []
    frames = y[: n * hop].reshape(n, hop).astype(np.float64)
    rms = np.sqrt(np.mean(frames * frames, axis=1))
    thr = max(abs_floor, rel_thresh * float(rms.max()))
    active = rms > thr
    if not active.any():
        return []
    edges = np.flatnonzero(np.diff(np.concatenate([[0], active.view(np.int8), [0]])))
    spans = list(zip(edges[0::2], edges[1::2]))  # frame-index [start, end)
    gap = max(1, int(merge_gap_s * sr / hop))
    merged = [spans[0]]
    for s, e in spans[1:]:
        if s - merged[-1][1] <= gap:
            merged[-1] = (merged[-1][0], e)
        else:
            merged.append((s, e))
    min_fr = max(1, int(min_span_s * sr / hop))
    pad = int(pad_s * sr / hop)
    return [
        (max(0, s - pad) * hop, min(len(y), (e + pad) * hop))
        for s, e in merged
        if e - s >= min_fr
    ]


@jax.jit
def _mel_masked(audio_b: jax.Array, n_frames: jax.Array) -> jax.Array:
    """Batched log-mel with rows past each item's content zeroed — the
    training-time silence representation (pretrain_asr.py zeroes mel rows
    beyond the utterance), computed in ONE device program."""
    mel = jax.vmap(log_mel)(audio_b)  # [B, F, 80]
    idx = jnp.arange(mel.shape[1])[None, :, None]
    return jnp.where(idx < n_frames[:, None, None], mel, 0.0)


class JaxASR:
    """ASRProvider over the encoder-decoder (Whisper role).

    Chunks audio into MAX_AUDIO_FRAMES windows, decodes each greedily, and
    emits Whisper-shaped ``{text, segments}``.
    """

    model_name = "fvd_tpu_asr"

    def __init__(self, params=None, dim: int = 192, depth: int = 4,
                 chunk_frames: int = MAX_AUDIO_FRAMES, max_tokens: int = MAX_TOKENS,
                 dither: float = 0.01):
        self.dim, self.depth = dim, depth
        self.chunk_frames = chunk_frames
        self.max_tokens = max_tokens
        self.dither = dither
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
            # domain-matched inference dither: the tone checkpoint trains on
            # a 0.01 noise floor (clean audio decodes empty without it); the
            # formant domain trains clean (dither destroys its decodes)
            dither=float(meta.get("dither", 0.01)),
        )

    def transcribe(self, audio_path: str, audio=None) -> Optional[Dict[str, Any]]:
        """``audio`` (host or device-resident array at 16 kHz) skips the file
        read AND the host->HBM upload when A1 left its output on device.

        Long-form strategy: energy-VAD spans -> each span windowed to the
        model's chunk length -> ONE batched mel + ONE batched greedy decode
        over all windows (shape-bucketed so repeated clips reuse the
        compiled program).  Mirrors Whisper's windowed long-form decode
        (reference a2_vad_asr.py:27-30) while keeping every window inside
        the trained speech-then-silence distribution.
        """
        sr = 16000
        if audio is None:
            from fvd_tpu.utils.wav import read_wav, to_mono

            try:
                samples, sr = read_wav(audio_path)
            except Exception:
                return None
            audio = to_mono(samples)
        y = np.asarray(audio, np.float32)
        spans = active_spans(y, sr)
        if not spans:
            return {"text": "", "segments": []}

        chunk_samples = (self.chunk_frames - 1) * HOP
        pieces: list = []  # (start_sample, samples)
        for s0, s1 in spans:
            for off in range(s0, s1, chunk_samples):
                pieces.append((off, y[off: min(off + chunk_samples, s1)]))

        p = len(pieces)
        rows = np.zeros((p, chunk_samples), np.float32)
        n_frames = np.zeros(p, np.int32)
        # deterministic dither matching the training noise floor
        # (tools/pretrain_asr.py trains on tone_speech(text, rng) = +0.01
        # randn; a clean studio-silent signal is out-of-distribution and
        # decodes empty — the same reason production ASR front-ends dither)
        dither = np.random.RandomState(0)
        for i, (_, seg) in enumerate(pieces):
            n = len(seg)
            rows[i, :n] = seg + self.dither * dither.randn(n).astype(np.float32)
            n_frames[i] = min(1 + n // HOP, self.chunk_frames)

        # decode all windows in one mel + one greedy-decode dispatch, padded
        # to a power-of-two bucket so varying pause structure reuses one
        # compiled program; under multi-video overlap the window batches of
        # concurrent videos coalesce into the same dispatch
        from fvd_tpu.providers.coalesce import run_program

        def _run_batch(payloads):
            all_rows = np.concatenate([r for r, _ in payloads])
            all_nf = np.concatenate([f for _, f in payloads])
            total = len(all_rows)
            bucket = 1 << max(2, (total - 1).bit_length())
            if bucket > total:
                all_rows = np.concatenate(
                    [all_rows, np.zeros((bucket - total, chunk_samples), np.float32)])
                all_nf = np.concatenate([all_nf, np.zeros(bucket - total, np.int32)])
            mels = _mel_masked(jnp.asarray(all_rows), jnp.asarray(all_nf))
            toks = np.asarray(greedy_decode(  # one fetch for the group
                self.params, mels, dim=self.dim, depth=self.depth,
                max_tokens=self.max_tokens))
            out, o = [], 0
            for r, _ in payloads:
                out.append(toks[o: o + len(r)])
                o += len(r)
            return out

        tokens = run_program(
            "a2_decode",
            (id(self), chunk_samples, self.chunk_frames, self.max_tokens),
            (rows, n_frames), _run_batch)
        segments = []
        texts = []
        for (off, seg), row in zip(pieces, np.asarray(tokens)):
            text = self.tok.decode(row).strip()
            if text:
                segments.append({"start": off / sr,
                                 "end": (off + len(seg)) / sr, "text": text})
                texts.append(text)
        return {"text": " ".join(texts), "segments": segments}
