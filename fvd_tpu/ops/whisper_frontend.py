"""Whisper-compatible log-mel frontend as device programs.

The reference's A2 feeds raw audio to openai-whisper, whose frontend
(``a2_vad_asr.py:27-30`` via transformers' ``WhisperFeatureExtractor``)
computes a host-side 80-bin log-mel spectrogram over the 30 s window —
measured at ~5.6 s per clip on this 1-core host, which would dominate the
whole per-video budget.  This module reproduces that frontend bit-closely
(<1e-5 abs) as a jitted XLA program: hann-windowed 400/160 STFT with
reflect ``center`` padding, power spectrum, the extractor's own slaney mel
filter bank (passed in as a matrix so the numerics are *its* numerics),
``log10`` with the global max-minus-8 clamp, and the (x+4)/4 scaling.

Also hosts the composition path the whisper-geometry trainer uses: each
training sample is a 30 s canvas assembled ON DEVICE from a pool of
pre-rendered phrase power-mels (``compose_canvas``), so the host never
renders or uploads audio inside the training loop — the corpus lives in
HBM and each step ships only integer indices/offsets.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SR = 16000
N_FFT = 400
HOP = 160
N_FRAMES = 3000          # whisper's fixed 30 s window (1500 encoder positions)
WINDOW_SAMPLES = N_FRAMES * HOP
TILE_FRAMES_DEFAULT = 104  # phrase tile: <=0.95 s content + boundary frames


def hann_window() -> np.ndarray:
    """The extractor's periodic hann (numpy's symmetric hann of 401, last
    sample dropped, equals the periodic window of 400)."""
    return np.hanning(N_FFT + 1)[:N_FFT].astype(np.float32)


def stft_power_frames(audio: jax.Array, n_frames: int) -> jax.Array:
    """[n] audio -> [n_frames, 201] power spectrum, whisper conventions:
    reflect-pad n_fft//2 on both sides (center=True), hop 160, hann 400,
    |rfft|^2, final boundary frame dropped by the caller's frame count."""
    pad = N_FFT // 2
    x = jnp.pad(audio, (pad, pad), mode="reflect")
    idx = jnp.arange(n_frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    frames = x[idx] * jnp.asarray(hann_window())
    spec = jnp.fft.rfft(frames, n=N_FFT, axis=-1)
    return jnp.abs(spec) ** 2


def finish_log_mel(power_mel: jax.Array) -> jax.Array:
    """[T, 80] power-mel -> whisper-scaled log-mel [80, T] (the extractor's
    log10 / global max-8 clamp / (x+4)/4)."""
    logspec = jnp.log10(jnp.maximum(power_mel, 1e-10))
    logspec = jnp.maximum(logspec, logspec.max() - 8.0)
    return ((logspec + 4.0) / 4.0).T


@jax.jit
def whisper_log_mel(audio: jax.Array, mel_filters: jax.Array) -> jax.Array:
    """Full-window features: [480000] audio + [201, 80] extractor filter
    bank -> [80, 3000] input_features, matching
    ``WhisperFeatureExtractor.__call__`` to <1e-5."""
    audio = audio[:WINDOW_SAMPLES]
    audio = jnp.pad(audio, (0, WINDOW_SAMPLES - audio.shape[0]))
    power = stft_power_frames(audio, N_FRAMES + 1)[:-1]  # extractor drops last
    return finish_log_mel(power @ mel_filters)


@partial(jax.jit, static_argnames=("out_frames",))
def phrase_power_mel(audio: jax.Array, mel_filters: jax.Array,
                     out_frames: int) -> jax.Array:
    """Power-mel of one pre-rendered phrase, zero-context framing.

    A phrase placed at a hop-aligned offset inside an otherwise-silent 30 s
    window produces exactly these frames there (frames overlapping the
    phrase edge see phrase samples + zeros — i.e. zero padding, which is
    what the silent window provides), so canvases composed from these tiles
    match a monolithic ``whisper_log_mel`` of the assembled audio.

    Tile row 0 is the frame ONE HOP BEFORE the content start (that window's
    tail reaches 40 samples into the content); ``compose_canvas`` accounts
    for the one-frame lead with its canvas margin.
    """
    buf = jnp.zeros(out_frames * HOP + N_FFT, jnp.float32)
    buf = jax.lax.dynamic_update_slice(buf, audio.astype(jnp.float32),
                                       (N_FFT // 2 + HOP,))
    # tile frame f covers content samples [(f-1)*HOP - 200, (f-1)*HOP + 200)
    idx = jnp.arange(out_frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    frames = buf[idx] * jnp.asarray(hann_window())
    spec = jnp.fft.rfft(frames, n=N_FFT, axis=-1)
    return (jnp.abs(spec) ** 2) @ mel_filters  # [out_frames, 80]


@jax.jit
def compose_canvas(pool: jax.Array, phrase_idx: jax.Array,
                   frame_offsets: jax.Array) -> jax.Array:
    """Assemble one 30 s log-mel canvas from pooled phrase power-mels.

    pool          [M, F, 80]  phrase power-mels (F frames per tile)
    phrase_idx    [K] int32   pool rows; -1 = unused slot
    frame_offsets [K] int32   placement frame of each phrase

    Tiles are summed into the canvas (their zero padding makes overlap of
    *padding* regions a no-op; callers keep content non-overlapping, the
    ``gated_speech`` invariant of <1 s phrases on a >=1 s grid).
    """
    F = pool.shape[1]
    # one-frame left margin: tile row 0 is the frame one hop BEFORE the
    # phrase's content start (see phrase_power_mel), so a phrase whose
    # content starts at canvas frame `off` lands its tile at margin row off
    canvas = jnp.zeros((1 + N_FRAMES + F, pool.shape[2]), jnp.float32)

    def body(k, canvas):
        tile = pool[jnp.maximum(phrase_idx[k], 0)]
        tile = jnp.where(phrase_idx[k] >= 0, tile, 0.0)
        off = jnp.clip(frame_offsets[k], 0, N_FRAMES)
        cur = jax.lax.dynamic_slice(canvas, (off, 0), (F, pool.shape[2]))
        return jax.lax.dynamic_update_slice(canvas, cur + tile, (off, 0))

    canvas = jax.lax.fori_loop(0, phrase_idx.shape[0], body, canvas)
    return finish_log_mel(canvas[1:1 + N_FRAMES])


compose_canvas_batch = jax.jit(jax.vmap(compose_canvas, in_axes=(None, 0, 0)))
