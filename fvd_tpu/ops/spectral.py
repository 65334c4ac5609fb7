"""Spectral kernels: framing, STFT, mel, onset strength/peaks, RMS envelope.

Replaces the reference's librosa calls (``a3_audio_onsets.py:25-49``:
``onset_detect``, ``frames_to_time``, ``feature.rms``) with jitted XLA
programs.  Functional (not bit-level) parity with librosa's defaults: onset
times land within the reference's own test tolerance (±0.1 s,
``tests/test_a3_audio_onsets.py``), envelope length is exactly
``duration*fps`` after interpolation.

All hot paths are static-shape jnp; peak picking is a vectorized
reduce-window program rather than librosa's sequential numpy loop.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Framing / STFT
# ---------------------------------------------------------------------------
def frame_signal(x: jax.Array, frame_length: int, hop: int, center: bool = True) -> jax.Array:
    """[n] -> [num_frames, frame_length]; zero-pads like librosa center mode."""
    if center:
        x = jnp.pad(x, (frame_length // 2, frame_length // 2))
    n = x.shape[0]
    num_frames = max(1 + (n - frame_length) // hop, 1)
    idx = jnp.arange(num_frames)[:, None] * hop + jnp.arange(frame_length)[None, :]
    return x[idx]


@partial(jax.jit, static_argnames=("n_fft", "hop"))
def stft_power(x: jax.Array, n_fft: int = 2048, hop: int = 512) -> jax.Array:
    """Power spectrogram |STFT|^2 -> [frames, n_fft//2+1] (Hann window)."""
    frames = frame_signal(x, n_fft, hop, center=True)
    window = jnp.hanning(n_fft + 1)[:-1].astype(jnp.float32)
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    return (spec.real**2 + spec.imag**2).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Mel filterbank (HTK-free slaney-style triangles, as librosa defaults)
# ---------------------------------------------------------------------------
def _hz_to_mel(f):
    # Slaney scale: linear below 1 kHz, log above.
    f = np.asarray(f, dtype=np.float64)
    mel = f / (200.0 / 3)
    log_region = f >= 1000.0
    mel = np.where(
        log_region,
        15.0 + np.log(np.maximum(f, 1e-9) / 1000.0) / (np.log(6.4) / 27.0),
        mel,
    )
    return mel


def _mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f = m * (200.0 / 3)
    log_region = m >= 15.0
    f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
    return f


@lru_cache(maxsize=16)
def mel_filterbank(sr: int, n_fft: int, n_mels: int = 128, fmax: float | None = None) -> np.ndarray:
    """[n_mels, n_fft//2+1] triangular filters, slaney-normalized."""
    fmax = fmax or sr / 2
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(0.0), _hz_to_mel(fmax), n_mels + 2))
    fb = np.zeros((n_mels, len(fft_freqs)))
    for i in range(n_mels):
        lo, ctr, hi = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-9)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-9)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        # slaney normalization: constant energy per band
        fb[i] *= 2.0 / (hi - lo)
    return fb.astype(np.float32)


@partial(jax.jit, static_argnames=("sr", "n_fft", "hop", "n_mels"))
def mel_spectrogram(
    x: jax.Array, sr: int, n_fft: int = 2048, hop: int = 512, n_mels: int = 128
) -> jax.Array:
    power = stft_power(x, n_fft, hop)  # [T, F]
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))
    return power @ fb.T  # [T, n_mels] — MXU matmul


def power_to_db(S: jax.Array, top_db: float = 80.0) -> jax.Array:
    ref = jnp.maximum(jnp.max(S), 1e-10)
    log_spec = 10.0 * jnp.log10(jnp.maximum(S, 1e-10) / ref)
    return jnp.maximum(log_spec, -top_db)


# ---------------------------------------------------------------------------
# Onset strength + peak picking
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("sr", "n_fft", "hop", "n_mels"))
def onset_strength(
    x: jax.Array, sr: int, n_fft: int = 2048, hop: int = 512, n_mels: int = 128
) -> jax.Array:
    """Spectral-flux onset envelope: half-wave-rectified frame-to-frame
    increase of the dB mel spectrogram, averaged over bands."""
    S = power_to_db(mel_spectrogram(x, sr, n_fft, hop, n_mels))  # [T, n_mels]
    diff = S[1:] - S[:-1]
    flux = jnp.mean(jnp.maximum(0.0, diff), axis=-1)
    # prepend a zero so envelope index t refers to frame t (librosa shifts
    # by the same one-frame lag)
    return jnp.concatenate([jnp.zeros((1,), flux.dtype), flux])


def _window_max(x: jax.Array, before: int, after: int) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (before + after + 1,), (1,), [(before, after)]
    )


def _window_mean(x: jax.Array, before: int, after: int) -> jax.Array:
    size = before + after + 1
    ones = jnp.ones_like(x)
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (size,), (1,), [(before, after)])
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (size,), (1,), [(before, after)])
    return s / cnt


@partial(jax.jit, static_argnames=("pre_max", "post_max", "pre_avg", "post_avg", "wait"))
def peak_pick_mask(
    env: jax.Array,
    pre_max: int,
    post_max: int,
    pre_avg: int,
    post_avg: int,
    delta: float,
    wait: int,
) -> jax.Array:
    """Vectorized equivalent of librosa.util.peak_pick.

    A frame is a peak if it is (a) the max of its local max-window, and
    (b) >= local mean + delta, and (c) at least ``wait`` frames after the
    previous accepted peak.  (c) is inherently sequential -> lax.scan over a
    boolean candidate mask (cheap: one int per frame).
    """
    is_max = env >= _window_max(env, pre_max, post_max) - 1e-12
    above_mean = env >= _window_mean(env, pre_avg, post_avg) + delta
    candidate = jnp.logical_and(is_max, above_mean)

    def step(last_peak_age, cand):
        take = jnp.logical_and(cand, last_peak_age > wait)
        new_age = jnp.where(take, 0, last_peak_age + 1)
        return new_age, take

    _, mask = jax.lax.scan(step, jnp.array(wait + 1, jnp.int32), candidate)
    return mask


def detect_onsets(
    x: jax.Array,
    sr: int,
    n_fft: int = 2048,
    hop: int = 512,
    n_mels: int = 128,
    pre_max_s: float = 0.03,
    post_max_s: float = 0.0,
    pre_avg_s: float = 0.10,
    post_avg_s: float = 0.10,
    wait_s: float = 0.03,
    delta: float = 0.07,
) -> np.ndarray:
    """Onset times in seconds (the ``librosa.onset.onset_detect`` +
    ``frames_to_time`` analog, reference a3:25-27)."""
    env = onset_strength(x, sr, n_fft, hop, n_mels)
    # normalize envelope to [0, 1] so delta is scale-free (librosa normalizes
    # via its default aggregation too)
    env = env / jnp.maximum(jnp.max(env), 1e-10)
    frames_per_s = sr / hop  # frames per second
    to_frames = lambda s: max(int(round(s * frames_per_s)), 1)
    mask = peak_pick_mask(
        env,
        pre_max=to_frames(pre_max_s),
        post_max=max(int(round(post_max_s * frames_per_s)), 0) + 1,
        pre_avg=to_frames(pre_avg_s),
        post_avg=to_frames(post_avg_s) + 1,
        delta=delta,
        wait=to_frames(wait_s),
    )
    frames = np.nonzero(np.asarray(mask))[0]
    return frames * hop / sr


# ---------------------------------------------------------------------------
# RMS envelope (reference a3:39-49)
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("frame_length", "hop"))
def rms_envelope(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    frames = frame_signal(x, frame_length, hop, center=True)
    return jnp.sqrt(jnp.mean(frames**2, axis=-1))


@partial(jax.jit, static_argnames=("target_len",))
def interp_to_length(y: jax.Array, target_len: int) -> jax.Array:
    """np.interp(linspace(0,1,target), linspace(0,1,len(y)), y) on device
    (reference a3:45-49)."""
    n = y.shape[0]
    xq = jnp.linspace(0.0, 1.0, target_len)
    xp = jnp.linspace(0.0, 1.0, n)
    return jnp.interp(xq, xp, y)


@partial(
    jax.jit,
    static_argnames=(
        "sr", "n_fft", "hop", "n_mels", "pre_max", "post_max", "pre_avg",
        "post_avg", "wait", "delta", "env_frame", "env_hop", "env_target",
    ),
)
def audio_frontend_program(
    x: jax.Array,
    sr: int,
    n_fft: int,
    hop: int,
    n_mels: int,
    pre_max: int,
    post_max: int,
    pre_avg: int,
    post_avg: int,
    wait: int,
    delta: float,
    env_frame: int,
    env_hop: int,
    env_target: int,
):
    """The whole A3 front-end as ONE device program: onset peak mask + the
    fps-aligned RMS envelope.  A single dispatch per video matters when the
    device sits behind a high-latency tunnel and in batched serving."""
    env_strength = onset_strength(x, sr, n_fft, hop, n_mels)
    env_strength = env_strength / jnp.maximum(jnp.max(env_strength), 1e-10)
    mask = peak_pick_mask(env_strength, pre_max, post_max, pre_avg, post_avg, delta, wait)
    rms = rms_envelope(x, frame_length=env_frame, hop=env_hop)
    if env_target > 0 and rms.shape[0] != env_target:
        rms = interp_to_length(rms, env_target)
    return mask, rms


def fps_aligned_envelope(
    x: jax.Array, sr: int, fps: float, duration: float | None
) -> jax.Array:
    """RMS envelope sampled at video fps, interpolated to duration*fps
    samples — the exact A3 recipe (a3:39-49: hop=int(sr/fps),
    frame_length=2*hop, center=True)."""
    hop = int(sr / fps)
    rms = rms_envelope(x, frame_length=2 * hop, hop=hop)
    if duration:
        target = int(duration * fps)
        if rms.shape[0] != target:
            rms = interp_to_length(rms, target)
    return rms


_frontend_batch_cache: dict = {}


def audio_frontend_program_batch(xs: jax.Array, **params):
    """vmapped :func:`audio_frontend_program` over same-length signals
    ``xs [B, n]`` -> (masks [B, F], envelopes [B, T]).

    One compiled program per (n, params) combination, cached — the
    cross-video coalescer (providers/coalesce.py run_program) turns the
    per-video A3 dispatch+fetch round trips into one of each per group.
    """
    key = (int(xs.shape[1]),) + tuple(sorted(params.items()))
    fn = _frontend_batch_cache.get(key)
    if fn is None:
        fn = jax.jit(jax.vmap(lambda x: audio_frontend_program(x, **params)))
        _frontend_batch_cache[key] = fn
    return fn(xs)
