"""Device whisper-mel frontend vs transformers' host extractor.

The HF providers and the whisper-geometry trainer both rely on
``ops/whisper_frontend`` reproducing ``WhisperFeatureExtractor``
(reference A2's frontend, `a2_vad_asr.py:27-30`) — these pin that
equivalence and the tile-composition identity the trainer's device-resident
data path depends on.
"""

import numpy as np
import pytest

pytest.importorskip("transformers")

import jax.numpy as jnp


@pytest.fixture(scope="module")
def fe():
    from transformers import WhisperFeatureExtractor

    return WhisperFeatureExtractor()


def _speech(n, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 16000.0
    sig = 0.3 * np.sin(2 * np.pi * 220 * t) * (np.sin(2 * np.pi * 3 * t) > 0)
    return (sig + 0.01 * rng.randn(n)).astype(np.float32)


def test_matches_hf_extractor(fe):
    audio = np.zeros(480000, np.float32)
    audio[30000:30000 + 64000] = _speech(64000)
    ref = fe(audio, sampling_rate=16000, return_tensors="np",
             padding=False).input_features[0]

    from fvd_tpu.ops.whisper_frontend import whisper_log_mel

    out = np.asarray(whisper_log_mel(
        jnp.asarray(audio), jnp.asarray(fe.mel_filters, jnp.float32)))
    assert out.shape == (80, 3000)
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_short_audio_padded_like_extractor(fe):
    """<30 s audio is zero-padded to the window, as the extractor pads."""
    audio = _speech(48000, seed=3)
    padded = np.zeros(480000, np.float32)
    padded[:48000] = audio
    ref = fe(padded, sampling_rate=16000, return_tensors="np",
             padding=False).input_features[0]

    from fvd_tpu.ops.whisper_frontend import whisper_log_mel

    out = np.asarray(whisper_log_mel(
        jnp.asarray(audio), jnp.asarray(fe.mel_filters, jnp.float32)))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_composed_canvas_matches_monolithic(fe):
    """Tiles summed onto the canvas == whisper_log_mel of assembled audio
    (the gated_speech placement invariant: hop-aligned offsets, <1 s
    phrases on a >=1 s grid)."""
    from fvd_tpu.ops.whisper_frontend import (TILE_FRAMES_DEFAULT,
                                              compose_canvas, phrase_power_mel,
                                              whisper_log_mel)

    fb = jnp.asarray(fe.mel_filters, jnp.float32)
    tiles, phrases = [], []
    for seed, n in ((1, 14000), (2, 9000), (3, 15000)):
        a = _speech(n, seed=seed)
        phrases.append(a)
        buf = np.zeros(TILE_FRAMES_DEFAULT * 160, np.float32)
        buf[:n] = a
        tiles.append(phrase_power_mel(jnp.asarray(buf), fb, TILE_FRAMES_DEFAULT))
    pool = jnp.stack(tiles)

    # hop-aligned slots, 1 s-ish apart, off the clip edge (at offset 0 the
    # monolithic path reflect-pads real content; tiles assume zero context —
    # a <=2-frame boundary effect the trainer tolerates but this identity
    # check must avoid)
    offsets = [10, 110, 240]
    audio = np.zeros(480000, np.float32)
    for a, off in zip(phrases, offsets):
        audio[off * 160: off * 160 + len(a)] = a
    ref = np.asarray(whisper_log_mel(jnp.asarray(audio), fb))

    out = np.asarray(compose_canvas(
        pool, jnp.asarray([0, 1, 2], jnp.int32),
        jnp.asarray(offsets, jnp.int32)))
    # interior exact; the only deviation is the clip-edge reflect padding,
    # which sits in silence here
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_unused_slots_are_noops(fe):
    from fvd_tpu.ops.whisper_frontend import (TILE_FRAMES_DEFAULT,
                                              compose_canvas, phrase_power_mel)

    fb = jnp.asarray(fe.mel_filters, jnp.float32)
    buf = np.zeros(TILE_FRAMES_DEFAULT * 160, np.float32)
    buf[:12000] = _speech(12000, seed=5)
    pool = jnp.stack([phrase_power_mel(jnp.asarray(buf), fb, TILE_FRAMES_DEFAULT)])

    one = compose_canvas(pool, jnp.asarray([0], jnp.int32),
                         jnp.asarray([50], jnp.int32))
    padded = compose_canvas(
        pool, jnp.asarray([0, -1, -1], jnp.int32),
        jnp.asarray([50, 0, 700], jnp.int32))
    np.testing.assert_allclose(np.asarray(one), np.asarray(padded), atol=1e-6)
