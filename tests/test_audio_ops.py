"""Audio front-end tests.

Mirrors the reference's synthetic-fixture strategy:
``tests/test_a1_audio_standardization.py`` (sine-wave stereo WAV resampled to
16 kHz mono) and ``tests/test_a3_audio_onsets.py`` (two sine bursts at
0.5 s / 1.5 s: onsets within ±0.1 s, envelope length == duration*fps).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from fvd_tpu.config import default_config
from fvd_tpu.nodes import a1_standardize, a3_onsets
from fvd_tpu.ops import resample, spectral
from fvd_tpu.state import State
from fvd_tpu.utils import wav


# ---------------------------------------------------------------------------
# WAV I/O
# ---------------------------------------------------------------------------
def test_wav_roundtrip(tmp_path):
    sr = 22050
    t = np.linspace(0, 1.0, sr, endpoint=False)
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    path = str(tmp_path / "x.wav")
    wav.write_wav(path, x, sr)
    y, sr2 = wav.read_wav(path)
    assert sr2 == sr
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_wav_stereo_to_mono(tmp_path):
    sr = 8000
    x = np.stack([np.ones(100), -np.ones(100)], axis=1) * 0.5
    path = str(tmp_path / "st.wav")
    wav.write_wav(path, x, sr)
    y, _ = wav.read_wav(path)
    assert y.shape == (100, 2)
    mono = wav.to_mono(y)
    np.testing.assert_allclose(mono, np.zeros(100), atol=1e-3)


# ---------------------------------------------------------------------------
# Resampler
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("orig_sr", [44100, 48000, 22050, 8000])
def test_resample_length_and_tone(orig_sr):
    target_sr = 16000
    dur = 0.5
    freq = 440.0
    t = np.arange(int(orig_sr * dur)) / orig_sr
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    y = np.asarray(resample.resample(x, orig_sr, target_sr))

    expected_len = -(-len(x) * target_sr // orig_sr)
    assert len(y) == expected_len

    # The tone must survive: dominant FFT bin at 440 Hz.
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = np.argmax(spec) * target_sr / len(y)
    assert abs(peak_hz - freq) < 5.0

    # Amplitude preserved (interior, away from filter edges).
    interior = y[len(y) // 4 : -len(y) // 4]
    assert np.max(np.abs(interior)) == pytest.approx(1.0, abs=0.05)


def test_resample_identity():
    x = np.random.default_rng(0).normal(size=1000).astype(np.float32)
    y = np.asarray(resample.resample(x, 16000, 16000))
    np.testing.assert_array_equal(x, y)


def test_resample_rejects_aliasing():
    """Content above the target Nyquist must be attenuated."""
    orig_sr, target_sr = 44100, 16000
    t = np.arange(orig_sr) / orig_sr
    x = np.sin(2 * np.pi * 15000 * t).astype(np.float32)  # 15 kHz > 8 kHz Nyquist
    y = np.asarray(resample.resample(x, orig_sr, target_sr))
    assert np.max(np.abs(y[1000:-1000])) < 0.02


# ---------------------------------------------------------------------------
# Spectral ops
# ---------------------------------------------------------------------------
def test_stft_power_shape_and_peak():
    sr, n_fft, hop = 16000, 2048, 512
    t = np.arange(sr) / sr
    x = jnp.asarray(np.sin(2 * np.pi * 1000 * t), jnp.float32)
    S = spectral.stft_power(x, n_fft, hop)
    assert S.shape[1] == n_fft // 2 + 1
    peak_bin = int(np.argmax(np.asarray(S[S.shape[0] // 2])))
    peak_hz = peak_bin * sr / n_fft
    assert abs(peak_hz - 1000) < sr / n_fft + 1


def test_mel_filterbank_shape_and_coverage():
    fb = spectral.mel_filterbank(16000, 2048, 128)
    assert fb.shape == (128, 1025)
    # every filter has some mass; filters tile the band
    assert (fb.sum(axis=1) > 0).all()


def test_rms_envelope_constant_signal():
    x = jnp.ones(16000, jnp.float32) * 0.5
    env = spectral.rms_envelope(x, frame_length=1066, hop=533)
    # interior frames see the constant signal
    interior = np.asarray(env[2:-2])
    np.testing.assert_allclose(interior, 0.5, atol=1e-3)


def test_interp_to_length_endpoints():
    y = jnp.asarray(np.linspace(0, 1, 50), jnp.float32)
    z = np.asarray(spectral.interp_to_length(y, 150))
    assert len(z) == 150
    assert z[0] == pytest.approx(0.0, abs=1e-6)
    assert z[-1] == pytest.approx(1.0, abs=1e-6)


# ---------------------------------------------------------------------------
# Onset detection — reference A3 test semantics (two bursts at 0.5s/1.5s)
# ---------------------------------------------------------------------------
def _burst_signal(sr=16000, duration=2.0, bursts=(0.5, 1.5), burst_len=0.1):
    x = np.zeros(int(sr * duration), np.float32)
    t = np.arange(int(sr * burst_len)) / sr
    tone = np.sin(2 * np.pi * 880 * t).astype(np.float32)
    for b in bursts:
        i = int(b * sr)
        x[i : i + len(tone)] += tone
    return x


def test_detect_onsets_two_bursts():
    sr = 16000
    x = _burst_signal(sr=sr)
    onsets = spectral.detect_onsets(jnp.asarray(x), sr)
    assert len(onsets) >= 2
    # ±0.1 s tolerance (reference tests/test_a3_audio_onsets.py)
    assert min(abs(o - 0.5) for o in onsets) < 0.1
    assert min(abs(o - 1.5) for o in onsets) < 0.1
    # no spurious onsets far from the bursts
    for o in onsets:
        assert min(abs(o - 0.5), abs(o - 1.5)) < 0.15


def test_detect_onsets_silence():
    sr = 16000
    x = np.zeros(sr, np.float32)
    onsets = spectral.detect_onsets(jnp.asarray(x), sr)
    assert len(onsets) == 0


def test_peak_pick_wait_enforced():
    env = jnp.asarray(np.tile([0.0, 1.0], 50).astype(np.float32))
    mask = spectral.peak_pick_mask(env, 1, 1, 2, 2, 0.05, wait=5)
    picks = np.nonzero(np.asarray(mask))[0]
    assert (np.diff(picks) > 5).all()


# ---------------------------------------------------------------------------
# Nodes
# ---------------------------------------------------------------------------
def _make_run_dir(tmp_path, sr=44100, duration=2.0, stereo=True):
    ddir = tmp_path / "run"
    ddir.mkdir()
    t = np.arange(int(sr * duration)) / sr
    x = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    data = np.stack([x, x], axis=1) if stereo else x
    wav.write_wav(str(ddir / "audio.wav"), data, sr)
    return ddir


def test_a1_node_standardizes(tmp_path):
    ddir = _make_run_dir(tmp_path)
    state = State(data_dir=str(ddir), metadata={"duration": 2.0})
    delta = a1_standardize.run(state)
    assert delta["metadata"]["audio_sample_rate"] == 16000
    assert delta["metadata"]["audio_channels"] == 1
    out, sr = wav.read_wav(str(ddir / "audio_16k.wav"))
    assert sr == 16000
    assert out.ndim == 1
    assert len(out) == pytest.approx(32000, abs=2)


def test_a1_node_missing_audio_is_noop(tmp_path):
    ddir = tmp_path / "empty"
    ddir.mkdir()
    delta = a1_standardize.run(State(data_dir=str(ddir)))
    assert delta == {}


def test_a3_node_end_to_end(tmp_path):
    ddir = tmp_path / "run"
    ddir.mkdir()
    sr, duration, fps = 16000, 2.0, 30.0
    wav.write_wav(str(ddir / "audio_16k.wav"), _burst_signal(sr, duration), sr)
    state = State(data_dir=str(ddir), metadata={"duration": duration, "fps": fps})
    delta = a3_onsets.run(state)
    assert delta["onset_count"] == len(delta["audio_onsets"]) >= 2
    assert len(delta["audio_envelope"]) == int(duration * fps)
    assert min(abs(o - 0.5) for o in delta["audio_onsets"]) < 0.1
    # envelope peaks at burst positions
    env = np.asarray(delta["audio_envelope"])
    assert env[int(0.52 * fps)] > 5 * (env[int(1.0 * fps)] + 1e-9)
    # debug artifact written (LR recovery contract)
    assert (ddir / "A3_debug.json").exists()


def test_a3_node_missing_audio_is_noop(tmp_path):
    delta = a3_onsets.run(State(data_dir=str(tmp_path)))
    assert delta == {}
