"""Formant-synthesized speech for ASR training.

The reference transcribes real speech with Whisper base
(``nodes/A_nodes/a2_vad_asr.py:27-30``).  Without external weights or
data, the closest trainable-from-scratch analog is classic source-filter
formant synthesis: a glottal pulse train filtered through per-phoneme
resonators (vowels), plus shaped-noise bursts and closures (consonants),
with linear formant interpolation across phoneme boundaries
(coarticulation).  Unlike the tone-coded alphabet (``synthetic.tone_speech``
— one sine per character), this audio has the *structure* of speech:
harmonic voicing, formant transitions, plosive gaps, fricative noise —
so an ASR trained on it must solve a genuinely speech-shaped inverse
problem (many-to-one spectra, context-dependent cues), not a frequency
lookup.

Pure numpy (the 1-core host rule: no tiny device dispatches in data
loops).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

SR = 16000
F0 = 115.0          # glottal pitch (Hz); jittered per utterance
PHONE_S = 0.095     # nominal per-letter duration
ALPHABET = "abcdefghijklmnopqrstuvwxyz "

#: vowels: (F1, F2, F3) steady-state targets (classic Peterson-Barney-ish)
_VOWELS: Dict[str, Tuple[float, float, float]] = {
    "a": (730.0, 1090.0, 2440.0),
    "e": (530.0, 1840.0, 2480.0),
    "i": (270.0, 2290.0, 3010.0),
    "o": (570.0, 840.0, 2410.0),
    "u": (300.0, 870.0, 2240.0),
    "y": (300.0, 2100.0, 2900.0),
}

#: approximants/nasals: voiced, with their own formant targets
_SONORANTS: Dict[str, Tuple[float, float, float]] = {
    "l": (360.0, 1300.0, 2700.0),
    "r": (420.0, 1300.0, 1600.0),
    "m": (250.0, 1000.0, 2200.0),
    "n": (250.0, 1700.0, 2600.0),
    "w": (290.0, 700.0, 2300.0),
    "h": (500.0, 1500.0, 2500.0),
}

#: fricatives: (noise band center, bandwidth, voiced?)
_FRICATIVES: Dict[str, Tuple[float, float, bool]] = {
    "s": (5500.0, 2500.0, False),
    "z": (5500.0, 2500.0, True),
    "f": (4200.0, 3500.0, False),
    "v": (4200.0, 3500.0, True),
    "x": (3400.0, 2400.0, False),
    "j": (2800.0, 1800.0, True),
    "c": (3000.0, 2000.0, False),
    "q": (2200.0, 1500.0, False),
}

#: stops: (burst band center, voiced?) — closure gap then a noise burst
_STOPS: Dict[str, Tuple[float, bool]] = {
    "p": (1200.0, False),
    "b": (1200.0, True),
    "t": (4000.0, False),
    "d": (4000.0, True),
    "k": (2200.0, False),
    "g": (2200.0, True),
}


def _resonator(x: np.ndarray, freq: float, bw: float, sr: int = SR) -> np.ndarray:
    """Second-order all-pole resonator (the formant filter of a classic
    Klatt-style synthesizer), streamed with scipy's lfilter."""
    from scipy.signal import lfilter

    r = np.exp(-np.pi * bw / sr)
    theta = 2.0 * np.pi * freq / sr
    a = [1.0, -2.0 * r * np.cos(theta), r * r]
    gain = (1.0 - r) * np.sqrt(1.0 - 2.0 * r * np.cos(2 * theta) + r * r)
    return lfilter([gain], a, x)


def _glottal_source(n: int, f0: float, rng: np.random.RandomState,
                    f0_track: np.ndarray | None = None) -> np.ndarray:
    """Impulse-ish train with shimmer/jitter — the voiced excitation.

    ``f0_track`` (optional, [n]): per-sample pitch for prosodic drift —
    each pulse period is read from the local track value."""
    out = np.zeros(n, np.float32)
    t = 0.0
    while t < n:
        i = int(t)
        if i < n:
            out[i] = 1.0 + 0.1 * rng.randn()
        local_f0 = float(f0_track[min(i, n - 1)]) if f0_track is not None else f0
        t += (SR / max(local_f0, 40.0)) * (1.0 + 0.01 * rng.randn())
    # one-pole lowpass to soften the pulses (glottal rolloff)
    from scipy.signal import lfilter

    return lfilter([1.0], [1.0, -0.9], out).astype(np.float32)


def _segments(text: str) -> List[Tuple[str, str]]:
    """letters -> (kind, char) segment list; kinds: vowel / sonorant /
    fricative / stop / space."""
    segs = []
    for ch in text:
        if ch in _VOWELS:
            segs.append(("vowel", ch))
        elif ch in _SONORANTS:
            segs.append(("sonorant", ch))
        elif ch in _FRICATIVES:
            segs.append(("fricative", ch))
        elif ch in _STOPS:
            segs.append(("stop", ch))
        else:
            segs.append(("space", ch))
    return segs


def formant_speech(text: str, rng: np.random.RandomState | None = None,
                   f0: float | None = None) -> np.ndarray:
    """Synthesize ``text`` (lowercase letters + spaces) -> float32 PCM at
    16 kHz.  Voiced segments share one continuous glottal source filtered
    through formant tracks that interpolate across segment boundaries;
    consonants contribute closures and shaped noise."""
    rng = rng or np.random.RandomState(0)
    f0 = f0 or F0 * (1.0 + 0.15 * (rng.rand() - 0.5))
    segs = _segments(text.lower())
    if not segs:
        return np.zeros(int(PHONE_S * SR), np.float32)

    n_seg = int(PHONE_S * SR)
    total = n_seg * len(segs)

    # formant target track per segment (NaN: unvoiced/silent)
    targets = np.full((len(segs), 3), np.nan)
    voiced_amp = np.zeros(len(segs))
    for i, (kind, ch) in enumerate(segs):
        if kind == "vowel":
            targets[i] = _VOWELS[ch]
            voiced_amp[i] = 1.0
        elif kind == "sonorant":
            targets[i] = _SONORANTS[ch]
            voiced_amp[i] = 0.7
        elif kind == "fricative" and _FRICATIVES[ch][2]:
            voiced_amp[i] = 0.25  # voiced fricatives keep some buzz

    # continuous formant tracks: linear interp between voiced segment
    # centers (coarticulation); unvoiced gaps inherit neighbors
    centers = (np.arange(len(segs)) + 0.5) * n_seg
    sample_t = np.arange(total)
    tracks = np.zeros((3, total), np.float32)
    voiced_idx = np.where(~np.isnan(targets[:, 0]))[0]
    for k in range(3):
        if len(voiced_idx) == 0:
            tracks[k] = 500.0 * (k + 1)
        else:
            tracks[k] = np.interp(sample_t, centers[voiced_idx],
                                  targets[voiced_idx, k])

    # voiced amplitude envelope with soft onsets/offsets
    amp = np.repeat(voiced_amp, n_seg).astype(np.float32)
    ramp = np.ones(n_seg, np.float32)
    edge = max(1, n_seg // 6)
    ramp[:edge] = np.linspace(0, 1, edge)
    ramp[-edge:] = np.linspace(1, 0, edge)
    amp *= np.tile(ramp, len(segs))

    source = _glottal_source(total, f0, rng) * amp

    # piecewise-constant formant filtering per segment (tracks move slowly;
    # per-segment resonators with interpolated center freqs approximate a
    # time-varying filter without per-sample IIR updates)
    voiced = np.zeros(total, np.float32)
    for i in range(len(segs)):
        lo, hi = i * n_seg, (i + 1) * n_seg
        if voiced_amp[i] <= 0:
            continue
        seg = source[lo:hi]
        acc = np.zeros(n_seg, np.float32)
        for k, bw in enumerate((60.0, 90.0, 150.0)):
            fk = float(np.mean(tracks[k, lo:hi]))
            acc += _resonator(seg, fk, bw).astype(np.float32) * (1.0, 0.63, 0.32)[k]
        voiced[lo:hi] = acc

    # consonant noise: fricative bands and stop bursts
    noise_part = np.zeros(total, np.float32)
    for i, (kind, ch) in enumerate(segs):
        lo, hi = i * n_seg, (i + 1) * n_seg
        if kind == "fricative":
            band, bw, _ = _FRICATIVES[ch]
            noise = rng.randn(n_seg).astype(np.float32)
            noise_part[lo:hi] += 0.5 * _resonator(noise, band, bw).astype(np.float32)
        elif kind == "stop":
            band, voiced_stop = _STOPS[ch]
            # closure (silence) for the first 60%, then a burst
            burst = np.zeros(n_seg, np.float32)
            b0 = int(n_seg * 0.6)
            burst[b0:] = rng.randn(n_seg - b0)
            burst[b0:] *= np.exp(-np.linspace(0, 6, n_seg - b0))
            noise_part[lo:hi] += 0.9 * _resonator(burst, band, 800.0).astype(np.float32)
            if voiced_stop:
                noise_part[lo:hi] += 0.15 * _glottal_source(n_seg, f0, rng)

    out = voiced + noise_part
    peak = np.max(np.abs(out)) + 1e-9
    return (0.4 * out / peak).astype(np.float32)


def formant_speech_hard(text: str, rng: np.random.RandomState | None = None,
                        f0: float | None = None,
                        variability: float = 1.0) -> np.ndarray:
    """The HARDER speech family (round-3 ASR data lever, VERDICT r2 #4):
    the same source-filter synthesis as :func:`formant_speech` plus four
    real-speech variation axes the fixed-grid family lacks —

    * **rate variation**: per-segment duration jitter (log-normal), total
      renormalized to the nominal utterance budget so the mel window the
      trainer pads to never overflows — segmentation can no longer rely on
      a fixed phone grid;
    * **coarticulation undershoot**: voiced formant targets pulled toward
      their neighbors' mean (fast speech never reaches canonical targets);
    * **prosodic F0 drift**: a slow random pitch contour instead of a
      constant glottal period;
    * **room reverb**: convolution with an exponentially-decaying noise
      impulse response (wet mix scaled by ``variability``).

    ``variability=0`` degenerates to (approximately) the base family; the
    shipped-checkpoint base renderer stays byte-identical via
    :func:`formant_speech`, so existing evals and `make_face_video` audio
    are untouched.
    """
    rng = rng or np.random.RandomState(0)
    v = float(variability)
    f0 = f0 or F0 * (1.0 + 0.15 * (rng.rand() - 0.5))
    segs = _segments(text.lower())
    if not segs:
        return np.zeros(int(PHONE_S * SR), np.float32)

    n_nom = int(PHONE_S * SR)
    total = n_nom * len(segs)

    # per-segment durations: log-normal jitter, renormalized to the nominal
    # total (duration redistributes between segments; budget never grows)
    rates = np.exp(rng.uniform(-0.45, 0.45, len(segs)) * v)
    rates *= len(segs) / rates.sum()
    seg_lens = np.maximum((rates * n_nom).astype(int), n_nom // 3)
    seg_lens[-1] = max(total - int(seg_lens[:-1].sum()), n_nom // 3)
    bounds = np.concatenate([[0], np.cumsum(seg_lens)]).astype(int)
    total = int(bounds[-1])

    targets = np.full((len(segs), 3), np.nan)
    voiced_amp = np.zeros(len(segs))
    for i, (kind, ch) in enumerate(segs):
        if kind == "vowel":
            targets[i] = _VOWELS[ch]
            voiced_amp[i] = 1.0
        elif kind == "sonorant":
            targets[i] = _SONORANTS[ch]
            voiced_amp[i] = 0.7
        elif kind == "fricative" and _FRICATIVES[ch][2]:
            voiced_amp[i] = 0.25

    # coarticulation undershoot: pull each voiced target toward the mean of
    # its voiced neighbors
    voiced_idx = np.where(~np.isnan(targets[:, 0]))[0]
    if len(voiced_idx) >= 2 and v > 0:
        pulled = targets[voiced_idx].copy()
        for j, i in enumerate(voiced_idx):
            nb = [voiced_idx[k] for k in (j - 1, j + 1)
                  if 0 <= k < len(voiced_idx)]
            alpha = rng.uniform(0.0, 0.35) * v
            pulled[j] = (1 - alpha) * targets[i] + alpha * targets[nb].mean(axis=0)
        targets[voiced_idx] = pulled

    centers = (bounds[:-1] + bounds[1:]) / 2.0
    sample_t = np.arange(total)
    tracks = np.zeros((3, total), np.float32)
    for k in range(3):
        if len(voiced_idx) == 0:
            tracks[k] = 500.0 * (k + 1)
        else:
            tracks[k] = np.interp(sample_t, centers[voiced_idx],
                                  targets[voiced_idx, k])

    # amplitude envelope with per-segment edge ramps
    amp = np.zeros(total, np.float32)
    for i in range(len(segs)):
        lo, hi = bounds[i], bounds[i + 1]
        n_i = hi - lo
        ramp = np.ones(n_i, np.float32)
        edge = max(1, n_i // 6)
        ramp[:edge] = np.linspace(0, 1, edge)
        ramp[-edge:] = np.linspace(1, 0, edge)
        amp[lo:hi] = voiced_amp[i] * ramp

    # prosodic F0 drift: smooth random contour (random walk low-passed)
    if v > 0:
        knots = 1.0 + 0.12 * v * np.cumsum(rng.randn(8))
        knots /= np.abs(knots).mean() + 1e-9
        f0_track = (f0 * np.interp(sample_t, np.linspace(0, total - 1, 8),
                                   np.clip(knots, 0.7, 1.4))).astype(np.float32)
    else:
        f0_track = None
    source = _glottal_source(total, f0, rng, f0_track=f0_track) * amp

    voiced = np.zeros(total, np.float32)
    for i in range(len(segs)):
        lo, hi = bounds[i], bounds[i + 1]
        if voiced_amp[i] <= 0:
            continue
        seg = source[lo:hi]
        acc = np.zeros(hi - lo, np.float32)
        for k, bw in enumerate((60.0, 90.0, 150.0)):
            fk = float(np.mean(tracks[k, lo:hi]))
            acc += _resonator(seg, fk, bw).astype(np.float32) * (1.0, 0.63, 0.32)[k]
        voiced[lo:hi] = acc

    noise_part = np.zeros(total, np.float32)
    for i, (kind, ch) in enumerate(segs):
        lo, hi = bounds[i], bounds[i + 1]
        n_i = hi - lo
        if kind == "fricative":
            band, bw, _ = _FRICATIVES[ch]
            noise = rng.randn(n_i).astype(np.float32)
            noise_part[lo:hi] += 0.5 * _resonator(noise, band, bw).astype(np.float32)
        elif kind == "stop":
            band, voiced_stop = _STOPS[ch]
            burst = np.zeros(n_i, np.float32)
            b0 = int(n_i * 0.6)
            burst[b0:] = rng.randn(n_i - b0)
            burst[b0:] *= np.exp(-np.linspace(0, 6, n_i - b0))
            noise_part[lo:hi] += 0.9 * _resonator(burst, band, 800.0).astype(np.float32)
            if voiced_stop:
                noise_part[lo:hi] += 0.15 * _glottal_source(n_i, f0, rng)

    out = voiced + noise_part

    # room reverb: exponentially-decaying noise IR, truncated convolution
    if v > 0 and rng.rand() < 0.8:
        from scipy.signal import fftconvolve

        ir_len = int(SR * rng.uniform(0.06, 0.14))
        tt = np.arange(ir_len) / SR
        ir = rng.randn(ir_len).astype(np.float32) * np.exp(
            -tt / rng.uniform(0.015, 0.05)).astype(np.float32)
        ir[0] = 1.0
        ir /= np.abs(ir).sum() + 1e-9
        wet = rng.uniform(0.1, 0.35) * v
        out = ((1 - wet) * out
               + wet * fftconvolve(out, ir)[:total].astype(np.float32))

    peak = np.max(np.abs(out)) + 1e-9
    return (0.4 * out / peak).astype(np.float32)
