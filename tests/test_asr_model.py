"""ASR stack tests.

The reference's A2 runs Whisper base (a2_vad_asr.py:27-30) and its unit
tests mock the model (tests/test_a2_vad_asr.py:24-56).  Here the compiled
encoder-decoder is real: a hermetic shape/contract test on a tiny random
model, plus a checkpoint test that proves the trained stack transcribes
tone-coded speech end-to-end (wav file -> log-mel -> while_loop greedy
decode -> text).
"""

import os

import numpy as np
import pytest

CKPT = os.path.join(os.path.dirname(__file__), "..", "checkpoints", "asr.npz")


def _write_tone_wav(tmp_path, text, name="utt.wav"):
    from fvd_tpu.synthetic import TONE_SR, tone_speech
    from fvd_tpu.utils.wav import write_wav

    path = str(tmp_path / name)
    write_wav(path, tone_speech(text, np.random.RandomState(0)), TONE_SR)
    return path


def test_jax_asr_contract(tmp_path):
    """Random-init model still returns the Whisper result shape."""
    from fvd_tpu.models.asr import JaxASR

    asr = JaxASR(dim=32, depth=1, chunk_frames=64, max_tokens=8)
    path = _write_tone_wav(tmp_path, "abc")
    result = asr.transcribe(path)
    assert result is not None
    assert set(result) == {"text", "segments"}
    for seg in result["segments"]:
        assert set(seg) == {"start", "end", "text"}
        assert seg["end"] > seg["start"]


def test_active_spans_vad():
    from fvd_tpu.models.asr import active_spans

    sr = 16000
    y = np.zeros(sr * 2, np.float32)
    y[4000:8000] = 0.3 * np.sin(np.arange(4000) * 0.3)
    y[20000:24000] = 0.3 * np.sin(np.arange(4000) * 0.3)
    spans = active_spans(y, sr)
    assert len(spans) == 2
    for (s0, s1), (lo, hi) in zip(spans, [(4000, 8000), (20000, 24000)]):
        assert s0 <= lo and s1 >= hi and s0 > lo - 1000 and s1 < hi + 1000
    assert active_spans(np.zeros(sr, np.float32), sr) == []


@pytest.mark.skipif(not os.path.exists(CKPT), reason="no trained ASR checkpoint")
def test_trained_asr_reads_long_form_gated_speech(tmp_path):
    """Long-form speech with real pauses (the shape of narrated video):
    VAD-windowed decode recovers the words across silence gaps — the
    capability the reference gets from Whisper's internal windowing
    (a2_vad_asr.py:27-30)."""
    from fvd_tpu.models.asr import JaxASR
    from fvd_tpu.synthetic import TONE_SR, gated_speech

    text = "the mayor said the city will cut taxes next year"
    audio = gated_speech(text, duration=15.0, gate_hz=1.0)
    asr = JaxASR.from_checkpoint(CKPT)
    got = asr.transcribe("", audio=audio)
    assert got is not None and got["segments"]
    ok = sum(a == b for a, b in zip(got["text"], text))
    assert ok / len(text) >= 0.8, f"char accuracy {ok}/{len(text)}: {got['text']!r}"
    # pauses are real: segments must not cover the whole clip
    covered = sum(s["end"] - s["start"] for s in got["segments"])
    assert covered < 10.0


@pytest.mark.skipif(not os.path.exists(CKPT), reason="no trained ASR checkpoint")
def test_trained_asr_reads_tone_speech(tmp_path):
    """The trained checkpoint transcribes in-domain utterances."""
    from fvd_tpu.models.asr import JaxASR

    asr = JaxASR.from_checkpoint(CKPT)
    # stay inside the trained length distribution (3-10 chars)
    utterances = ["hello", "fvd tpu", "deepfake"]
    ok = total = 0
    for i, text in enumerate(utterances):
        path = _write_tone_wav(tmp_path, text, f"utt{i}.wav")
        result = asr.transcribe(path)
        assert result is not None
        got = result["text"]
        total += len(text)
        ok += sum(a == b for a, b in zip(got, text))
    assert ok / total >= 0.6, f"char accuracy {ok}/{total}"


def test_formant_speech_synthesis_structure():
    """The formant synthesizer (models/synthetic_speech.py) renders
    speech-shaped audio: harmonic vowels at their formant targets, stop
    closures, fricative noise — the phoneme-like training domain the
    real-speech ASR capability rests on."""
    from fvd_tpu.models.synthetic_speech import SR, formant_speech

    rng = np.random.RandomState(0)
    a = formant_speech("the mayor said", rng)
    assert a.dtype == np.float32 and len(a) > SR  # ~1.3 s
    assert 0.2 < np.abs(a).max() <= 0.5

    # vowel 'a': spectral peak near F1=730 Hz
    seg = formant_speech("aaaa", rng)
    sp = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    freqs = np.fft.rfftfreq(len(seg), 1 / SR)
    band = (freqs > 200) & (freqs < 1200)
    peak = freqs[band][np.argmax(sp[band])]
    assert 550 < peak < 950, peak

    # fricative 's' carries most energy above 3 kHz; vowel 'a' does not
    def hf_ratio(x):
        s = np.abs(np.fft.rfft(x)) ** 2
        f = np.fft.rfftfreq(len(x), 1 / SR)
        return s[f > 3000].sum() / (s.sum() + 1e-9)

    assert hf_ratio(formant_speech("ssss", rng)) > 0.5
    assert hf_ratio(formant_speech("aaaa", rng)) < 0.2

    # deterministic for a fixed rng seed
    b = formant_speech("the mayor said", np.random.RandomState(0))
    c = formant_speech("the mayor said", np.random.RandomState(0))
    assert np.array_equal(b, c)


def test_formant_speech_hard_family():
    """The round-3 harder family (rate variation, coarticulation
    undershoot, F0 drift, reverb) keeps the trainer's contracts: same
    duration budget as the base renderer (the mel window never overflows),
    same normalization, deterministic per rng seed, and actually DIFFERENT
    audio from the base family."""
    from fvd_tpu.models.synthetic_speech import (PHONE_S, SR, formant_speech,
                                                 formant_speech_hard)

    for txt in ("hello world", "the river", "kxq zvt"):
        a = formant_speech_hard(txt, np.random.RandomState(3), variability=1.0)
        assert a.dtype == np.float32
        assert len(a) <= int(PHONE_S * SR) * len(txt) + 1
        assert 0.2 < np.abs(a).max() <= 0.5
        assert np.all(np.isfinite(a))
    b = formant_speech_hard("the mayor said", np.random.RandomState(5))
    c = formant_speech_hard("the mayor said", np.random.RandomState(5))
    assert np.array_equal(b, c)
    base = formant_speech("the mayor said", np.random.RandomState(5))
    n = min(len(b), len(base))
    assert not np.allclose(b[:n], base[:n])


@pytest.mark.skipif(not os.path.exists(CKPT), reason="no trained ASR checkpoint")
def test_transcribe_coalesced_matches_sequential():
    """Two videos' ASR decodes coalesced into one device program must
    produce the sequential results (providers/coalesce.py run_program)."""
    from fvd_tpu.models.asr import JaxASR
    from fvd_tpu.providers import coalesce
    from fvd_tpu.synthetic import gated_speech

    asr = JaxASR.from_checkpoint(CKPT)
    clips = [gated_speech("the mayor said the city", 6.0),
             gated_speech("the river level rose", 6.0)]
    seq = [asr.transcribe("", audio=a)["text"] for a in clips]

    deactivate = coalesce._activate_program_coalescer(max_wait_ms=50.0)
    try:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            par = [f.result()["text"] for f in
                   [pool.submit(asr.transcribe, "", audio=a) for a in clips]]
    finally:
        deactivate()
    assert par == seq
