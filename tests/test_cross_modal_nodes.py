"""C2/C3/V2/A2 node tests (reference tests/test_c2_gesture_check.py,
test_c3_openai_primary.py, test_c3_openai_fallback.py,
test_v2_ocr_overlays.py, test_a2_vad_asr.py semantics)."""

import os

import numpy as np
import pytest

from fvd_tpu.nodes import a2_asr, c2_gesture, c3_claims, v2_ocr
from fvd_tpu.providers import (
    Providers,
    ScriptedASR,
    ScriptedLLM,
    ScriptedOCR,
    StubClip,
)
from fvd_tpu.state import State
from fvd_tpu.utils.wav import write_wav


def _keyframe(tmp_path, frame_id=30):
    import cv2

    path = str(tmp_path / f"frame_{frame_id:06d}.jpg")
    cv2.imwrite(path, np.full((48, 64, 3), 128, np.uint8))
    return path


SEGMENTS = [{"start": 0.0, "end": 2.0, "text": "hello world"}]


# ---------------------------------------------------------------------------
# C2
# ---------------------------------------------------------------------------
def test_c2_consistent_above_threshold(tmp_path):
    state = State(
        keyframes=[_keyframe(tmp_path)],
        segments=SEGMENTS,
        metadata={"video_fps": 30.0},
    )
    providers = Providers(clip=StubClip(default=0.3))
    delta = c2_gesture.run(state, providers=providers)
    check = delta["gesture_check"][0]
    assert check["status"] == "Consistent"
    assert check["source"] == "clip_local"
    assert check["timestamp"] == pytest.approx(1.0)  # frame 30 at 30fps


def test_c2_inconsistent_below_threshold(tmp_path):
    state = State(keyframes=[_keyframe(tmp_path)], segments=SEGMENTS,
                  metadata={"video_fps": 30.0})
    delta = c2_gesture.run(state, providers=Providers(clip=StubClip(default=0.1)))
    assert delta["gesture_check"][0]["status"] == "Inconsistent"


def test_c2_ambiguous_triggers_llm_fallback(tmp_path):
    # 0.15 <= score <= 0.25 -> LLM decides (reference c2:126-171)
    state = State(keyframes=[_keyframe(tmp_path)], segments=SEGMENTS,
                  metadata={"video_fps": 30.0})
    llm = ScriptedLLM(default={"consistent": True, "reason": "matches"})
    delta = c2_gesture.run(state, providers=Providers(clip=StubClip(default=0.2), llm=llm))
    check = delta["gesture_check"][0]
    assert check["status"] == "Consistent"
    assert check["source"] == "llm_fallback"


def test_c2_ambiguous_no_llm_stays_ambiguous(tmp_path):
    state = State(keyframes=[_keyframe(tmp_path)], segments=SEGMENTS,
                  metadata={"video_fps": 30.0})
    delta = c2_gesture.run(state, providers=Providers(clip=StubClip(default=0.2)))
    assert delta["gesture_check"][0]["status"] == "Ambiguous (No API Key)"


def test_c2_no_segment_match_skipped(tmp_path):
    # frame at t=1s, nearest segment starts at 10s -> outside ±2s tolerance
    state = State(
        keyframes=[_keyframe(tmp_path)],
        segments=[{"start": 10.0, "end": 12.0, "text": "far away"}],
        metadata={"video_fps": 30.0},
    )
    delta = c2_gesture.run(state, providers=Providers())
    assert delta["gesture_check"] == []


def test_c2_no_keyframes_noop():
    assert c2_gesture.run(State(), providers=Providers()) == {}


def test_find_closest_segment_overlap_and_tolerance():
    segs = [{"start": 0.0, "end": 1.0, "text": "a"}, {"start": 6.0, "end": 7.0, "text": "b"}]
    assert c2_gesture.find_closest_segment(0.5, segs)["text"] == "a"
    assert c2_gesture.find_closest_segment(4.5, segs)["text"] == "b"   # within 2s of b
    assert c2_gesture.find_closest_segment(3.5, segs) is None          # > 2s from both


def test_parse_frame_id():
    assert c2_gesture.parse_frame_id("/x/frame_000123.jpg") == 123
    assert c2_gesture.parse_frame_id("/x/keyframe_7.png") == 7
    assert c2_gesture.parse_frame_id("/x/noid.jpg") == -1


# ---------------------------------------------------------------------------
# C3
# ---------------------------------------------------------------------------
def test_c3_primary_extraction():
    llm = ScriptedLLM(default={"claims": ["water boils at 100C", "the sky is green"]})
    state = State(transcript="some transcript", ocr_results=[])
    delta = c3_claims.run(state, providers=Providers(llm=llm))
    assert len(delta["claims"]) == 2
    claim = delta["claims"][0]
    assert claim["claim_text"] == claim["text"] == "water boils at 100C"
    assert claim["confidence"] == 0.95


def test_c3_includes_ocr_text_in_prompt():
    llm = ScriptedLLM(default={"claims": []})
    state = State(
        transcript="t",
        ocr_results=[{"keyframe_path": "x", "detections": [{"text": "BREAKING"}]}],
    )
    c3_claims.run(state, providers=Providers(llm=llm))
    assert "BREAKING" in llm.calls[0]["prompt"]


def test_c3_truncates_transcript():
    llm = ScriptedLLM(default={"claims": []})
    state = State(transcript="x" * 10000)
    c3_claims.run(state, providers=Providers(llm=llm))
    assert "x" * 4000 in llm.calls[0]["prompt"]
    assert "x" * 4001 not in llm.calls[0]["prompt"]


def test_c3_no_llm_empty_claims():
    delta = c3_claims.run(State(transcript="t"), providers=Providers())
    assert delta["claims"] == []


def test_c3_llm_failure_empty_claims():
    llm = ScriptedLLM(default=None)
    delta = c3_claims.run(State(transcript="t"), providers=Providers(llm=llm))
    assert delta["claims"] == []


# ---------------------------------------------------------------------------
# V2
# ---------------------------------------------------------------------------
def test_v2_collects_detections(tmp_path):
    kf = _keyframe(tmp_path)
    ocr = ScriptedOCR([{"text": "HELLO WORLD", "confidence": 0.93,
                        "bbox": [[1, 2], [50, 2], [50, 12], [1, 12]]}])
    delta = v2_ocr.run(State(keyframes=[kf]), providers=Providers(ocr=ocr))
    assert delta["ocr_results"][0]["keyframe_path"] == kf
    det = delta["ocr_results"][0]["detections"][0]
    assert det["text"] == "HELLO WORLD"
    assert det["bbox"][0] == [1, 2]
    assert delta["metadata"]["ocr_model"] == "scripted"


def test_v2_omits_frames_without_text(tmp_path):
    kf = _keyframe(tmp_path)
    delta = v2_ocr.run(State(keyframes=[kf]), providers=Providers())  # NullOCR
    assert delta["ocr_results"] == []


def test_v2_no_keyframes_noop():
    assert v2_ocr.run(State(), providers=Providers()) == {}


def test_v2_missing_file_skipped(tmp_path):
    delta = v2_ocr.run(
        State(keyframes=[str(tmp_path / "missing.jpg")]), providers=Providers()
    )
    assert delta["ocr_results"] == []


# ---------------------------------------------------------------------------
# A2
# ---------------------------------------------------------------------------
def _audio_dir(tmp_path):
    d = tmp_path / "run"
    d.mkdir()
    write_wav(str(d / "audio_16k.wav"), np.zeros(16000, np.float32), 16000)
    return str(d)


def test_a2_transcribes(tmp_path):
    asr = ScriptedASR("hello brave new world", [{"start": 0, "end": 1, "text": "hello"}])
    state = State(data_dir=_audio_dir(tmp_path))
    delta = a2_asr.run(state, providers=Providers(asr=asr))
    assert delta["transcript"] == "hello brave new world"
    assert delta["word_count"] == 4
    assert len(delta["segments"]) == 1
    assert delta["metadata"]["transcription_model"] == "scripted"


def test_a2_no_audio_noop(tmp_path):
    assert a2_asr.run(State(data_dir=str(tmp_path)), providers=Providers()) == {}


def test_a2_null_asr_noop(tmp_path):
    state = State(data_dir=_audio_dir(tmp_path))
    assert a2_asr.run(state, providers=Providers()) == {}


def test_energy_vad_segments(tmp_path):
    from fvd_tpu.providers.asr import EnergyVAD

    d = tmp_path / "vad"
    d.mkdir()
    sr = 16000
    t = np.arange(sr * 3) / sr
    gate = ((t >= 0.5) & (t < 1.0)) | ((t >= 2.0) & (t < 2.5))
    sig = (0.5 * np.sin(2 * np.pi * 300 * t) * gate).astype(np.float32)
    path = str(d / "audio_16k.wav")
    write_wav(path, sig, sr)
    result = EnergyVAD().transcribe(path)
    segs = result["segments"]
    assert len(segs) == 2
    assert segs[0]["start"] == pytest.approx(0.5, abs=0.15)
    assert segs[1]["start"] == pytest.approx(2.0, abs=0.15)
