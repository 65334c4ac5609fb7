"""C1: lip-sync scoring node.

Host shell around the fused device kernel (fvd_tpu.ops.lipsync).  Early-out
semantics match the reference exactly (``c1_lip_sync_score.py:29-97``):

* no ``face_detections``      -> 0.0   (c1:35-39)
* no ``mouth_landmarks``      -> 0.0   (c1:50-53)
* no fps or duration          -> 0.0   (c1:55-58)
* no audio signal             -> 0.0   (c1:94-97)
* ``test_audio_signal`` state hook takes priority over ``audio_envelope``
  (c1:45-46, 89-92).

Signal preparation (MAR per landmark sample, interpolation of both signals
onto the ``duration*fps`` grid, length reconciliation) mirrors c1:60-105.
"""

from __future__ import annotations

import numpy as np

from fvd_tpu.config import Config, default_config
from fvd_tpu.ops import lipsync
from fvd_tpu.runtime.debug import dump_node_debug
from fvd_tpu.state import State, StateDelta


def calculate_mar(mouth_points) -> float:
    """Scalar MAR for one 20-point mouth (c1:9-27)."""
    if mouth_points is None or len(mouth_points) < 20:
        return 0.0
    m = np.asarray(mouth_points, dtype=np.float64)
    A = np.linalg.norm(m[2] - m[10])
    B = np.linalg.norm(m[3] - m[9])
    C = np.linalg.norm(m[4] - m[8])
    D = np.linalg.norm(m[0] - m[6])
    if D == 0:
        return 0.0
    return float((A + B + C) / (3.0 * D))


def run(state: State, config: Config = default_config()) -> StateDelta:
    cfg = config.lip_sync
    face_detections = state.get("face_detections") or []
    if len(face_detections) == 0:
        print(" C1: no faces detected upstream; lip-sync score 0.0")
        return {"lip_sync_score": 0.0}

    mouth_landmarks = state.get("mouth_landmarks")
    if not mouth_landmarks:
        print(" C1: missing mouth landmarks; lip-sync score 0.0")
        return {"lip_sync_score": 0.0}

    metadata = state.get("metadata", {}) or {}
    fps = metadata.get("fps")
    duration = metadata.get("duration")
    if not fps or not duration:
        print(" C1: missing fps/duration; lip-sync score 0.0")
        return {"lip_sync_score": 0.0}

    # Visual signal: MAR per sample, interpolated to the constant-fps grid
    # (c1:60-85).
    num_frames = int(duration * fps)
    time_axis = np.linspace(0, duration, num_frames)
    timestamps, mars = [], []
    for lm in mouth_landmarks:
        timestamps.append(lm.get("timestamp", 0.0))
        if "mar" in lm:
            mars.append(float(lm["mar"]))
        elif "landmarks" in lm:
            pts = lm["landmarks"]
            mars.append(calculate_mar(pts) if pts else 0.0)
        else:
            mars.append(0.0)
    if not timestamps:
        return {"lip_sync_score": 0.0}
    mouth_signal = np.interp(time_axis, timestamps, mars)

    # Audio signal: test hook first, then A3 envelope (c1:87-97).
    test_signal = state.get("test_audio_signal")
    envelope = state.get("audio_envelope")
    if test_signal is not None:
        audio_signal = np.asarray(test_signal, dtype=np.float64)
    elif envelope is not None:
        audio_signal = np.asarray(envelope, dtype=np.float64)
    else:
        print(" C1: no audio signal available; lip-sync score 0.0")
        return {"lip_sync_score": 0.0}

    # Length reconciliation (c1:99-105).
    if len(audio_signal) != len(mouth_signal):
        audio_signal = np.interp(
            np.linspace(0, 1, len(mouth_signal)),
            np.linspace(0, 1, len(audio_signal)),
            audio_signal,
        )

    kwargs = dict(
        window_duration_s=cfg.window_duration_s,
        max_lag_s=cfg.max_lag_s,
        silence_std=cfg.silence_std_threshold,
        sharpness_threshold=cfg.sharpness_threshold,
        sharpness_penalty=cfg.sharpness_penalty,
    )
    from fvd_tpu.providers.coalesce import program_coalescing_active, run_program

    if program_coalescing_active():
        # multi-video overlap: same-length signal pairs score as ONE
        # batched XLA dispatch + fetch (numerics identical to the
        # single-video Pallas/XLA kernel, tested)
        def _run_batch(pairs):
            mouths = np.stack([m for m, _ in pairs]).astype(np.float32)
            audios = np.stack([a for _, a in pairs]).astype(np.float32)
            return lipsync.lip_sync_score_batch(mouths, audios, fps, **kwargs)

        result = run_program(
            "c1_lipsync",
            (len(mouth_signal), float(fps)) + tuple(sorted(kwargs.items())),
            (mouth_signal, audio_signal), _run_batch)
    else:
        result = lipsync.lip_sync_score(mouth_signal, audio_signal, fps, **kwargs)
    score = float(result.score)

    dump_node_debug(
        state.get("data_dir"),
        "C1",
        {
            "lip_sync_score": score,
            "mouth_samples": len(mouth_landmarks),
            "audio_len": int(len(audio_signal)),
            "windows": int(result.n_windows),
            "valid_windows": int(result.n_valid),
        },
    )
    print(f" C1: lip-sync score {score:.4f}")
    return {"lip_sync_score": score}
