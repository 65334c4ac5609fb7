"""V3: mouth-landmark time series with robust tracking.

Reference behavior (``nodes/V_nodes/v3_mouth_landmarks_timeseries.py``):
sample at 5 fps, 2D landmarks per frame, IoU-based single-face tracking with
largest-face (re)acquisition, OneEuroFilter smoothing (min_cutoff 0.5,
beta 0.1), mouth points 48..68 recorded per sampled frame, annotated
``landmarks_viz.mp4``, ``metadata.landmark_model``.

TPU-native: frames decode once into a batch, the landmark model is a single
batched forward (provider), smoothing is one masked ``lax.scan`` over the
whole selected track (fvd_tpu.ops.filters.one_euro_scan) instead of a
per-frame mutated filter object.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import numpy as np

from fvd_tpu.config import Config, default_config
from fvd_tpu.nodes._tracking import FaceTracker, TrackerConfig, landmark_box
from fvd_tpu.ops.filters import one_euro_scan
from fvd_tpu.providers import Providers, get_providers
from fvd_tpu.providers.media import VideoReader, write_video
from fvd_tpu.runtime.debug import dump_node_debug
from fvd_tpu.state import State, StateDelta


def run(
    state: State,
    config: Config = default_config(),
    providers: Optional[Providers] = None,
) -> StateDelta:
    providers = providers or get_providers()
    cfg = config.landmarks
    output_dir = state.get("data_dir")
    if not output_dir or not os.path.exists(output_dir):
        print(f"V3: data directory not found at {output_dir}")
        return {}
    video_path = os.path.join(output_dir, "video.mp4")
    if not os.path.exists(video_path):
        print(f"V3: video file not found at {video_path}")
        return {}
    if providers.landmarks is None:
        print("V3: no landmark model configured; skipping.")
        return {}

    reader = VideoReader()
    frames, kept_ids, meta = reader.sample_at_fps(video_path, cfg.sample_fps)
    if len(kept_ids) == 0:
        print("V3: no frames decoded.")
        return {}
    fps = meta.fps

    # ONE batched landmark forward over all sampled frames.
    all_landmarks = providers.landmarks.landmarks_batch(frames)

    # Sequential track selection (ragged, host) -> dense [T, 68, 2] + mask.
    tracker = FaceTracker(
        TrackerConfig(
            frame_width=meta.width,
            frame_height=meta.height,
            min_face_frac=cfg.min_face_frac,
            iou_min=cfg.track_iou_min,
            aspect_gate=True,
            aspect_range=cfg.aspect_ratio_range,
        )
    )
    times = np.array([fid / fps if fps else i for i, fid in enumerate(kept_ids)], np.float64)
    n_pts = 68
    raw_track = np.zeros((len(kept_ids), n_pts, 2), np.float64)
    valid = np.zeros(len(kept_ids), bool)
    for i, lm_list in enumerate(all_landmarks):
        idx = tracker.select([np.asarray(lm)[:, :2] for lm in lm_list])
        if idx != -1:
            raw_track[i] = np.asarray(lm_list[idx])[:n_pts, :2]
            valid[i] = True

    # OneEuro smoothing: one masked scan over the full track (v3:204-209).
    smoothed = np.asarray(
        one_euro_scan(
            times,
            raw_track,
            valid,
            min_cutoff=cfg.landmark_min_cutoff,
            beta=cfg.landmark_beta,
        )
    )

    mouth_landmarks_data: List[Dict[str, Any]] = []
    viz_frames: List[np.ndarray] = []
    for i, fid in enumerate(kept_ids):
        frame_landmarks: List[List[float]] = []
        frame = frames[i].copy()
        if valid[i]:
            pts = smoothed[i]
            mouth_points = pts[48:68]
            if len(mouth_points) >= 20:
                frame_landmarks = mouth_points.tolist()
            # viz overlays (box + mouth points), reference v3:212-234
            try:
                import cv2

                x1, y1, x2, y2 = landmark_box(pts)
                cv2.rectangle(frame, (x1, y1), (x2, y2), (0, 0, 255), max(2, meta.width // 300))
                for (x, y) in mouth_points:
                    cv2.circle(frame, (int(x), int(y)), max(3, meta.width // 200), (0, 255, 0), -1)
            except Exception:
                pass
        viz_frames.append(frame)
        mouth_landmarks_data.append(
            {"frame_id": int(fid), "timestamp": float(times[i]), "landmarks": frame_landmarks}
        )

    viz_path = os.path.join(output_dir, "landmarks_viz.mp4")
    try:
        stride = max(1, int(round(fps / cfg.sample_fps))) if fps else 1
        viz_fps = max(1.0, fps / stride) if fps else 1.0
        write_video(viz_path, np.stack(viz_frames), viz_fps)
    except Exception as e:
        print(f"V3: viz write failed: {e}")
        viz_path = None

    metadata = dict(state.get("metadata", {}) or {})
    metadata["landmark_model"] = f"{providers.landmarks.model_name}_smoothed"

    dump_node_debug(
        output_dir,
        "V3",
        {"frames": len(mouth_landmarks_data), "viz_path": viz_path},
    )
    return {
        "mouth_landmarks": mouth_landmarks_data,
        "mouth_landmarks_viz_path": viz_path,
        "metadata": metadata,
    }
