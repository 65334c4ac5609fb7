"""Procedural head-pose dataset: frontal procedural faces perspective-warped
by known rotations.

The crop plane is lifted into 3D, rotated by R = Rz(roll)·Ry(yaw)·Rx(pitch)
(the decomposition inverted by
fvd_tpu.models.landmarks_fan.euler_from_matrix_deg), and re-projected with a
weak-perspective camera — giving (image, R) pairs to train the 6D pose head
without external data.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from fvd_tpu.models.landmarks_fan import CROP_SIZE
from fvd_tpu.models.synthetic_faces import photometric_randomize, render_face


def euler_to_matrix(pitch_deg: float, yaw_deg: float, roll_deg: float) -> np.ndarray:
    """R = Rz(roll) @ Ry(yaw) @ Rx(pitch) — the inverse of
    euler_from_matrix_deg's extraction (verified in tests)."""
    p, y, r = np.deg2rad([pitch_deg, yaw_deg, roll_deg])
    Rx = np.array([[1, 0, 0], [0, np.cos(p), -np.sin(p)], [0, np.sin(p), np.cos(p)]])
    Ry = np.array([[np.cos(y), 0, np.sin(y)], [0, 1, 0], [-np.sin(y), 0, np.cos(y)]])
    Rz = np.array([[np.cos(r), -np.sin(r), 0], [np.sin(r), np.cos(r), 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def warp_by_rotation(img: np.ndarray, R: np.ndarray, depth: float = 2.0) -> np.ndarray:
    """Rotate the image plane in 3D and re-project (weak perspective)."""
    import cv2

    h, w = img.shape[:2]
    half = np.array([w / 2, h / 2])
    corners = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], np.float64)
    src = (corners * half + half).astype(np.float32)

    pts3 = np.concatenate([corners, np.zeros((4, 1))], axis=1)  # unit plane, z=0
    rot = pts3 @ R.T
    z = rot[:, 2] + depth
    proj = rot[:, :2] * (depth / z[:, None])
    dst = (proj * half + half).astype(np.float32)

    M = cv2.getPerspectiveTransform(src, dst)
    return cv2.warpPerspective(img, M, (w, h), borderMode=cv2.BORDER_REPLICATE)


def pose_batch(
    rng: np.random.RandomState, batch: int, max_angle: float = 40.0,
    augment: bool = False, photometric: bool = False, shaded: bool = False,
    hard_half: bool = False, portrait: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (crops float [B, 128, 128, 3] 0..1, R [B, 3, 3], euler_deg [B, 3]).
    ``augment`` applies the robustness augmentations to half of each batch;
    ``photometric`` additionally domain-randomizes that half (the round-3
    data-realism lever, models/synthetic_faces.photometric_randomize).
    ``hard_half`` upgrades the WHOLE augmented half to hard renders
    (accessories at p 0.9 + dense occluders) instead of a quarter — the
    round-4 per-factor diagnostic pinned pose's held-out gap on the
    accessories factor (+1.6 deg, tools/diagnose_lmkpose_heldout.py)."""
    import cv2

    crops = np.zeros((batch, CROP_SIZE, CROP_SIZE, 3), np.float32)
    Rs = np.zeros((batch, 3, 3), np.float64)
    eulers = np.zeros((batch, 3), np.float64)
    for i in range(batch):
        aug_i = augment and i % 2 == 0
        img, box, _ = render_face(rng, 192, augment=aug_i,
                                  hard=aug_i if hard_half
                                  else (augment and i % 4 == 0),
                                  shaded=shaded and i % 4 != 3,
                                  # hair/jaw/hat structure rotates with the
                                  # head exactly like real accessory mass
                                  # (round-5 lever; accessories are pose's
                                  # binding held-out factor)
                                  portrait=portrait and aug_i)
        if photometric and augment and i % 2 == 0:
            img = photometric_randomize(img, rng)
        x1, y1, x2, y2 = (box * 192).astype(int)
        face = img[max(0, y1) : y2, max(0, x1) : x2]
        if face.size == 0:
            face = img
        face = cv2.resize(face, (CROP_SIZE, CROP_SIZE))
        pitch = rng.uniform(-max_angle, max_angle)
        yaw = rng.uniform(-max_angle, max_angle)
        roll = rng.uniform(-max_angle, max_angle)
        R = euler_to_matrix(pitch, yaw, roll)
        crops[i] = warp_by_rotation(face, R).astype(np.float32) / 255.0
        Rs[i] = R
        eulers[i] = (pitch, yaw, roll)
    return crops, Rs, eulers


def _accessory_pass(img: np.ndarray, box: np.ndarray, pts: np.ndarray,
                    rng: np.random.RandomState, size: int) -> np.ndarray:
    """Draw accessory strokes (landmark-anchored eye rings + bridge, crown
    cap, random occluders) on a COPY of an already-rendered face — the
    appearance perturbation half of the pose consistency pair.  Geometry
    ranges mirror synthetic_faces.render_face's augment branch; the eye
    rings anchor at the true eye-landmark centroids (pts 36-41 / 42-47),
    the convention the held-out renderer uses."""
    import cv2

    out = img.copy()
    x1, y1, x2, y2 = box * size
    cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
    fw, fh = max(x2 - x1, 8.0), max(y2 - y1, 8.0)
    face_mean = img[int(max(0, y1)):int(y2), int(max(0, x1)):int(x2)]
    base = face_mean.reshape(-1, 3).mean(axis=0) if face_mean.size else np.full(3, 128.0)
    stroke = tuple(int(c) for c in (base * rng.uniform(0.15, 0.6)))
    if rng.rand() < 0.7:  # eye rings + bridge bar at the landmark centroids
        l = pts[36:42].mean(axis=0).astype(int)
        r = pts[42:48].mean(axis=0).astype(int)
        rad = max(2, int(fw * rng.uniform(0.08, 0.16)))
        th = rng.randint(1, 4)
        cv2.circle(out, tuple(l), rad, stroke, th)
        cv2.circle(out, tuple(r), rad, stroke, th)
        cv2.line(out, tuple(l), tuple(r), stroke, th)
    if rng.rand() < 0.7:  # filled crown cap (hair/hat-like)
        cv2.ellipse(out, (int(cx), int(cy - rng.uniform(0.0, 0.2) * fh)),
                    (int(fw * rng.uniform(0.4, 0.62)),
                     int(fh * rng.uniform(0.35, 0.55))), 0, 180, 360, stroke, -1)
    for _ in range(rng.randint(1, 4)):  # free occluders
        color = tuple(int(c) for c in rng.randint(0, 255, 3))
        p = (rng.randint(0, size), rng.randint(0, size))
        if rng.rand() < 0.5:
            q = (p[0] + rng.randint(5, size // 4), p[1] + rng.randint(3, size // 6))
            cv2.rectangle(out, p, q, color, -1)
        else:
            cv2.ellipse(out, p, (rng.randint(4, size // 6), rng.randint(3, size // 8)),
                        rng.uniform(0, 180), 0, 360, color, -1)
    return out


def pose_batch_paired(
    rng: np.random.RandomState, batch: int, max_angle: float = 40.0,
    photometric: bool = False, shaded: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (cropsA, cropsB float [B,128,128,3] 0..1, R [B,3,3]): the SAME
    face under the SAME rotation, branch A clean and branch B with
    accessory strokes (+ optional photometric shift) — training pairs for
    the pose consistency loss.  The per-factor diagnostic pins pose's
    held-out gap on the accessories factor: what accessories change is the
    PREDICTION, not the geometry, so the divergence between the two
    branches is exactly the error being regularized away (reference
    capability anchor: SixDRepNet's real-capture robustness,
    /root/reference/nodes/V_nodes/v4_blink_headpose_dynamics.py:133-135)."""
    import cv2

    size = 192
    cropsA = np.zeros((batch, CROP_SIZE, CROP_SIZE, 3), np.float32)
    cropsB = np.zeros((batch, CROP_SIZE, CROP_SIZE, 3), np.float32)
    Rs = np.zeros((batch, 3, 3), np.float64)
    for i in range(batch):
        img, box, pts = render_face(rng, size,
                                    shaded=shaded and rng.rand() < 0.75)
        imgB = _accessory_pass(img, box, pts, rng, size)
        if photometric and rng.rand() < 0.5:
            imgB = photometric_randomize(imgB, rng)
        x1, y1, x2, y2 = (box * size).astype(int)
        R = euler_to_matrix(*rng.uniform(-max_angle, max_angle, 3))
        for crops, src in ((cropsA, img), (cropsB, imgB)):
            face = src[max(0, y1):y2, max(0, x1):x2]
            if face.size == 0:
                face = src
            face = cv2.resize(face, (CROP_SIZE, CROP_SIZE))
            crops[i] = warp_by_rotation(face, R).astype(np.float32) / 255.0
        Rs[i] = R
    return cropsA, cropsB, Rs
