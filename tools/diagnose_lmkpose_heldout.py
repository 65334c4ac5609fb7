"""Per-factor landmark + pose held-out diagnostic.

The held-out face renderer changes four factors at once (stripes,
out-of-range eccentricity/skin, accessories, in-plane rotation); the
detector's version of this tool (tools/diagnose_det_heldout.py)
attributed its gap per factor and drove three targeted finetunes.  This
does the same for the landmark regressor (0.83 % of crop held-out vs
0.55 in-domain) and the pose head (4.86 deg held-out vs 2.39 in-domain),
so any further training effort goes at the factor that matters — or the
numbers show a flat profile, i.e. the checkpoint is at its ceiling.

Crop conventions follow tools/eval_heldout.py (GT-box crop, resize 128;
pose additionally warps by a known rotation), but render_factored draws
its rng in a different order than render_face_heldout, so the rows —
including "ALL (held-out-like)" — are DISTRIBUTION-matched to
eval_heldout's held-out cells, not sample-identical reproductions at the
same seed (expect e.g. lmk ~1.08 here vs the 0.83 eval_heldout quotes).
Per-factor deltas, which are what this tool is for, are unaffected.

    python tools/diagnose_lmkpose_heldout.py [--n 64]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.diagnose_det_heldout import render_factored  # noqa: E402

CASES = [
    ("baseline (in-domain-like)", {}),
    ("stripes", {"stripes": True}),
    ("ecc_skin", {"ecc_skin": True}),
    ("accessories", {"accessories": True}),
    ("rotation", {"rotation": True}),
    ("ALL (held-out-like)", {"stripes": True, "ecc_skin": True,
                             "accessories": True, "rotation": True}),
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--lmk-ckpt", default=None)
    ap.add_argument("--pose-ckpt", default=None)
    args = ap.parse_args(argv)

    import fvd_tpu

    fvd_tpu.force_cpu()  # probe rule: never touch axon
    import cv2
    import jax
    import jax.numpy as jnp

    from fvd_tpu.models import landmarks_fan
    from fvd_tpu.models.synthetic_pose import (CROP_SIZE, euler_to_matrix,
                                               warp_by_rotation)

    ckpt_dir = os.path.join(os.path.dirname(__file__), "..", "checkpoints")
    lmk_tmpl = landmarks_fan.init_landmark_params(jax.random.PRNGKey(1), width=32)
    lmk_params = landmarks_fan.load_params(
        args.lmk_ckpt or os.path.join(ckpt_dir, "landmarks.npz"), lmk_tmpl)
    pose_path = args.pose_ckpt or os.path.join(ckpt_dir, "pose.npz")
    pose_width = 32
    if os.path.exists(pose_path.replace(".npz", ".json")):
        import json as _json

        with open(pose_path.replace(".npz", ".json")) as f:
            pose_width = int(_json.load(f).get("width", 32))
    pose_tmpl = landmarks_fan.init_pose_params(jax.random.PRNGKey(2),
                                               width=pose_width)
    pose_params = landmarks_fan.load_params(pose_path, pose_tmpl)

    def run_lmk(**factors) -> float:
        rng = np.random.RandomState(11)
        crops = np.zeros((args.n, 128, 128, 3), np.uint8)
        targets = np.zeros((args.n, 68, 2), np.float32)
        for i in range(args.n):
            img, box, pts = render_factored(rng, 256, aperture=rng.uniform(0, 1),
                                            **factors)
            x1, y1, x2, y2 = np.clip((box * 256).astype(int), 0, 256)
            sub = img[y1:y2, x1:x2]
            if sub.size == 0:
                sub, x1, y1, x2, y2 = img, 0, 0, 256, 256
            crops[i] = cv2.resize(sub, (128, 128))
            targets[i, :, 0] = (pts[:, 0] - x1) / max(x2 - x1, 1)
            targets[i, :, 1] = (pts[:, 1] - y1) / max(y2 - y1, 1)
        pred = np.asarray(landmarks_fan.landmarks_forward(
            lmk_params, jnp.asarray(crops), width=32))
        return float(np.linalg.norm(
            pred - np.clip(targets, 0, 1), axis=-1).mean() * 100.0)

    def run_pose(**factors) -> float:
        rng = np.random.RandomState(13)
        crops = np.zeros((args.n, CROP_SIZE, CROP_SIZE, 3), np.uint8)
        eulers = np.zeros((args.n, 3))
        for i in range(args.n):
            img, box, _ = render_factored(rng, 192, **factors)
            x1, y1, x2, y2 = np.clip((box * 192).astype(int), 0, 192)
            face = img[y1:y2, x1:x2]
            if face.size == 0:
                face = img
            face = cv2.resize(face, (CROP_SIZE, CROP_SIZE))
            ang = rng.uniform(-40, 40, 3)
            crops[i] = warp_by_rotation(face, euler_to_matrix(*ang))
            eulers[i] = ang
        pred = np.asarray(landmarks_fan.pose_forward(
            pose_params, jnp.asarray(crops), width=pose_width))
        return float(np.mean(np.abs(pred - eulers)))

    print(f"{'factor':28s} {'lmk % of crop':>14s} {'pose mean deg':>14s}",
          flush=True)
    for name, factors in CASES:
        print(f"{name:28s} {run_lmk(**factors):14.3f} "
              f"{run_pose(**factors):14.3f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
