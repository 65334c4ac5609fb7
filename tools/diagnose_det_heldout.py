"""Per-factor detector held-out diagnostic.

The held-out renderer (tools/eval_heldout.py) changes four things at once:
striped backgrounds, out-of-range eccentricity/skin, accessories
(glasses/hair), and in-plane rotation.  This tool toggles each factor
independently against the in-domain renderer to attribute the IoU drop,
so detector training effort goes at the factor that matters.

    python tools/diagnose_det_heldout.py [--n 64] [--ckpt checkpoints/face_ssd.npz]
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Tuple

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def render_factored(
    rng: np.random.RandomState, size: int = 300, *,
    stripes=False, ecc_skin=False, accessories=False, rotation=False,
    aperture=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    import cv2

    from fvd_tpu.models.synthetic_faces import draw_face

    if stripes:
        img = np.zeros((size, size, 3), np.uint8)
        base = rng.rand(3) * 150
        grad = np.linspace(0, 80, size)[:, None]
        for c in range(3):
            img[..., c] = np.clip(base[c] + grad + 25 * np.sin(
                np.arange(size)[None, :] / rng.uniform(6, 18)), 0, 255)
    else:
        img = (rng.rand(size, size, 3) * 60 + rng.rand(3) * 120).astype(np.uint8)
        img = cv2.blur(img, (5, 5))

    if ecc_skin:
        fw = rng.uniform(0.22, 0.62) * size
        fh = fw * (rng.uniform(1.0, 1.08) if rng.rand() < 0.5
                   else rng.uniform(1.45, 1.6))
        skin = np.array([rng.randint(130, 255), rng.randint(100, 210),
                         rng.randint(80, 200)])
    else:
        fw = rng.uniform(0.25, 0.6) * size
        fh = fw * rng.uniform(1.1, 1.4)
        skin = np.array([rng.randint(160, 230), rng.randint(120, 190),
                         rng.randint(100, 170)])
    cx = rng.uniform(fw / 2 + 2, size - fw / 2 - 2)
    cy = rng.uniform(fh / 2 + 2, size - fh / 2 - 2)
    pts = draw_face(img, cx, cy, fw, fh, skin, aperture)

    if accessories:
        dark = (skin * 0.3).astype(int).tolist()
        if rng.rand() < 0.6:
            for base_i in (36, 42):
                c = pts[base_i: base_i + 6].mean(axis=0).astype(int)
                cv2.circle(img, tuple(c), max(3, int(fw * 0.12)), dark, 2)
            l = pts[36:42].mean(axis=0).astype(int)
            r = pts[42:48].mean(axis=0).astype(int)
            cv2.line(img, tuple(l), tuple(r), dark, 2)
        if rng.rand() < 0.6:
            cv2.ellipse(img, (int(cx), int(cy - 0.1 * fh)),
                        (int(fw * 0.55), int(fh * 0.5)), 0, 180, 360, dark, -1)

    angle = rng.uniform(-12, 12) if rotation else 0.0
    if rotation:
        M = cv2.getRotationMatrix2D((cx, cy), angle, 1.0)
        img = cv2.warpAffine(img, M, (size, size), flags=cv2.INTER_LINEAR)
        pts = (pts @ M[:, :2].T) + M[:, 2]
    th = np.deg2rad(angle)
    a, b = fw / 2.0, fh / 2.0
    hw = float(np.sqrt((a * np.cos(th)) ** 2 + (b * np.sin(th)) ** 2))
    hh = float(np.sqrt((a * np.sin(th)) ** 2 + (b * np.cos(th)) ** 2))
    box = np.array([(cx - hw) / size, (cy - hh) / size,
                    (cx + hw) / size, (cy + hh) / size], np.float32)
    return img, np.clip(box, 0.0, 1.0), pts.astype(np.float32)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--ckpt", default=None)
    args = ap.parse_args(argv)

    import jax

    import fvd_tpu

    fvd_tpu.force_cpu()  # probe rule: never touch axon
    import jax.numpy as jnp

    from fvd_tpu.models import face_ssd
    from tools.eval_heldout import _iou

    ckpt = args.ckpt or os.path.join(
        os.path.dirname(__file__), "..", "checkpoints", "face_ssd.npz")
    params = face_ssd.load_params(ckpt)

    def run(**factors) -> float:
        rng = np.random.RandomState(7)
        frames = np.zeros((args.n, 300, 300, 3), np.uint8)
        gts = np.zeros((args.n, 4), np.float32)
        for i in range(args.n):
            frames[i], gts[i], _ = render_factored(rng, 300, **factors)
        boxes, _ = face_ssd.detect_batch_jit(params, jnp.asarray(frames))
        boxes = np.asarray(boxes)
        return float(np.mean([_iou(boxes[i, 0], gts[i])
                              for i in range(args.n)]))

    cases = [
        ("baseline (in-domain-like)", {}),
        ("stripes", {"stripes": True}),
        ("ecc_skin", {"ecc_skin": True}),
        ("accessories", {"accessories": True}),
        ("rotation", {"rotation": True}),
        ("ALL (held-out-like)", {"stripes": True, "ecc_skin": True,
                                 "accessories": True, "rotation": True}),
    ]
    for name, factors in cases:
        print(f"{name:28s} mean IoU {run(**factors):.3f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
