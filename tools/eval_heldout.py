"""Held-out evaluation for the trained vision/OCR models.

The round-1 quality numbers were measured on the same generator families
the models were trained on.  This tool adds a *held-out* distribution per
model — different parametrization, not just a different seed — and reports
both columns side by side (VERDICT round-1, weak #6):

* faces (detector/landmarks/pose): rotated faces, out-of-range
  eccentricity and skin tones, striped gradient backgrounds, glasses +
  hair accessories the training renderer never draws;
* OCR: different cv2 font faces (DUPLEX/COMPLEX/TRIPLEX + italic) — the
  training renderer only ever draws FONT_HERSHEY_SIMPLEX.

    python tools/eval_heldout.py [--n 64] [--json out.json] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Tuple

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "checkpoints")  # overridable via --ckpt-dir


# ---------------------------------------------------------------------------
# Held-out face renderer
# ---------------------------------------------------------------------------
def render_face_heldout(
    rng: np.random.RandomState, size: int = 300, aperture: float | None = None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Same contract as models.synthetic_faces.render_face, different
    distribution: rotation, eccentricity/skin outside the training ranges,
    striped backgrounds, glasses and hair."""
    import cv2

    from fvd_tpu.models.synthetic_faces import draw_face

    # striped gradient background (training uses blurred uniform noise)
    img = np.zeros((size, size, 3), np.uint8)
    base = rng.rand(3) * 150
    grad = np.linspace(0, 80, size)[:, None]
    for c in range(3):
        img[..., c] = np.clip(base[c] + grad + 25 * np.sin(
            np.arange(size)[None, :] / rng.uniform(6, 18)), 0, 255)

    # eccentricity outside [1.1, 1.4]; size range slightly wider
    fw = rng.uniform(0.22, 0.62) * size
    fh = fw * (rng.uniform(1.0, 1.08) if rng.rand() < 0.5 else rng.uniform(1.45, 1.6))
    cx = rng.uniform(fw / 2 + 2, size - fw / 2 - 2)
    cy = rng.uniform(fh / 2 + 2, size - fh / 2 - 2)

    # skin tones at/beyond the training range edges
    skin = np.array([rng.randint(130, 255), rng.randint(100, 210),
                     rng.randint(80, 200)])
    pts = draw_face(img, cx, cy, fw, fh, skin, aperture)

    # accessories the training renderer never draws
    dark = (skin * 0.3).astype(int).tolist()
    if rng.rand() < 0.6:  # glasses
        for base_i in (36, 42):
            c = pts[base_i: base_i + 6].mean(axis=0).astype(int)
            cv2.circle(img, tuple(c), max(3, int(fw * 0.12)), dark, 2)
        l = pts[36:42].mean(axis=0).astype(int)
        r = pts[42:48].mean(axis=0).astype(int)
        cv2.line(img, tuple(l), tuple(r), dark, 2)
    if rng.rand() < 0.6:  # hair arc over the crown
        cv2.ellipse(img, (int(cx), int(cy - 0.1 * fh)),
                    (int(fw * 0.55), int(fh * 0.5)), 0, 180, 360, dark, -1)

    # in-plane rotation (training is always upright)
    angle = rng.uniform(-12, 12)
    M = cv2.getRotationMatrix2D((cx, cy), angle, 1.0)
    img = cv2.warpAffine(img, M, (size, size), flags=cv2.INTER_LINEAR)
    pts = (pts @ M[:, :2].T) + M[:, 2]

    # gt = exact bbox of the rotated face ellipse (the training-box
    # convention; a landmarks bbox clips the forehead)
    th = np.deg2rad(angle)
    a, b = fw / 2.0, fh / 2.0
    hw = float(np.sqrt((a * np.cos(th)) ** 2 + (b * np.sin(th)) ** 2))
    hh = float(np.sqrt((a * np.sin(th)) ** 2 + (b * np.cos(th)) ** 2))
    box = np.array([(cx - hw) / size, (cy - hh) / size,
                    (cx + hw) / size, (cy + hh) / size], np.float32)
    return img, np.clip(box, 0.0, 1.0), pts.astype(np.float32)


def _iou(a: np.ndarray, b: np.ndarray) -> float:
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return float(inter / ua) if ua > 0 else 0.0


# ---------------------------------------------------------------------------
# Evaluations (each returns {"in_domain": x, "held_out": y})
# ---------------------------------------------------------------------------
def eval_detector(n: int, seed: int = 7):
    import jax.numpy as jnp

    from fvd_tpu.models import face_ssd
    from fvd_tpu.models.synthetic_faces import render_face

    params = face_ssd.load_params(os.path.join(CKPT, "face_ssd.npz"))

    def run(renderer):
        rng = np.random.RandomState(seed)
        frames = np.zeros((n, 300, 300, 3), np.uint8)
        gts = np.zeros((n, 4), np.float32)
        for i in range(n):
            img, box, _ = renderer(rng, 300)
            frames[i], gts[i] = img, box
        boxes, scores = face_ssd.detect_batch_jit(params, jnp.asarray(frames))
        boxes = np.asarray(boxes)
        return float(np.mean([_iou(boxes[i, 0], gts[i]) for i in range(n)]))

    return {"in_domain": run(render_face), "held_out": run(render_face_heldout)}


def eval_landmarks(n: int, seed: int = 11):
    import cv2
    import jax
    import jax.numpy as jnp

    from fvd_tpu.models import landmarks_fan

    template = landmarks_fan.init_landmark_params(jax.random.PRNGKey(1), width=32)
    params = landmarks_fan.load_params(os.path.join(CKPT, "landmarks.npz"), template)

    def run(renderer):
        rng = np.random.RandomState(seed)
        crop = 128
        crops = np.zeros((n, crop, crop, 3), np.uint8)
        targets = np.zeros((n, 68, 2), np.float32)
        for i in range(n):
            img, box, pts = renderer(rng, 256, aperture=rng.uniform(0, 1))
            x1, y1, x2, y2 = np.clip((box * 256).astype(int), 0, 256)
            sub = img[y1:y2, x1:x2]
            if sub.size == 0:
                sub, x1, y1, x2, y2 = img, 0, 0, 256, 256
            crops[i] = cv2.resize(sub, (crop, crop))
            targets[i, :, 0] = (pts[:, 0] - x1) / max(x2 - x1, 1)
            targets[i, :, 1] = (pts[:, 1] - y1) / max(y2 - y1, 1)
        pred = np.asarray(landmarks_fan.landmarks_forward(
            params, jnp.asarray(crops), width=32))
        err = np.linalg.norm(pred - np.clip(targets, 0, 1), axis=-1).mean()
        return float(err * 100.0)  # % of crop extent

    from fvd_tpu.models.synthetic_faces import render_face

    return {"in_domain": run(render_face), "held_out": run(render_face_heldout),
            "unit": "% of crop (lower better)"}


def eval_pose(n: int, seed: int = 13):
    import cv2
    import jax
    import jax.numpy as jnp

    from fvd_tpu.models import landmarks_fan
    from fvd_tpu.models.synthetic_pose import CROP_SIZE, euler_to_matrix, warp_by_rotation

    pose_ckpt = os.path.join(CKPT, "pose.npz")
    pose_width = 32
    if os.path.exists(pose_ckpt.replace(".npz", ".json")):
        import json as _json

        with open(pose_ckpt.replace(".npz", ".json")) as f:
            pose_width = int(_json.load(f).get("width", 32))
    template = landmarks_fan.init_pose_params(jax.random.PRNGKey(2),
                                              width=pose_width)
    params = landmarks_fan.load_params(pose_ckpt, template)

    def run(renderer):
        rng = np.random.RandomState(seed)
        crops = np.zeros((n, CROP_SIZE, CROP_SIZE, 3), np.uint8)
        eulers = np.zeros((n, 3))
        for i in range(n):
            img, box, _ = renderer(rng, 192)
            x1, y1, x2, y2 = np.clip((box * 192).astype(int), 0, 192)
            face = img[y1:y2, x1:x2]
            if face.size == 0:
                face = img
            face = cv2.resize(face, (CROP_SIZE, CROP_SIZE))
            ang = rng.uniform(-40, 40, 3)
            R = euler_to_matrix(*ang)
            crops[i] = warp_by_rotation(face, R)
            eulers[i] = ang
        pred = np.asarray(landmarks_fan.pose_forward(params, jnp.asarray(crops),
                                                     width=pose_width))
        return float(np.mean(np.abs(pred - eulers)))

    from fvd_tpu.models.synthetic_faces import render_face

    return {"in_domain": run(render_face), "held_out": run(render_face_heldout),
            "unit": "mean abs deg (lower better)"}


def eval_ocr(n: int, seed: int = 17):
    import cv2
    import jax
    import jax.numpy as jnp

    from fvd_tpu.models import encoders, ocr
    from fvd_tpu.models.synthetic_text import random_text, scene_crop_line

    template = ocr.init_recognizer(jax.random.PRNGKey(0), width=32)
    params = encoders.load_params(os.path.join(CKPT, "ocr_rec.npz"), template)

    HELD_OUT_FONTS = [cv2.FONT_HERSHEY_DUPLEX, cv2.FONT_HERSHEY_COMPLEX,
                      cv2.FONT_HERSHEY_TRIPLEX,
                      cv2.FONT_HERSHEY_SIMPLEX | cv2.FONT_ITALIC]

    def run(fonts):
        rng = np.random.RandomState(seed)
        lines = np.zeros((n, ocr.LINE_H, ocr.LINE_W, 1), np.float32)
        texts = []
        for i in range(n):
            text = random_text(rng, 4, 12)
            font = None if fonts is None else fonts[rng.randint(len(fonts))]
            lines[i] = scene_crop_line(rng, text, font=font)
            texts.append(text)
        logits = np.asarray(ocr.recognize_forward(params, jnp.asarray(lines),
                                                  width=32))
        decoded = ocr.ctc_greedy_decode(logits)
        exact = float(np.mean([d == t for d, t in zip(decoded, texts)]))
        chars = [sum(a == b for a, b in zip(d, t)) / max(len(t), 1)
                 for d, t in zip(decoded, texts)]
        return exact, float(np.mean(chars))

    exact_in, char_in = run(None)
    exact_out, char_out = run(HELD_OUT_FONTS)
    return {"in_domain": exact_in, "held_out": exact_out,
            "char_in_domain": char_in, "char_held_out": char_out,
            "unit": "exact-match rate"}


def eval_ocr_det(n: int, seed: int = 19):
    """Held-out eval for the text-region detection U-Net.

    The recognizer eval above covers unseen fonts end-to-end through
    ``scene_crop_line``; this covers the DETECTOR: pixel-mask IoU between
    ``detect_forward > 0.5`` and ground truth, on scenes rendered in font
    faces the detector's training renderer never draws (same held-out font
    set as the recognizer eval)."""
    import cv2
    import jax
    import jax.numpy as jnp

    from fvd_tpu.models import encoders, ocr
    from fvd_tpu.models.synthetic_text import detector_sample

    params, det_width, det_arch = ocr.load_detector(
        os.path.join(CKPT, "ocr_det.npz"))

    HELD_OUT_FONTS = [cv2.FONT_HERSHEY_DUPLEX, cv2.FONT_HERSHEY_COMPLEX,
                      cv2.FONT_HERSHEY_TRIPLEX,
                      cv2.FONT_HERSHEY_SIMPLEX | cv2.FONT_ITALIC]

    def run(fonts):
        rng = np.random.RandomState(seed)
        imgs = np.zeros((n, ocr.DET_SIZE, ocr.DET_SIZE, 3), np.float32)
        masks = np.zeros((n, ocr.DET_SIZE, ocr.DET_SIZE), np.float32)
        for i in range(n):
            font = None if fonts is None else fonts[rng.randint(len(fonts))]
            img, mask = detector_sample(rng, font=font)
            imgs[i] = img.astype(np.float32) / 255.0
            masks[i] = mask
        prob = np.asarray(ocr.detect_forward(
            params, jnp.asarray(imgs), width=det_width,
            arch=det_arch))  # [B, H, W]
        pred = prob > 0.5
        gt = masks > 0.5
        inter = (pred & gt).reshape(n, -1).sum(1)
        union = (pred | gt).reshape(n, -1).sum(1)
        return float(np.mean(inter / np.maximum(union, 1)))

    return {"in_domain": run(None), "held_out": run(HELD_OUT_FONTS),
            "unit": "pixel-mask IoU @0.5"}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only",
                    choices=["det", "lmk", "pose", "ocr", "ocr_det"],
                    default=None)
    ap.add_argument("--ckpt-dir", default=None,
                    help="evaluate checkpoints from this directory instead")
    args = ap.parse_args(argv)

    if args.ckpt_dir:
        global CKPT
        CKPT = os.path.abspath(args.ckpt_dir)

    if args.cpu:
        import fvd_tpu

        fvd_tpu.force_cpu()

    evals = {"det": eval_detector, "lmk": eval_landmarks,
             "pose": eval_pose, "ocr": eval_ocr, "ocr_det": eval_ocr_det}
    results = {}
    for name, fn in evals.items():
        if args.only and name != args.only:
            continue
        results[name] = fn(args.n)
        print(name, json.dumps(results[name], indent=None), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
