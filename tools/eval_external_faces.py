"""External-validity probe of the synthetic face domain on a REAL photograph.

VERDICT r3 'missing #4' asked for external-validity evidence via cv2's
bundled Haar cascade.  That lever does not exist in this image: cv2 5.0.0
removed ``CascadeClassifier`` (moved out of the main module), its
``cv2.data.haarcascades`` directory ships EMPTY, and no other real-world-
trained face detector or face dataset is installed (no dlib, mediapipe,
skimage; ``sklearn.datasets`` bundles no faces; zero egress).  A filesystem
sweep found exactly ONE genuine photograph of a human face in the entire
environment: matplotlib's ``grace_hopper.jpg`` sample (a real frontal
portrait — glasses, hat, textured background).

So this tool runs the check in the only direction the environment permits:
the SYNTHETIC-trained models against the REAL photo —

* trained SSD (`checkpoints/face_ssd.npz`) on the portrait at several
  scales/flips/noise variants: detection rate + IoU against a hand-
  annotated ground-truth face box;
* trained landmark regressor on the GT crop: are eyes placed above the
  mouth, inside the face, with plausible inter-ocular spacing?

Capability anchor: the reference's res10 SSD is real-world-trained
(`/root/reference/nodes/V_nodes/v1_keyframes_facetrack.py:39-53`); this
probe measures how far the procedural-face domain transfers toward that
capability.  A failure here is itself the finding the verdict asked for:
it bounds the synthetic evaluation story and makes renderer realism the
next data lever (docs/EXTERNAL_VALIDITY.md records the outcome either way).

    python tools/eval_external_faces.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

#: hand-annotated face box for grace_hopper.jpg (512x600): the face-ellipse
#: bbox convention the SSD trains on (forehead to chin, ear to ear; the hat
#: brim excluded) — annotated by inspection of the portrait
HOPPER_GT = np.array([175.0, 130.0, 365.0, 370.0], np.float32)


def hopper_path() -> str:
    import matplotlib

    return os.path.join(os.path.dirname(matplotlib.__file__),
                        "mpl-data", "sample_data", "grace_hopper.jpg")


def _iou(a, b) -> float:
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return float(inter / ua) if ua > 0 else 0.0


def variants(img: np.ndarray, gt: np.ndarray):
    """(name, image, gt_box) — scales, flip, mild sensor noise."""
    import cv2

    h, w = img.shape[:2]
    rng = np.random.RandomState(0)
    out = [("native", img, gt)]
    for s in (0.75, 0.5):
        sw, sh = int(w * s), int(h * s)
        out.append((f"scale{s}", cv2.resize(img, (sw, sh)), gt * s))
    flip = img[:, ::-1].copy()
    gtf = np.array([w - gt[2], gt[1], w - gt[0], gt[3]], np.float32)
    out.append(("hflip", flip, gtf))
    noisy = np.clip(img.astype(np.float32)
                    + 8.0 * rng.randn(*img.shape), 0, 255).astype(np.uint8)
    out.append(("noise8", noisy, gt))
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--score-thresh", type=float, default=0.5)
    ap.add_argument("--ckpt-dir", default=None,
                    help="probe checkpoints from this dir (candidate "
                         "continuations) instead of the shipped ones")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    import fvd_tpu

    fvd_tpu.force_cpu()  # probe rule: never touch axon
    import cv2
    import jax
    import jax.numpy as jnp

    from fvd_tpu.models import face_ssd, landmarks_fan

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt_dir = os.path.abspath(args.ckpt_dir) if args.ckpt_dir else \
        os.path.join(repo, "checkpoints")
    ssd_params = face_ssd.load_params(
        os.path.join(ckpt_dir, "face_ssd.npz"), width=32)
    lmk_path = os.path.join(ckpt_dir, "landmarks.npz")
    if not os.path.exists(lmk_path):
        lmk_path = os.path.join(repo, "checkpoints", "landmarks.npz")
    lmk_params = landmarks_fan.load_params(
        lmk_path,
        landmarks_fan.init_landmark_params(jax.random.PRNGKey(1), width=32))

    img = cv2.imread(hopper_path())  # BGR, matching the pipeline's frames
    assert img is not None, "matplotlib grace_hopper.jpg not found"

    results = []
    for name, im, gt in variants(img, HOPPER_GT.copy()):
        boxes, scores = face_ssd.detect_batch_jit(
            ssd_params, jnp.asarray(im[None]), width=32)
        boxes = np.asarray(boxes)[0]
        scores = np.asarray(scores)[0]
        h, w = im.shape[:2]
        px = boxes * np.array([w, h, w, h], np.float32)
        keep = scores > args.score_thresh
        best_iou, best_score = 0.0, float(scores.max()) if scores.size else 0.0
        for b, s in zip(px[keep], scores[keep]):
            best_iou = max(best_iou, _iou(b, gt))
        results.append({"variant": name, "n_dets": int(keep.sum()),
                        "top_score": round(best_score, 3),
                        "best_iou_vs_gt": round(best_iou, 3)})
        print(json.dumps(results[-1]), flush=True)

    # landmark plausibility on the GT crop (the regressor's own convention:
    # GT-box crop resized to 128, coords normalized to the crop)
    x1, y1, x2, y2 = HOPPER_GT.astype(int)
    crop = cv2.resize(img[y1:y2, x1:x2], (128, 128))
    pts = np.asarray(landmarks_fan.landmarks_forward(
        lmk_params, jnp.asarray(crop[None]), width=32))[0]  # [68, 2] in [0,1]
    eyes_y = float(pts[36:48, 1].mean())
    mouth_y = float(pts[48:68, 1].mean())
    inter_ocular = float(np.linalg.norm(
        pts[36:42].mean(0) - pts[42:48].mean(0)))
    lmk = {
        "eyes_above_mouth": bool(eyes_y < mouth_y),
        "eyes_y": round(eyes_y, 3), "mouth_y": round(mouth_y, 3),
        "inter_ocular_frac": round(inter_ocular, 3),
        "inside_crop_frac": round(float(np.mean(
            (pts >= 0.0) & (pts <= 1.0))), 3),
    }
    print(json.dumps({"landmarks_on_gt_crop": lmk}), flush=True)

    detected = [r for r in results if r["best_iou_vs_gt"] >= 0.5]
    summary = {
        "real_photo": "matplotlib grace_hopper.jpg (the only genuine face "
                      "photograph in this offline image)",
        "variants": len(results),
        "detected_iou_ge_0.5": len(detected),
        "results": results,
        "landmarks": lmk,
    }
    print(json.dumps({"summary": summary}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
