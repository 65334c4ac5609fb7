"""Pretrain the face detector + landmark regressor on procedural faces.

Runs on whatever backend JAX exposes (the real TPU chip under the driver)
and writes npz checkpoints to ``checkpoints/``:

    python tools/pretrain_synthetic.py --steps 400 --batch 16

The resulting checkpoints make :func:`fvd_tpu.providers.factory.production_providers`
load real model-backed providers instead of stubs.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def train_detector(steps: int, batch: int, width: int, out: str, seed: int = 0,
                   resume: bool = False, lr: float = 1e-3, augment: bool = False,
                   photometric: bool = False, dense: bool = False,
                   shading: bool = False, portrait: bool = False):
    import jax
    import jax.numpy as jnp

    from fvd_tpu.models import face_ssd
    from fvd_tpu.models.synthetic_faces import detector_batch
    from fvd_tpu.ops import detection

    from fvd_tpu.models.checkpointing import load_train_state, save_train_state

    rng = np.random.RandomState(seed)
    params = face_ssd.init_params(jax.random.PRNGKey(seed), width=width)
    step_fn, init_opt = face_ssd.make_train_step(width=width, lr=lr)
    opt_state = init_opt(params)
    start_step = 0
    train_dir = os.path.join(os.path.dirname(out) or ".", "train_state_det")
    if resume:
        restored = load_train_state(train_dir, params, opt_state)
        if restored is not None:
            start_step, params, opt_state = restored
            print(f"[det] resumed train state at step {start_step} from {train_dir}")
        elif os.path.exists(out):
            params = face_ssd.load_params(out, width=width)
            print(f"[det] resumed params-only from {out}")

    t0 = time.perf_counter()
    for i in range(start_step, start_step + steps):
        frames, labels, locs, _ = detector_batch(rng, batch, augment=augment,
                                                  photometric=photometric,
                                                  dense=dense, shaded=shading,
                                                  portrait=portrait)
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(frames), jnp.asarray(labels), jnp.asarray(locs)
        )
        if i % 50 == 0 or i == start_step + steps - 1:
            print(f"[det] step {i:4d} loss {float(loss):.4f} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
        if i > start_step and i % 500 == 0:
            save_train_state(train_dir, step=i, params=params, opt_state=opt_state)

    # eval: detection IoU on fresh samples
    frames, _, _, gt_boxes = detector_batch(rng, 16)
    from fvd_tpu.models.face_ssd import MEAN_RGB

    raw = (frames + np.asarray(MEAN_RGB)).clip(0, 255).astype(np.uint8)
    boxes, scores = face_ssd.detect_batch_jit(params, jnp.asarray(raw), width=width)
    boxes, scores = np.asarray(boxes), np.asarray(scores)
    ious = []
    for b, s, gt in zip(boxes, scores, gt_boxes):
        if s[0] <= 0:
            ious.append(0.0)
            continue
        iou = float(
            detection.iou_matrix(jnp.asarray(b[:1]), jnp.asarray(gt[None]))[0, 0]
        )
        ious.append(iou)
    mean_iou = float(np.mean(ious))
    print(f"[det] eval mean IoU (top detection vs gt): {mean_iou:.3f}")

    os.makedirs(os.path.dirname(out), exist_ok=True)
    face_ssd.save_params(out, params)
    save_train_state(train_dir, step=start_step + steps, params=params,
                     opt_state=opt_state)
    print(f"[det] saved {out} (+ train state at step {start_step + steps})")
    return mean_iou


def train_landmarks(steps: int, batch: int, width: int, out: str, seed: int = 1,
                    resume: bool = False, lr: float = 1e-3, augment: bool = False,
                    photometric: bool = False, shading: bool = False,
                    hard_half: bool = False, portrait: bool = False):
    import jax
    import jax.numpy as jnp

    from fvd_tpu.models import landmarks_fan
    from fvd_tpu.models.synthetic_faces import landmark_batch

    rng = np.random.RandomState(seed)
    params = landmarks_fan.init_landmark_params(jax.random.PRNGKey(seed), width=width)
    if resume and os.path.exists(out):
        params = landmarks_fan.load_params(out, params)
        print(f"[lmk] resumed params from {out}")
    step_fn, init_opt = landmarks_fan.make_landmark_train_step(width=width, lr=lr)
    opt_state = init_opt(params)

    t0 = time.perf_counter()
    for i in range(steps):
        crops, targets = landmark_batch(rng, batch, augment=augment,
                                        photometric=photometric,
                                        shaded=shading, hard_half=hard_half,
                                        portrait=portrait)
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(crops), jnp.asarray(targets)
        )
        if i % 50 == 0 or i == steps - 1:
            print(f"[lmk] step {i:4d} loss {float(loss):.5f} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)

    crops, targets = landmark_batch(rng, 16)
    coords = np.asarray(
        landmarks_fan.landmarks_forward(
            params, jnp.asarray((crops * 255).astype(np.uint8)), width=width
        )
    )
    err = float(np.mean(np.linalg.norm(coords - targets, axis=-1)))
    print(f"[lmk] eval mean normalized error: {err:.4f}")

    os.makedirs(os.path.dirname(out), exist_ok=True)
    landmarks_fan.save_params(out, params)
    print(f"[lmk] saved {out}")
    return err


def train_pose(steps: int, batch: int, width: int, out: str, seed: int = 2,
               resume: bool = False, lr: float = 1e-3, augment: bool = False,
               photometric: bool = False, shading: bool = False,
               hard_half: bool = False, portrait: bool = False,
               consistency: bool = False):
    import jax
    import jax.numpy as jnp
    import optax

    from fvd_tpu.models import landmarks_fan
    from fvd_tpu.models.synthetic_pose import pose_batch, pose_batch_paired

    rng = np.random.RandomState(seed)
    params = landmarks_fan.init_pose_params(jax.random.PRNGKey(seed), width=width)
    if resume and os.path.exists(out):
        params = landmarks_fan.load_params(out, params)
        print(f"[pose] resumed params from {out}")
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, crops, target_R):
        loss, grads = jax.value_and_grad(landmarks_fan.pose_loss)(
            params, crops, target_R, width=width)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def cstep(params, opt_state, crops_a, crops_b, target_R):
        loss, grads = jax.value_and_grad(landmarks_fan.pose_consistency_loss)(
            params, crops_a, crops_b, target_R, width=width)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    for i in range(steps):
        if consistency and i % 2 == 1:
            # odd steps: same-face / same-rotation pairs, divergence
            # penalized (the accessories-factor lever)
            ca, cb, Rs = pose_batch_paired(rng, max(batch // 2, 4),
                                           photometric=photometric,
                                           shaded=shading)
            params, opt_state, loss = cstep(params, opt_state,
                                            jnp.asarray(ca), jnp.asarray(cb),
                                            jnp.asarray(Rs))
            continue
        crops, Rs, _ = pose_batch(rng, batch, augment=augment,
                                  photometric=photometric, shaded=shading,
                                  hard_half=hard_half, portrait=portrait)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(crops),
                                       jnp.asarray(Rs))
        if i % 100 == 0 or i == steps - 1:
            print(f"[pose] step {i:4d} loss {float(loss):.4f} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)

    crops, _, eulers = pose_batch(rng, 32)
    pred = np.asarray(landmarks_fan.pose_forward(
        params, jnp.asarray((crops * 255).astype(np.uint8)), width=width))
    err = np.abs(pred - eulers).mean(axis=0)
    print(f"[pose] eval mean abs err (pitch/yaw/roll deg): {err.round(2)}")

    os.makedirs(os.path.dirname(out), exist_ok=True)
    landmarks_fan.save_params(out, params)
    import json

    with open(out.replace(".npz", ".json"), "w") as f:
        json.dump({"width": width}, f)
    print(f"[pose] saved {out} (width={width})")
    return err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--det-width", type=int, default=32)
    ap.add_argument("--lmk-width", type=int, default=32)
    ap.add_argument("--pose-width", type=int, default=32)
    ap.add_argument("--out-dir", default="checkpoints")
    ap.add_argument("--only", choices=["det", "lmk", "pose"], default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--dense", action="store_true",
                    help="dense mixture: 3/4 augmented, half hard, all "
                         "augmented samples photometric (second-stage "
                         "continuation targeting the all-factors cell)")
    ap.add_argument("--photometric", action="store_true",
                    help="photometric domain randomization (lighting "
                         "gradients, sensor noise, motion blur, JPEG "
                         "artifacts) on the augmented half of detector "
                         "batches — the round-3 held-out data-realism lever")
    ap.add_argument("--hard-half", action="store_true",
                    help="lmk/pose: the whole augmented half renders hard "
                         "(accessories p0.9 + dense occluders) — targets "
                         "the accessories factor the round-4 diagnostic "
                         "pinned as pose's held-out binder")
    ap.add_argument("--consistency", action="store_true",
                    help="pose: interleave same-face/same-rotation pairs "
                         "(clean vs accessory-perturbed) with the prediction-"
                         "divergence penalty — targets the accessories "
                         "held-out factor without narrowing the data mix")
    ap.add_argument("--portrait", action="store_true",
                    help="det: portrait-structure realism on the augmented "
                         "samples — hair mass with texture, non-elliptical "
                         "jaw, hat band, photo-statistics background "
                         "clutter (round-5 external-validity lever, "
                         "synthetic_faces.portrait_realism)")
    ap.add_argument("--shading", action="store_true",
                    help="face-intrinsic realism: rim/directional shading, "
                         "skin mottling, specular sheen, feathered face "
                         "boundary on 3/4 of each batch (round-4 lever — "
                         "synthetic_faces.face_shading_realism; targets the "
                         "all-factors held-out cell AND real-photo "
                         "transfer, tools/eval_external_faces.py)")
    ap.add_argument("--augment", action="store_true",
                    help="robustness augmentations on half of each batch "
                         "(a quarter gets the dense factor-combination "
                         "'hard' mode — see synthetic_faces.render_face)")
    ap.add_argument("--cpu", action="store_true",
                    help="train on the CPU backend (leaves the tunneled "
                         "TPU chip to concurrent work; ~0.6 s/step for the "
                         "hourglass at width 32)")
    args = ap.parse_args()

    if args.cpu:
        import fvd_tpu

        fvd_tpu.force_cpu()
    import jax

    print(f"backend: {jax.default_backend()}")
    if args.only in (None, "det"):
        train_detector(args.steps, args.batch, args.det_width,
                       os.path.join(args.out_dir, "face_ssd.npz"),
                       resume=args.resume, lr=args.lr, augment=args.augment,
                       photometric=args.photometric, dense=args.dense,
                       shading=args.shading, portrait=args.portrait)
    if args.only in (None, "lmk"):
        train_landmarks(args.steps, args.batch, args.lmk_width,
                        os.path.join(args.out_dir, "landmarks.npz"),
                        resume=args.resume, lr=args.lr, augment=args.augment,
                        photometric=args.photometric, shading=args.shading,
                        hard_half=args.hard_half, portrait=args.portrait)
    if args.only in (None, "pose"):
        train_pose(args.steps, args.batch, args.pose_width,
                   os.path.join(args.out_dir, "pose.npz"),
                   resume=args.resume, lr=args.lr, augment=args.augment,
                   photometric=args.photometric, shading=args.shading,
                   hard_half=args.hard_half, portrait=args.portrait,
                   consistency=args.consistency)


if __name__ == "__main__":
    main()
