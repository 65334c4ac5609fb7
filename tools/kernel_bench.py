"""Device-time microbenchmark of the hot coalesced programs.

Times each program exactly as the bench's coalescer dispatches it (same
bucket shapes, warm, block_until_ready) and prints device ms + a rough
FLOPs-utilization estimate — the roofline check the "speed-of-light" goal
needs.  The pipeline-level bench measures wall (RTT + host + device); this
isolates the device component so optimization effort lands where the time
actually goes.

    python tools/kernel_bench.py [--cpu] [--reps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, reps: int) -> float:
    import jax

    jax.block_until_ready(fn())  # warm/compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    if args.cpu:
        import fvd_tpu

        fvd_tpu.force_cpu()

    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(repo, "checkpoints")
    rng = np.random.RandomState(0)
    rows = []

    from fvd_tpu.models import face_ssd, landmarks_fan

    ssd_width = 32
    ssd_params = face_ssd.load_params(
        os.path.join(ckpt, "face_ssd.npz"), width=ssd_width)
    lmk_params = landmarks_fan.load_params(
        os.path.join(ckpt, "landmarks.npz"),
        landmarks_fan.init_landmark_params(jax.random.PRNGKey(1), width=32))
    pose_params = landmarks_fan.load_params(
        os.path.join(ckpt, "pose.npz"),
        landmarks_fan.init_pose_params(jax.random.PRNGKey(2), width=32))

    # --- detector @ its coalesce bucket (256 frames, 320x240) ---
    det_b = 256
    frames = jnp.asarray(rng.randint(0, 255, (det_b, 240, 320, 3), np.uint8))
    jax.block_until_ready(frames)

    def run_det():
        return face_ssd.detect_batch_jit(ssd_params, frames, width=ssd_width)

    s = timeit(run_det, args.reps)
    rows.append(("det_batch@256 320x240", s, det_b))

    # --- fused landmark+pose @ its bucket (512 dets over the frame tensor) ---
    lm_b = 512
    boxes = np.zeros((lm_b, 4), np.float32)
    boxes[:] = [40, 30, 200, 210]
    owners = rng.randint(0, det_b, lm_b).astype(np.int32)
    boxes_d, owners_d = jnp.asarray(boxes), jnp.asarray(owners)
    jax.block_until_ready((boxes_d, owners_d))

    def run_lmpose():
        return landmarks_fan.landmarks_pose_from_frames(
            lmk_params, pose_params, frames, boxes_d, owners_d,
            320.0, 240.0, 0.1, width=32, pose_width=32)

    s = timeit(run_lmpose, args.reps)
    rows.append(("lmpose_fused@512", s, lm_b))

    def run_lm_only():
        return landmarks_fan.landmarks_from_frames(
            lmk_params, frames, boxes_d, owners_d, width=32)

    s = timeit(run_lm_only, args.reps)
    rows.append(("landmarks_only@512", s, lm_b))

    # --- OCR packed-mask device detection @ bucket (256 frames) ---
    try:
        from fvd_tpu.models import ocr as ocr_mod

        det_path = os.path.join(ckpt, "ocr_det.npz")
        if os.path.exists(det_path):
            oparams = landmarks_fan.load_params(
                det_path, ocr_mod.init_detector(jax.random.PRNGKey(3)))

            def run_ocr_det():
                return ocr_mod.detect_packed_mask(oparams, frames)

            s = timeit(run_ocr_det, args.reps)
            rows.append(("ocr_det_packed@256", s, det_b))
    except Exception as e:  # pragma: no cover - informative skip
        print(f"ocr det skipped: {e}")

    # --- OneEuro smoothing scan @ bucket (8 videos x 256 steps) ---
    from fvd_tpu.nodes._smooth import _oe_batch_fn
    from fvd_tpu.ops.filters import one_euro_init_carry

    B, T = 8, 256
    carry = jax.tree.map(
        lambda x: jnp.asarray(np.stack([np.asarray(x)] * B)),
        one_euro_init_carry((68, 2)))
    times = jnp.asarray(np.tile(np.arange(T, dtype=np.float32) / 5.0, (B, 1)))
    vals = jnp.asarray(rng.rand(B, T, 68, 2).astype(np.float32))
    valid = jnp.ones((B, T), bool)
    fn = _oe_batch_fn((0.5, 0.1, 1.0))
    jax.block_until_ready((carry, times, vals))

    def run_smooth():
        return fn(carry, times, vals, valid)

    s = timeit(run_smooth, args.reps)
    rows.append(("oe_smooth@8x256", s, B))

    # --- C1 lip-sync program (batch of 8 videos x 900 samples) ---
    from fvd_tpu.ops.lipsync import lip_sync_score_xla

    sig = jnp.asarray(rng.rand(900).astype(np.float32))
    env = jnp.asarray(rng.rand(900).astype(np.float32))

    def run_lip():
        return lip_sync_score_xla(sig, env, 30.0)

    s = timeit(run_lip, args.reps)
    rows.append(("lipsync@900", s, 1))

    print(f"\n{'program':28s} {'device+dispatch ms':>18s} {'ms/item':>9s}")
    for name, secs, n in rows:
        print(f"{name:28s} {secs * 1e3:18.2f} {secs * 1e3 / n:9.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
