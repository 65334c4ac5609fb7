"""Pretrain the OCR stack (region detector + CTC recognizer) on rendered
text.  Writes ``checkpoints/ocr_det.npz`` + ``checkpoints/ocr_rec.npz``;
``providers/factory.py`` loads them automatically.

    python tools/pretrain_ocr.py --steps 1500 --batch 32
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def train_recognizer(steps: int, batch: int, width: int, out: str, seed: int = 0,
                     resume: bool = False, lr: float = 1e-3,
                     augment: bool = False):
    import jax
    import jax.numpy as jnp
    import optax

    from fvd_tpu.models import ocr
    from fvd_tpu.models.encoders import load_params
    from fvd_tpu.models.synthetic_text import recognizer_batch

    rng = np.random.RandomState(seed)
    model = ocr.CTCRecognizer(width=width)
    params = ocr.init_recognizer(jax.random.PRNGKey(seed), width=width)
    if resume and os.path.exists(out):
        params = load_params(out, params)
        print(f"[rec] resumed params from {out}")
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, lines, labels):
        loss, grads = jax.value_and_grad(ocr.ctc_loss)(params, model, lines, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    for i in range(steps):
        lines, labels, _ = recognizer_batch(rng, batch, augment=augment)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(lines),
                                       jnp.asarray(labels))
        if i % 100 == 0 or i == steps - 1:
            print(f"[rec] step {i:4d} loss {float(loss):.3f} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)

    # eval: exact + character accuracy on fresh lines
    lines, _, texts = recognizer_batch(rng, 32)
    logits = np.asarray(ocr.recognize_forward(params, jnp.asarray(lines), width=width))
    decoded = ocr.ctc_greedy_decode(logits)
    exact = sum(d == t for d, t in zip(decoded, texts)) / len(texts)
    char_ok = char_total = 0
    for d, t in zip(decoded, texts):
        char_total += len(t)
        char_ok += sum(a == b for a, b in zip(d, t))
    print(f"[rec] eval: exact={exact:.2f} char_acc={char_ok / max(char_total,1):.2f} "
          f"sample: {texts[0]!r} -> {decoded[0]!r}")

    os.makedirs(os.path.dirname(out), exist_ok=True)
    from fvd_tpu.models.encoders import save_params

    save_params(out, params)
    print(f"[rec] saved {out}")
    return exact


def train_detector(steps: int, batch: int, width: int, out: str, seed: int = 1,
                   resume: bool = False, lr: float = 1e-3,
                   augment: bool = False, arch: str = "v1"):
    import jax
    import jax.numpy as jnp
    import optax

    from fvd_tpu.models import ocr
    from fvd_tpu.models.encoders import load_params
    from fvd_tpu.models.synthetic_text import detector_batch

    rng = np.random.RandomState(seed)
    model = ocr.DET_ARCHS[arch](width=width)
    params = ocr.init_detector(jax.random.PRNGKey(seed), width=width, arch=arch)
    if resume and os.path.exists(out):
        params = load_params(out, params)
        print(f"[det] resumed params from {out}")
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(params, imgs, masks):
        logits = model.apply(params, imgs)
        bce = jnp.maximum(logits, 0) - logits * masks + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        return jnp.mean(bce)

    @jax.jit
    def step(params, opt_state, imgs, masks):
        loss, grads = jax.value_and_grad(loss_fn)(params, imgs, masks)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    for i in range(steps):
        imgs, masks = detector_batch(rng, batch, augment=augment)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(imgs),
                                       jnp.asarray(masks))
        if i % 100 == 0 or i == steps - 1:
            print(f"[det] step {i:4d} loss {float(loss):.4f} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)

    # eval: mask IoU on fresh samples
    imgs, masks = detector_batch(rng, 16)
    probs = np.asarray(ocr.detect_forward(params, jnp.asarray(imgs),
                                          width=width, arch=arch))
    pred = probs > 0.5
    gt = masks > 0.5
    iou = (pred & gt).sum() / max((pred | gt).sum(), 1)
    print(f"[det] eval mask IoU: {iou:.3f}")

    os.makedirs(os.path.dirname(out), exist_ok=True)
    import json

    from fvd_tpu.models.encoders import save_params

    save_params(out, params)
    with open(out.replace(".npz", ".json"), "w") as f:
        json.dump({"arch": arch, "width": width}, f)
    print(f"[det] saved {out} (arch={arch}, width={width})")
    return iou


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--rec-width", type=int, default=32)
    ap.add_argument("--det-width", type=int, default=None,
                    help="default: the arch's native width (v1: 16, v2: 128)")
    ap.add_argument("--det-arch", choices=["v1", "v2"], default="v1")
    ap.add_argument("--out-dir", default="checkpoints")
    ap.add_argument("--only", choices=["rec", "det"], default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--augment", action="store_true",
                    help="font-diversity + shape jitter on half of each "
                         "recognizer batch (non-held-out faces only; see "
                         "synthetic_text._train_font)")
    ap.add_argument("--cpu", action="store_true",
                    help="train on the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import fvd_tpu

        fvd_tpu.force_cpu()
    import jax

    print(f"backend: {jax.default_backend()}")
    if args.only in (None, "rec"):
        train_recognizer(args.steps, args.batch, args.rec_width,
                         os.path.join(args.out_dir, "ocr_rec.npz"),
                         resume=args.resume, lr=args.lr, augment=args.augment)
    if args.only in (None, "det"):
        from fvd_tpu.models.ocr import DET_DEFAULT_WIDTH

        det_width = args.det_width or DET_DEFAULT_WIDTH[args.det_arch]
        train_detector(max(200, args.steps // 3), args.batch, det_width,
                       os.path.join(args.out_dir, "ocr_det.npz"),
                       resume=args.resume, lr=args.lr, augment=args.augment,
                       arch=args.det_arch)


if __name__ == "__main__":
    main()
