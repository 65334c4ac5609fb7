"""Contrastively pretrain the CLIP dual towers on procedural scenes.

Pairs: rendered text images <-> "text saying <STRING>" captions, procedural
faces <-> "a person's face ..." captions, plain textures <-> "an empty
background".  InfoNCE over in-batch negatives gives a synthetic-domain CLIP
whose image-text similarity is meaningful for C2's consistency check
(matching text >> mismatched text, faces != text), without external data.

    python tools/pretrain_clip.py --steps 1200 --batch 32
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_pair(rng: np.random.RandomState):
    """-> (image uint8 [112, 112, 3], caption str)."""
    import cv2

    from fvd_tpu.models.encoders import IMAGE_SIZE
    from fvd_tpu.models.synthetic_faces import render_face
    from fvd_tpu.models.synthetic_text import random_text

    kind = rng.randint(3)
    if kind == 0:  # text scene
        text = random_text(rng, 3, 10)
        img = (rng.rand(IMAGE_SIZE, IMAGE_SIZE, 3) * 70).astype(np.uint8)
        img = cv2.blur(img, (3, 3))
        scale = rng.uniform(0.45, 0.7)
        y = rng.randint(30, IMAGE_SIZE - 10)
        cv2.putText(img, text, (4, y), cv2.FONT_HERSHEY_SIMPLEX, scale,
                    (235, 235, 235), 2)
        return img, f"text saying {text}"
    if kind == 1:  # face scene
        face, _, _ = render_face(rng, IMAGE_SIZE)
        return face, "a person's face looking at the camera"
    img = (rng.rand(IMAGE_SIZE, IMAGE_SIZE, 3) * rng.randint(40, 200)).astype(np.uint8)
    img = cv2.blur(img, (7, 7))
    return img, "an empty textured background"


def clip_batch(rng: np.random.RandomState, batch: int, tok, max_len: int):
    from fvd_tpu.models.encoders import IMAGE_SIZE

    images = np.zeros((batch, IMAGE_SIZE, IMAGE_SIZE, 3), np.float32)
    ids = np.zeros((batch, max_len), np.int32)
    captions = []
    seen = set()
    for i in range(batch):
        img, caption = make_pair(rng)
        # in-batch negatives need unique captions
        while caption in seen:
            img, caption = make_pair(rng)
        seen.add(caption)
        images[i] = img.astype(np.float32) / 255.0
        ids[i] = tok.encode(caption, max_len)
        captions.append(caption)
    return images, ids, captions


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--out", default="checkpoints/clip.npz")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from fvd_tpu.models import encoders
    from fvd_tpu.models.encoders import MAX_TEXT_LEN, ClipModel, save_params
    from fvd_tpu.models.transformer import ByteTokenizer

    print(f"backend: {jax.default_backend()}")
    rng = np.random.RandomState(args.seed)
    tok = ByteTokenizer()
    model = ClipModel(dim=args.dim, depth=args.depth, out_dim=args.dim)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, encoders.IMAGE_SIZE, encoders.IMAGE_SIZE, 3), jnp.float32),
        jnp.zeros((1, MAX_TEXT_LEN), jnp.int32),
    )
    if args.resume and os.path.exists(args.out):
        from fvd_tpu.models.encoders import load_params

        params = load_params(args.out, params)
        print(f"[clip] resumed params from {args.out}")
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, images, ids):
        loss, grads = jax.value_and_grad(encoders.clip_loss)(params, model, images, ids)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    for i in range(args.steps):
        images, ids, _ = clip_batch(rng, args.batch, tok, MAX_TEXT_LEN)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(images),
                                       jnp.asarray(ids))
        if i % 100 == 0 or i == args.steps - 1:
            print(f"[clip] step {i:4d} loss {float(loss):.3f} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)

    # eval: retrieval accuracy on a fresh batch + matched-vs-mismatched margin
    images, ids, captions = clip_batch(rng, 32, tok, MAX_TEXT_LEN)
    logits = np.asarray(model.apply(params, jnp.asarray(images), jnp.asarray(ids)))
    acc = (logits.argmax(axis=1) == np.arange(32)).mean()
    diag = np.diag(logits)
    off = (logits.sum(axis=1) - diag) / (logits.shape[1] - 1)
    print(f"[clip] eval: retrieval@1={acc:.2f} "
          f"matched-vs-mismatched margin={(diag - off).mean():.3f}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_params(args.out, params)
    import json

    # calibration to the reference CLIP cosine scale (see JaxClip)
    ie = model.apply(params, jnp.asarray(images), method=ClipModel.encode_image)
    te = model.apply(params, jnp.asarray(ids), method=ClipModel.encode_text)
    cos = np.asarray(ie @ te.T)
    d = np.diag(cos)
    o = (cos.sum(1) - d) / (cos.shape[1] - 1)
    cal_offset = float(o.mean())
    cal_scale = float(0.35 / max(d.mean() - o.mean(), 1e-6))
    with open(args.out.replace(".npz", ".json"), "w") as f:
        json.dump({"dim": args.dim, "depth": args.depth, "out_dim": args.dim,
                   "cal_offset": cal_offset, "cal_scale": cal_scale}, f)
    print(f"[clip] saved {args.out} (dim={args.dim}, depth={args.depth})")


if __name__ == "__main__":
    main()
