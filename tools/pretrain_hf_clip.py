"""Train the CLIP ViT-B/32-GEOMETRY Flax model on the procedural scene domain.

Round-4 closed A2 at reference geometry (trained whisper-base); this does the
same for C2's model: the exact CLIP ViT-B/32 architecture the reference loads
(`c2_gesture_narration_check.py:49-54`: vision 768x12 patch32 image 224,
text 512x12, projection 512) trained contrastively on the framework's
procedural scene domain, so the HF path carries a *working* checkpoint
instead of the random-init fabrication the round-4 real-geometry bench ran.

Training distribution == C2's inference distribution: keyframes are
procedural-face video frames (background + draw_face, the make_face_video
renderer family) and text overlays; captions are the three C2-relevant
scene descriptions ("text saying <X>" / "a person's face looking at the
camera" / "an empty textured background" — tools/pretrain_clip.py's pairs,
re-rendered at the ViT's native 224).

TPU-first data path (the whisper playbook): the rendered image pool and
caption token ids are uploaded to HBM once; every step ships only integer
pool indices, and gather -> normalize -> dual-tower forward -> symmetric
InfoNCE -> AdamW runs as ONE jitted device program.

A band-shaping term pushes matched cosines above C2's Consistent threshold
and mismatched below Inconsistent (config.gesture: 0.25/0.15 — the raw-CLIP
bands the reference inherits from openai CLIP's cosine range), so the
trained model's *uncalibrated* cosines land where the node thresholds
expect them, like the genuine weights' do.

    nohup python tools/pretrain_hf_clip.py --steps 3000 --batch 128 \
        > /tmp/clip_train.log 2>&1 &

Saves to --out (default checkpoints/hf_staging/clip); promote with
--promote checkpoints/hf/clip after the paired eval (tools/
eval_clip_paired.py) beats the dim-192 checkpoint, per the repo's
continuation doctrine.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("HF_HUB_OFFLINE", "1")

import numpy as np

SIZE = 224          # ViT-B/32 native input
MAX_LEN = 77        # CLIP text positions
FACE_CAPTION = "a person's face looking at the camera"
BG_CAPTION = "an empty textured background"


# ---------------------------------------------------------------------------
# scene rendering (224px re-renders of pretrain_clip.py's pair families)
# ---------------------------------------------------------------------------
def make_text_scene(rng: np.random.RandomState, text: str) -> np.ndarray:
    import cv2

    img = (rng.rand(SIZE, SIZE, 3) * 70).astype(np.uint8)
    img = cv2.blur(img, (5, 5))
    scale = rng.uniform(0.9, 1.4)
    y = rng.randint(60, SIZE - 20)
    cv2.putText(img, text, (8, y), cv2.FONT_HERSHEY_SIMPLEX, scale,
                (235, 235, 235), 2)
    return img


def make_face_scene(rng: np.random.RandomState) -> np.ndarray:
    """A make_face_video-style frame: blurred background, one elliptical
    face at a random position/size/aperture — the keyframe distribution C2
    actually scores (synthetic.py make_face_video), photometrically
    randomized for codec/lighting robustness."""
    import cv2

    from fvd_tpu.models.synthetic_faces import draw_face, photometric_randomize

    img = (rng.rand(SIZE, SIZE, 3) * 60 + rng.rand(3) * 120).astype(np.uint8)
    img = cv2.blur(img, (5, 5))
    skin = np.array([rng.randint(160, 230), rng.randint(120, 190),
                     rng.randint(100, 170)])
    fh = SIZE * rng.uniform(0.35, 0.75)
    fw = fh / rng.uniform(1.1, 1.4)
    cx = rng.uniform(fw * 0.4, SIZE - fw * 0.4)
    cy = rng.uniform(fh * 0.4, SIZE - fh * 0.4)
    draw_face(img, cx, cy, fw, fh, skin, aperture=rng.rand())
    if rng.rand() < 0.5:
        img = photometric_randomize(img, rng)
    return img


def make_background(rng: np.random.RandomState) -> np.ndarray:
    import cv2

    img = (rng.rand(SIZE, SIZE, 3) * rng.randint(40, 200)).astype(np.uint8)
    return cv2.blur(img, (13, 13))


def build_pool(rng: np.random.RandomState, n_text: int, n_face: int,
               n_bg: int):
    """-> (images uint8 [M, 224, 224, 3], captions list[str]).  Layout:
    text scenes first, then faces, then backgrounds (the batch sampler
    relies on the offsets)."""
    from fvd_tpu.models.synthetic_text import random_text

    images = np.zeros((n_text + n_face + n_bg, SIZE, SIZE, 3), np.uint8)
    captions = []
    seen = set()
    for i in range(n_text):
        text = random_text(rng, 3, 12)
        while text in seen:
            text = random_text(rng, 3, 12)
        seen.add(text)
        images[i] = make_text_scene(rng, text)
        captions.append(f"text saying {text}")
    for i in range(n_face):
        images[n_text + i] = make_face_scene(rng)
        captions.append(FACE_CAPTION)
    for i in range(n_bg):
        images[n_text + n_face + i] = make_background(rng)
        captions.append(BG_CAPTION)
    return images, captions


def sample_batch(rng: np.random.RandomState, batch: int, n_text: int,
                 n_face: int, n_bg: int) -> np.ndarray:
    """Pool indices with in-batch-unique captions: B-2 distinct text scenes
    + one face + one background (the dim-192 recipe's uniqueness rule —
    InfoNCE needs every caption in the batch to be a valid negative for
    every other image)."""
    idx = rng.choice(n_text, batch - 2, replace=False).astype(np.int32)
    face = n_text + rng.randint(n_face)
    bg = n_text + n_face + rng.randint(n_bg)
    out = np.concatenate([idx, [face], [bg]]).astype(np.int32)
    rng.shuffle(out)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--pool", type=int, default=2304,
                    help="text-scene pool size (faces/backgrounds added on "
                         "top: pool//8 faces, pool//16 backgrounds)")
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--warmup", type=int, default=200)
    ap.add_argument("--band-weight", type=float, default=2.0,
                    help="weight of the C2 cosine-band shaping term")
    ap.add_argument("--band-target", type=float, default=0.35,
                    help="matched-cosine floor the band term enforces (the "
                         "C2 Consistent threshold is 0.25; margin above it "
                         "keeps the whole matched distribution clear)")
    ap.add_argument("--out", default="checkpoints/hf_staging/clip")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--save-every", type=int, default=2000)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="6-layer 128d geometry — CPU smoke test of the "
                         "trainer machinery, not a capability run")
    ap.add_argument("--promote", default=None,
                    help="after training+eval, copy --out to this dir as "
                         "float16 (e.g. checkpoints/hf/clip)")
    args = ap.parse_args()
    if args.cpu:
        import fvd_tpu

        fvd_tpu.force_cpu()

    import jax
    import jax.numpy as jnp
    import optax

    print(f"backend: {jax.default_backend()}", flush=True)

    # --- model: fabricate at ViT-B/32 geometry or resume ---
    from make_hf_geometry_checkpoints import make_clip

    if not (args.resume and os.path.isdir(args.out)):
        print("fabricating CLIP ViT-B/32-geometry model + tokenizer...",
              flush=True)
        make_clip(args.out, tiny=args.tiny)
    from transformers import AutoTokenizer, FlaxCLIPModel

    tok = AutoTokenizer.from_pretrained(args.out)
    model = FlaxCLIPModel.from_pretrained(args.out, dtype=jnp.bfloat16)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), model.params)
    img_size = model.config.vision_config.image_size
    assert img_size == SIZE, img_size

    # --- pools (train / held-out disjoint by construction: fresh rng) ---
    rng = np.random.RandomState(args.seed)
    n_face, n_bg = max(args.pool // 8, 16), max(args.pool // 16, 8)
    t0 = time.perf_counter()
    print(f"rendering pool: {args.pool} text + {n_face} face + {n_bg} bg...",
          flush=True)
    pool_imgs, pool_caps = build_pool(rng, args.pool, n_face, n_bg)
    enc = tok(pool_caps, padding="max_length", truncation=True,
              max_length=MAX_LEN, return_tensors="np")
    print(f"pool rendered in {time.perf_counter() - t0:.1f}s; uploading "
          f"{pool_imgs.nbytes / 1e6:.0f} MB...", flush=True)
    t0 = time.perf_counter()
    pool_dev = jax.device_put(pool_imgs)
    ids_dev = jax.device_put(enc["input_ids"].astype(np.int32))
    mask_dev = jax.device_put(enc["attention_mask"].astype(np.int32))
    jax.block_until_ready(pool_dev)
    print(f"pool on {pool_dev.device} in {time.perf_counter() - t0:.1f}s",
          flush=True)

    mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073], jnp.float32)
    std = jnp.asarray([0.26862954, 0.26130258, 0.27577711], jnp.float32)

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(
            optax.warmup_cosine_decay_schedule(
                0.0, args.lr, args.warmup, max(args.steps, args.warmup + 1),
                end_value=args.lr * 0.03),
            b2=0.98, weight_decay=0.01),
    )
    opt_state = tx.init(params)

    def towers(p, pixel_values, input_ids, attention_mask):
        position_ids = jnp.broadcast_to(
            jnp.arange(input_ids.shape[-1])[None, :], input_ids.shape)
        out = model.module.apply(
            {"params": p}, input_ids=input_ids, pixel_values=pixel_values,
            attention_mask=attention_mask, position_ids=position_ids,
            deterministic=True)
        ie = out.image_embeds.astype(jnp.float32)
        te = out.text_embeds.astype(jnp.float32)
        ie = ie / (jnp.linalg.norm(ie, axis=-1, keepdims=True) + 1e-8)
        te = te / (jnp.linalg.norm(te, axis=-1, keepdims=True) + 1e-8)
        return ie, te

    def loss_fn(p, pixel_values, input_ids, attention_mask):
        ie, te = towers(p, pixel_values, input_ids, attention_mask)
        cos = ie @ te.T
        scale = jnp.exp(jnp.clip(p["logit_scale"], 0.0, jnp.log(100.0)))
        logits = cos * scale
        labels = jnp.arange(logits.shape[0])
        li = -jnp.mean(jax.nn.log_softmax(logits, axis=1)[labels, labels])
        lt = -jnp.mean(jax.nn.log_softmax(logits, axis=0)[labels, labels])
        # C2 band shaping on RAW cosines (see module docstring)
        diag = jnp.diag(cos)
        off = cos - jnp.eye(cos.shape[0]) * cos
        band = (jnp.mean(jax.nn.relu(args.band_target - diag) ** 2)
                + jnp.mean(jax.nn.relu(off - 0.05) ** 2))
        return (li + lt) / 2 + args.band_weight * band, (diag.mean(),)

    def preprocess(pool, idx):
        px = pool[idx].astype(jnp.float32) / 255.0
        return ((px - mean) / std).astype(jnp.bfloat16)

    @jax.jit
    def step(params, opt_state, pool, ids, mask, idx):
        pixel_values = preprocess(pool, idx)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, pixel_values, ids[idx], mask[idx])
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux[0]

    @jax.jit
    def embed(params, pool, ids, mask, idx):
        return towers(params, preprocess(pool, idx), ids[idx], mask[idx])

    def save(p, tag=""):
        model.params = jax.device_get(p)
        model.save_pretrained(args.out)
        meta = {"domain": "procedural-scenes",
                "train": "pretrain_hf_clip.py",
                "steps": args.steps, "pool": args.pool,
                "seed": args.seed,
                "geometry": "clip-vit-b32 vision768x12p32 text512x12"}
        meta.update(cal)
        with open(os.path.join(args.out, "fvd_train_meta.json"), "w") as f:
            json.dump(meta, f)
        print(f"[save{tag}] -> {args.out} ({cal or 'no cal yet'})", flush=True)

    state = {"params": params}
    #: held-out cosine calibration onto the reference CLIP band (the
    #: JaxClip convention, providers/hf_models.HFClip): offset = mean
    #: mismatched cosine, scale = 0.35 / (matched - mismatched).  Written
    #: into fvd_train_meta.json at final save so C2 scores through the
    #: trained checkpoint land where the 0.25/0.15 thresholds expect.
    cal: dict = {}

    def on_term(signum, frame):
        print(f"signal {signum}: saving before exit", flush=True)
        save(state["params"], tag="-sig")
        os._exit(0)

    signal.signal(signal.SIGTERM, on_term)

    # --- held-out eval pool (fresh rng, same families) ---
    ev_rng = np.random.RandomState(args.seed + 1)
    ne_text = 64
    ev_imgs, ev_caps = build_pool(ev_rng, ne_text, 8, 4)
    ev_enc = tok(ev_caps, padding="max_length", truncation=True,
                 max_length=MAX_LEN, return_tensors="np")
    ev_pool = jax.device_put(ev_imgs)
    ev_ids = jax.device_put(ev_enc["input_ids"].astype(np.int32))
    ev_mask = jax.device_put(ev_enc["attention_mask"].astype(np.int32))
    ev_idx = jnp.arange(len(ev_imgs), dtype=jnp.int32)

    def evaluate(p):
        ie, te = (np.asarray(x) for x in embed(p, ev_pool, ev_ids, ev_mask,
                                               ev_idx))
        cos = ie @ te.T
        # retrieval over the unique-caption prefix (text scenes)
        sub = cos[:ne_text, :ne_text]
        r_at_1 = float((sub.argmax(axis=1) == np.arange(ne_text)).mean())
        diag = float(np.diag(cos).mean())
        off = float((cos.sum() - np.trace(cos)) / (cos.size - cos.shape[0]))
        return r_at_1, diag, off

    # --- train loop ---
    data_rng = np.random.RandomState(args.seed + 7)
    t0 = time.perf_counter()
    for i in range(args.steps):
        idx = sample_batch(data_rng, args.batch, args.pool, n_face, n_bg)
        params, opt_state, loss, dmean = step(
            params, opt_state, pool_dev, ids_dev, mask_dev, jnp.asarray(idx))
        state["params"] = params
        if i % 50 == 0 or i == args.steps - 1:
            print(f"[clip] step {i:5d} loss {float(loss):.4f} "
                  f"diag-cos {float(dmean):.3f} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
        if args.eval_every and i > 0 and i % args.eval_every == 0:
            r1, dg, off = evaluate(params)
            print(f"[clip] step {i}: held-out retrieval@1={r1:.3f} "
                  f"diag={dg:.3f} off={off:.3f}", flush=True)
        if args.save_every and i > 0 and i % args.save_every == 0:
            save(params, tag=f"@{i}")

    r1, dg, off = evaluate(params)
    print(f"[clip] FINAL held-out: retrieval@1={r1:.3f} diag-cos={dg:.3f} "
          f"off-cos={off:.3f}", flush=True)
    cal.update(cal_offset=round(off, 6),
               cal_scale=round(0.35 / max(dg - off, 1e-6), 6))
    save(params)

    if args.promote:
        import jax
        import shutil

        model.params = jax.tree.map(
            lambda x: np.asarray(x, np.float16), jax.device_get(params))
        os.makedirs(os.path.dirname(args.promote), exist_ok=True)
        if os.path.isdir(args.promote):
            shutil.rmtree(args.promote)
        model.save_pretrained(args.promote)
        for aux_name in os.listdir(args.out):
            if aux_name.endswith(".json") or aux_name.endswith(".txt"):
                src = os.path.join(args.out, aux_name)
                dst = os.path.join(args.promote, aux_name)
                if not os.path.exists(dst):
                    shutil.copy2(src, dst)
        print(f"promoted (f16) -> {args.promote}", flush=True)


if __name__ == "__main__":
    main()
