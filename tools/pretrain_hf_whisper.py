"""Train the whisper-base-GEOMETRY Flax model on the synthetic speech domain.

Round-3 proved the HF drop-in path at the reference's real model geometry
(`a2_vad_asr.py:27-30`: d512, 6+6 layers, 8 heads, 80 mel, vocab 51865) with
random init; this trains that exact architecture on the framework's
formant-speech domain so the HF path carries a *working* checkpoint — the
capability proof that the framework trains/serves reference-sized models,
not just dim-192 ones.

Training distribution == inference distribution: `synthetic.gated_speech`
packs <=10-char phrases onto a 1 s gate grid inside a 30 s clip, so each
training sample is a 30 s whisper window composed of pooled phrase
power-mels (`ops/whisper_frontend.compose_canvas`).  TPU-first data path:
the rendered phrase pool is uploaded to HBM once; every step ships only
integer phrase indices / frame offsets / token ids, and the mel canvas,
forward, loss and AdamW update run as ONE jitted device program (the 1-core
host never renders or uploads audio in the loop).

    nohup python tools/pretrain_hf_whisper.py --steps 8000 --batch 8 \
        > /tmp/whisper_train.log 2>&1 &

Saves to --out (default checkpoints/hf_staging/whisper — NOT the live
checkpoints/hf/ path; promote with --promote after the paired eval beats
the dim-192 checkpoint, per the repo's continuation doctrine).
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

MAX_CHARS = 10          # gated_speech's trained-utterance phrase budget
TILE_FRAMES = 104       # phrase power-mel tile (<=0.95 s content + boundary)
SEQ = 256               # decoder length (~1 token/char on the byte vocab)
KMAX = 22               # max phrases per 30 s canvas


# ---------------------------------------------------------------------------
# phrase pool
# ---------------------------------------------------------------------------
def gen_phrases(rng: np.random.RandomState, n: int, taken=()) -> list:
    """Distinct <=10-char phrases in gated_speech's packing distribution:
    common-word (pairs) + pronounceable syllables (pretrain_asr mixture)."""
    from pretrain_asr import random_common_words, random_pronounceable

    out, seen = [], set(taken)
    while len(out) < n:
        if rng.rand() < 0.6:
            p = random_common_words(rng, max_len=MAX_CHARS)
        else:
            p = random_pronounceable(rng, min_len=3, max_len=MAX_CHARS)
        p = p[:MAX_CHARS].strip()
        if p and p not in seen:
            seen.add(p)
            out.append(p)
    return out


def render_pool(phrases: list, rng: np.random.RandomState,
                hard_frac: float = 0.3, noise_max: float = 0.0) -> np.ndarray:
    """[M, TILE_FRAMES*160] float32 audio, sub-hop placement jitter baked in.

    ``noise_max`` > 0 bakes a per-tile additive dither with amplitude
    ~U(0, noise_max) into the pool — the inference-dither convention of the
    dim-192 checkpoints (CLAUDE.md: ASR checkpoints need dither matching
    their training noise floor; asr_formant ships dither 0.002).  A
    noise-free-trained whisper collapses 0.83->0.28 exact under that 0.002
    dither (round-4 diagnostic), so the pool must carry it."""
    from fvd_tpu.models.synthetic_speech import formant_speech, formant_speech_hard

    buf = np.zeros((len(phrases), TILE_FRAMES * 160), np.float32)
    for i, p in enumerate(phrases):
        if rng.rand() < hard_frac:
            a = formant_speech_hard(p, rng, variability=1.0)
        else:
            a = formant_speech(p, rng)
        pad = rng.randint(0, 160)  # sub-hop shift (np.roll'd fake audio)
        n = min(len(a), buf.shape[1] - pad)
        buf[i, pad:pad + n] = a[:n]
        if noise_max > 0:
            buf[i] += rng.uniform(0, noise_max) * rng.randn(
                buf.shape[1]).astype(np.float32)
    return buf


def pool_power_mels(audio_pool: np.ndarray, mel_filters: np.ndarray):
    """Device power-mel of every phrase tile, batched."""
    import jax
    import jax.numpy as jnp

    from fvd_tpu.ops.whisper_frontend import phrase_power_mel

    fb = jnp.asarray(mel_filters, jnp.float32)
    f = jax.jit(jax.vmap(lambda a: phrase_power_mel(a, fb, TILE_FRAMES)))
    out = []
    for i in range(0, len(audio_pool), 256):
        out.append(f(jnp.asarray(audio_pool[i:i + 256])))
    return jnp.concatenate(out) if len(out) > 1 else out[0]


# ---------------------------------------------------------------------------
# sample composition (host side: indices + token ids only)
# ---------------------------------------------------------------------------
def sample_batch(rng, batch, n_pool, texts, tok_encode):
    idx = np.full((batch, KMAX), -1, np.int32)
    off = np.zeros((batch, KMAX), np.int32)
    dec_in = np.zeros((batch, SEQ), np.int32)
    labels = np.zeros((batch, SEQ), np.int32)
    mask = np.zeros((batch, SEQ), np.float32)
    sample_texts = []
    for b in range(batch):
        r = rng.rand()
        if r < 0.03:
            k = 0
        elif r < 0.30:
            k = rng.randint(1, 4)
        elif r < 0.70:
            k = rng.randint(4, 11)
        else:
            k = rng.randint(11, KMAX + 1)
        spacing = 100 if rng.rand() < 0.7 else rng.randint(80, 161)
        start = 0 if rng.rand() < 0.5 else rng.randint(0, 600)
        k = min(k, max((2896 - start) // spacing, 0))
        rows = rng.randint(0, n_pool, k).astype(np.int32)
        idx[b, :k] = rows
        off[b, :k] = start + spacing * np.arange(k)
        text = " ".join(texts[j] for j in rows)
        sample_texts.append(text)
        ids = tok_encode(text)[: SEQ - 2]
        n = len(ids)
        dec_in[b, 0] = 1                      # <|startoftranscript|>
        dec_in[b, 1:n + 1] = ids
        labels[b, :n] = ids
        labels[b, n] = 0                      # <|endoftext|>
        mask[b, :n + 1] = 1.0
    return idx, off, dec_in, labels, mask, sample_texts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--pool", type=int, default=1600)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--warmup", type=int, default=300)
    ap.add_argument("--out", default="checkpoints/hf_staging/whisper")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--save-every", type=int, default=1000)
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--noise-max", type=float, default=0.0,
                    help="bake per-tile dither ~U(0,noise_max) into the "
                         "pool (see render_pool)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="d64 2+2 geometry — CPU smoke test of the trainer "
                         "machinery, not a capability run")
    ap.add_argument("--promote", default=None,
                    help="after training+eval, copy --out to this dir "
                         "(e.g. checkpoints/hf/whisper)")
    args = ap.parse_args()
    if args.cpu:
        import fvd_tpu

        fvd_tpu.force_cpu()

    import jax
    import jax.numpy as jnp
    import optax

    print(f"backend: {jax.default_backend()}", flush=True)

    # --- model: fabricate at whisper-base geometry or resume ---
    from make_hf_geometry_checkpoints import make_whisper

    if not (args.resume and os.path.isdir(args.out)):
        print("fabricating whisper-base-geometry model + tokenizer...", flush=True)
        if args.tiny:
            make_whisper(args.out, d_model=64, layers=2, heads=2, ffn=128,
                         vocab_size=600)
        else:
            make_whisper(args.out)
    from transformers import (FlaxWhisperForConditionalGeneration,
                              WhisperProcessor)

    processor = WhisperProcessor.from_pretrained(args.out)
    model = FlaxWhisperForConditionalGeneration.from_pretrained(
        args.out, dtype=jnp.bfloat16)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), model.params)
    tok = processor.tokenizer

    def tok_encode(text):
        ids = tok(text, add_special_tokens=False)["input_ids"]
        return [i for i in ids if i > 1]

    # --- phrase pools (train / held-out texts disjoint) ---
    rng = np.random.RandomState(args.seed)
    t0 = time.perf_counter()
    train_texts = gen_phrases(rng, args.pool)
    eval_texts = gen_phrases(rng, 64, taken=train_texts)
    print(f"rendering {args.pool}+64 phrases...", flush=True)
    pool_audio = render_pool(train_texts, rng, noise_max=args.noise_max)
    eval_audio = render_pool(eval_texts, np.random.RandomState(args.seed + 1),
                             hard_frac=0.0,  # eval on the base (bench) family
                             noise_max=args.noise_max)
    mel_filters = np.ascontiguousarray(
        processor.feature_extractor.mel_filters, np.float32)
    pool_dev = pool_power_mels(pool_audio, mel_filters)
    eval_pool_dev = pool_power_mels(eval_audio, mel_filters)
    print(f"pool ready in {time.perf_counter() - t0:.1f}s "
          f"({pool_dev.shape} on {pool_dev.device})", flush=True)

    # --- one fused train step: compose -> forward -> loss -> adamw ---
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(
            optax.warmup_cosine_decay_schedule(
                0.0, args.lr, args.warmup, max(args.steps, args.warmup + 1),
                end_value=args.lr * 0.03),
            b2=0.98, weight_decay=0.01),
    )
    opt_state = tx.init(params)

    from fvd_tpu.ops.whisper_frontend import compose_canvas

    compose = jax.vmap(compose_canvas, in_axes=(None, 0, 0))
    pos_ids = jnp.broadcast_to(jnp.arange(SEQ)[None], (args.batch, SEQ))

    def loss_fn(p, feats, dec_in, labels, mask):
        logits = model.module.apply(
            {"params": p}, feats, dec_in, jnp.ones_like(dec_in), pos_ids
        ).logits.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    @jax.jit
    def step(params, opt_state, pool, idx, off, dec_in, labels, mask):
        feats = compose(pool, idx, off).astype(jnp.bfloat16)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, feats, dec_in, labels, mask)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def save(p, tag=""):
        model.params = jax.device_get(p)
        model.save_pretrained(args.out)
        with open(os.path.join(args.out, "fvd_train_meta.json"), "w") as f:
            json.dump({"domain": "formant", "train": "pretrain_hf_whisper.py",
                       "steps": args.steps, "pool": args.pool,
                       "geometry": "whisper-base d512 6+6 h8 vocab51865"}, f)
        print(f"[save{tag}] -> {args.out}", flush=True)

    state = {"params": params}

    def on_term(signum, frame):
        print(f"signal {signum}: saving before exit", flush=True)
        save(state["params"], tag="-sig")
        os._exit(0)

    signal.signal(signal.SIGTERM, on_term)

    # --- eval: held-out phrases at slot 0, greedy generate ---
    # params stay ON DEVICE (pass via generate's params kwarg): a device_get
    # + re-upload of the 290 MB tree per eval costs ~20 min through a
    # degraded tunnel window (measured 2026-08-20) — the data must not move
    def evaluate(p, n=64, log_samples=2):
        idx = jnp.asarray(np.arange(n, dtype=np.int32)[:, None])
        off = jnp.zeros((n, 1), jnp.int32)
        feats = compose_canvas_batch_eval(eval_pool_dev, idx, off)
        exact = char_ok = char_tot = 0
        decoded_all = []
        for i in range(0, n, 16):
            ids = model.generate(feats[i:i + 16], params=p,
                                 max_length=MAX_CHARS + 6).sequences
            decoded_all += tok.batch_decode(np.asarray(ids),
                                            skip_special_tokens=True)
        for d, t in zip(decoded_all, eval_texts[:n]):
            d = d.strip()
            exact += d == t
            char_tot += len(t)
            char_ok += sum(a == b for a, b in zip(d, t))
        for d, t in zip(decoded_all[:log_samples], eval_texts[:log_samples]):
            print(f"    {t!r} -> {d.strip()!r}", flush=True)
        return exact / n, char_ok / max(char_tot, 1)

    compose_canvas_batch_eval = jax.jit(
        jax.vmap(compose_canvas, in_axes=(None, 0, 0)))

    # --- train loop ---
    data_rng = np.random.RandomState(args.seed + 7)
    t0 = time.perf_counter()
    for i in range(args.steps):
        idx, off, dec_in, labels, mask, _ = sample_batch(
            data_rng, args.batch, args.pool, train_texts, tok_encode)
        params, opt_state, loss = step(
            params, opt_state, pool_dev, jnp.asarray(idx), jnp.asarray(off),
            jnp.asarray(dec_in), jnp.asarray(labels), jnp.asarray(mask))
        state["params"] = params
        if i % 50 == 0 or i == args.steps - 1:
            print(f"[whisper] step {i:5d} loss {float(loss):.4f} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
        if args.eval_every and i > 0 and i % args.eval_every == 0:
            ex, ca = evaluate(params, n=32)
            print(f"[whisper] step {i}: held-out exact={ex:.3f} char={ca:.3f}",
                  flush=True)
        if args.save_every and i > 0 and i % args.save_every == 0:
            save(jax.device_get(params), tag=f"@{i}")

    final = jax.device_get(params)
    ex, ca = evaluate(params, n=64, log_samples=4)
    print(f"[whisper] FINAL held-out (64 phrases): exact={ex:.3f} char={ca:.3f}",
          flush=True)
    save(final)

    if args.promote:
        import shutil

        os.makedirs(os.path.dirname(args.promote), exist_ok=True)
        if os.path.isdir(args.promote):
            shutil.rmtree(args.promote)
        shutil.copytree(args.out, args.promote)
        print(f"promoted -> {args.promote}", flush=True)


if __name__ == "__main__":
    main()
