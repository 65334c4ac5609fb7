"""Train the MiniLM-L6-GEOMETRY Flax BERT encoder for E1 evidence ranking.

Round-4 closed A2 at reference geometry (trained whisper-base); this does
the same for E1's rerank model: the exact all-MiniLM-L6-v2 architecture the
reference loads (`e1_web_evidence.py:334-347`: 6-layer BERT, hidden 384,
12 heads, intermediate 1536, vocab 30522) trained contrastively on the
framework's claim/evidence ranking domain, so the HF path carries a
*working* checkpoint instead of the round-4 random-init fabrication.

Training distribution == E1's inference distribution: queries are spoken
claim renderings and documents are "{title} {snippet}" search-result
strings of the SAME underlying fact (tools/pretrain_text_encoder.py's
generator — synonym substitution, attribution reordering, digit<->word
numbers, headline framing).  In-batch negatives share templates and topics,
so slot values are what separates positives — the encoder must read content
words, exactly what E1's cosine rerank needs.

The forward matches providers/hf_models.HFTextEncoder bit-for-bit
(FlaxBertModel last_hidden_state -> attention-masked mean pooling), so the
trained params serve unchanged through the production provider.

Host work per step is fact rendering + WordPiece tokenization (~ms); each
step ships only token ids (int32 [2B, L] ~ 64 KB) — the small-dispatch
shape that survives degraded tunnel windows (CLAUDE.md).

    nohup python tools/pretrain_hf_minilm.py --steps 4000 --batch 96 \
        > /tmp/minilm_train.log 2>&1 &

Saves to --out (default checkpoints/hf_staging/minilm); promote with
--promote checkpoints/hf/minilm after the paired eval
(tools/eval_text_paired.py) beats the dim-192 text encoder.
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

MAX_LEN = 64   # whole-word lexicon => ~1 token/word; docs fit comfortably


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--warmup", type=int, default=200)
    ap.add_argument("--out", default="checkpoints/hf_staging/minilm")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--save-every", type=int, default=2000)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--promote", default=None,
                    help="after training+eval, copy --out to this dir as "
                         "float16 (e.g. checkpoints/hf/minilm)")
    args = ap.parse_args()
    if args.cpu:
        import fvd_tpu

        fvd_tpu.force_cpu()

    import jax
    import jax.numpy as jnp
    import optax

    from pretrain_text_encoder import make_fact, render_doc, render_fact

    print(f"backend: {jax.default_backend()}", flush=True)

    # --- model: fabricate at MiniLM-L6 geometry or resume ---
    from make_hf_geometry_checkpoints import make_minilm

    if not (args.resume and os.path.isdir(args.out)):
        print("fabricating MiniLM-L6-geometry model + tokenizer...", flush=True)
        make_minilm(args.out)
    from transformers import AutoTokenizer, FlaxBertModel

    tok = AutoTokenizer.from_pretrained(args.out)
    model = FlaxBertModel.from_pretrained(args.out, dtype=jnp.bfloat16)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), model.params)

    def tokenize(texts):
        enc = tok(texts, padding="max_length", truncation=True,
                  max_length=MAX_LEN, return_tensors="np")
        return (enc["input_ids"].astype(np.int32),
                enc["attention_mask"].astype(np.int32))

    def make_batch(rng, batch):
        """Unique facts; query = claim rendering, doc = search-result
        rendering of the same fact (pretrain_text_encoder.make_batch's
        scheme through the HF tokenizer)."""
        seen, qs, ds = set(), [], []
        while len(qs) < batch:
            f = make_fact(rng)
            key = json.dumps(f, sort_keys=True)
            if key in seen:
                continue
            seen.add(key)
            qs.append(render_fact(rng, f))
            ds.append(render_doc(rng, f))
        q_ids, q_mask = tokenize(qs)
        d_ids, d_mask = tokenize(ds)
        return q_ids, q_mask, d_ids, d_mask

    # --- fused train step: forward both sides -> InfoNCE -> AdamW ---
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(
            optax.warmup_cosine_decay_schedule(
                0.0, args.lr, args.warmup, max(args.steps, args.warmup + 1),
                end_value=args.lr * 0.03),
            b2=0.98, weight_decay=0.01),
    )
    opt_state = tx.init(params)

    def mean_pool(p, input_ids, attention_mask):
        # identical arithmetic to HFTextEncoder._forward
        out = model.module.apply({"params": p}, input_ids, attention_mask,
                                 deterministic=True)
        hidden = out.last_hidden_state
        mask = attention_mask[..., None].astype(hidden.dtype)
        summed = (hidden * mask).sum(axis=1)
        counts = mask.sum(axis=1).clip(1e-9)
        return (summed / counts).astype(jnp.float32)

    def loss_fn(p, q_ids, q_mask, d_ids, d_mask):
        q = mean_pool(p, q_ids, q_mask)
        d = mean_pool(p, d_ids, d_mask)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-8)
        d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)
        logits = (q @ d.T) / 0.07
        labels = jnp.arange(logits.shape[0])
        lq = -jnp.mean(jax.nn.log_softmax(logits, axis=1)[labels, labels])
        ld = -jnp.mean(jax.nn.log_softmax(logits, axis=0)[labels, labels])
        return (lq + ld) / 2

    @jax.jit
    def step(params, opt_state, q_ids, q_mask, d_ids, d_mask):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, q_ids, q_mask, d_ids, d_mask)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    embed = jax.jit(mean_pool)

    def save(p, tag=""):
        model.params = jax.device_get(p)
        model.save_pretrained(args.out)
        with open(os.path.join(args.out, "fvd_train_meta.json"), "w") as f:
            json.dump({"domain": "claims-evidence",
                       "train": "pretrain_hf_minilm.py",
                       "steps": args.steps, "seed": args.seed,
                       "geometry": "minilm-l6 bert 6L h384 i1536 vocab30522"},
                      f)
        print(f"[save{tag}] -> {args.out}", flush=True)

    state = {"params": params}

    def on_term(signum, frame):
        print(f"signal {signum}: saving before exit", flush=True)
        save(state["params"], tag="-sig")
        os._exit(0)

    signal.signal(signal.SIGTERM, on_term)

    def evaluate(p, n=64):
        """Held-out retrieval@1: fresh facts, n-way claim->doc."""
        ev_rng = np.random.RandomState(args.seed + 10_000)
        accs = []
        for _ in range(2):
            q_ids, q_mask, d_ids, d_mask = make_batch(ev_rng, n)
            q = np.asarray(embed(p, jnp.asarray(q_ids), jnp.asarray(q_mask)))
            d = np.asarray(embed(p, jnp.asarray(d_ids), jnp.asarray(d_mask)))
            q = q / (np.linalg.norm(q, axis=-1, keepdims=True) + 1e-8)
            d = d / (np.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)
            accs.append(((q @ d.T).argmax(axis=1) == np.arange(n)).mean())
        return float(np.mean(accs))

    # --- train loop ---
    data_rng = np.random.RandomState(args.seed + 7)
    t0 = time.perf_counter()
    for i in range(args.steps):
        q_ids, q_mask, d_ids, d_mask = make_batch(data_rng, args.batch)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(q_ids), jnp.asarray(q_mask),
            jnp.asarray(d_ids), jnp.asarray(d_mask))
        state["params"] = params
        if i % 50 == 0 or i == args.steps - 1:
            print(f"[minilm] step {i:5d} loss {float(loss):.4f} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
        if args.eval_every and i > 0 and i % args.eval_every == 0:
            print(f"[minilm] step {i}: held-out retrieval@1="
                  f"{evaluate(params):.3f}", flush=True)
        if args.save_every and i > 0 and i % args.save_every == 0:
            save(params, tag=f"@{i}")

    acc = evaluate(params)
    print(f"[minilm] FINAL held-out retrieval@1 (64-way): {acc:.3f}",
          flush=True)
    save(params)

    if args.promote:
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
