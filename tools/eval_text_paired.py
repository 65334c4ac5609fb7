"""Paired eval: trained MiniLM-L6-geometry encoder vs the dim-192 TextTower.

VERDICT r4 #2's adoption gate for the real-geometry E1 rerank model: both
providers embed the SAME fresh claims and evidence documents (held-out
seed of tools/pretrain_text_encoder.py's fact generator) and are scored on
the ranking task E1 actually performs (`nodes/e1_evidence.py` rank_results:
cosine of claim embedding vs "{title} {snippet}" embeddings).

Metrics per provider, over n ranking tasks with a shared n-doc pool (every
other fact's doc is a same-template distractor — slot values are the only
separator):

* retrieval@1 — the top-ranked doc is the claim's own coverage;
* MRR — mean reciprocal rank of the true doc;
* top5 — true doc lands in E1's kept top-5 (e1_web_evidence.py:358 keeps 5).

Gate: new >= old on all three.

    python tools/eval_text_paired.py --new checkpoints/hf_staging/minilm [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("HF_HUB_OFFLINE", "1")

import numpy as np


def ranking_metrics(encoder, claims, docs) -> dict:
    q = np.asarray(encoder.encode_batch(claims), np.float32)
    d = np.asarray(encoder.encode_batch(docs), np.float32)
    q = q / (np.linalg.norm(q, axis=-1, keepdims=True) + 1e-8)
    d = d / (np.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)
    cos = q @ d.T
    n = len(claims)
    order = np.argsort(-cos, axis=1)
    ranks = np.empty(n, np.int64)
    for i in range(n):
        ranks[i] = int(np.where(order[i] == i)[0][0]) + 1
    return {
        "retrieval_at_1": float((ranks == 1).mean()),
        "mrr": float((1.0 / ranks).mean()),
        "top5": float((ranks <= 5).mean()),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--new", default="checkpoints/hf_staging/minilm")
    ap.add_argument("--old", default="checkpoints/text_encoder.npz")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--seed", type=int, default=20260821)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)
    if args.cpu:
        import fvd_tpu

        fvd_tpu.force_cpu()

    from pretrain_text_encoder import make_fact, render_doc, render_fact

    from fvd_tpu.providers.hf_models import HFTextEncoder

    new = HFTextEncoder.from_local(args.new)

    old = None
    if os.path.exists(args.old):
        from fvd_tpu.models import encoders

        meta = {}
        sidecar = args.old.replace(".npz", ".json")
        if os.path.exists(sidecar):
            with open(sidecar) as fh:
                meta = json.load(fh)
        old = encoders.JaxTextEncoder(
            checkpoint=args.old, dim=int(meta.get("dim", 192)),
            depth=int(meta.get("depth", 6)),
            out_dim=int(meta.get("out_dim", 256)))

    rng = np.random.RandomState(args.seed)
    agg = {"new": [], "old": []}
    for _ in range(args.rounds):
        seen, claims, docs = set(), [], []
        while len(claims) < args.n:
            f = make_fact(rng)
            key = json.dumps(f, sort_keys=True)
            if key in seen:
                continue
            seen.add(key)
            claims.append(render_fact(rng, f))
            docs.append(render_doc(rng, f))
        agg["new"].append(ranking_metrics(new, claims, docs))
        if old is not None:
            agg["old"].append(ranking_metrics(old, claims, docs))

    results = {}
    for name, rounds in agg.items():
        if not rounds:
            continue
        results[name] = {k: float(np.mean([r[k] for r in rounds]))
                         for k in rounds[0]}
        m = results[name]
        print(f"[{name}] retrieval@1={m['retrieval_at_1']:.3f} "
              f"mrr={m['mrr']:.3f} top5={m['top5']:.3f}")

    gate = None
    if "old" in results:
        gate = bool(all(results["new"][k] >= results["old"][k]
                        for k in ("retrieval_at_1", "mrr", "top5")))
    results["meets_verdict_gate"] = gate
    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
