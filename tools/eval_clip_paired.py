"""Paired eval: trained CLIP ViT-B/32-geometry checkpoint vs the dim-192 CLIP.

VERDICT r4 #1's adoption gate for the real-geometry C2 model: both providers
score the SAME fresh scenes (held-out seed, the trainer's three pair
families rendered at 224), each through its own inference convention — the
dim-192 JaxClip via its calibrated 112px towers, the ViT-B/32 checkpoint
via providers/hf_models.HFClip (raw cosines, the genuine-CLIP convention).

Metrics per provider:

* retrieval@1 over the unique-caption text scenes (cross image x caption
  cosine matrix, argmax per image);
* matched-vs-mismatched cosine margin;
* C2 band correctness: fraction of matched pairs scoring above the
  Consistent threshold (0.25) and mismatched pairs below Inconsistent
  (0.15) — config.gesture's thresholds, inherited from the reference
  (c2_gesture_narration_check.py:120-127).  The gate criterion is the
  BALANCED rate ((+)+(-))/2: a checkpoint can buy band(+)=1.0 by
  compressing matched variance through its calibration while leaving 18%
  of mismatched pairs above Inconsistent (the dim-192 does exactly this);
  C2's decision quality is correctness on BOTH sides.  Both components
  stay in the JSON;
* keyframe probe: make_face_video-style frames vs transcript phrases (the
  pair C2 actually scores at bench time) — reported for visibility.

Gate: new >= old on retrieval@1, margin, and balanced band rate.

    python tools/eval_clip_paired.py --new checkpoints/hf_staging/clip [--cpu]
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

CONSISTENT_T = 0.25
INCONSISTENT_T = 0.15


def cross_scores(provider, images, texts, chunk: int = 512) -> np.ndarray:
    """[n_images, n_texts] similarity matrix through the provider's own
    paired batch API (images repeated, texts tiled)."""
    n_i, n_t = len(images), len(texts)
    pairs_i, pairs_t = [], []
    for i in range(n_i):
        for t in range(n_t):
            pairs_i.append(images[i])
            pairs_t.append(texts[t])
    out = np.zeros(n_i * n_t, np.float32)
    for s in range(0, len(pairs_i), chunk):
        out[s:s + chunk] = provider.image_text_similarity_batch(
            pairs_i[s:s + chunk], pairs_t[s:s + chunk])
    return out.reshape(n_i, n_t)


def provider_metrics(provider, images, captions, kf_images, kf_texts) -> dict:
    cos = cross_scores(provider, images, captions)
    n = len(images)
    diag = np.diag(cos)
    off = (cos.sum() - np.trace(cos)) / (cos.size - n)
    r1 = float((cos.argmax(axis=1) == np.arange(n)).mean())
    matched_ok = float((diag > CONSISTENT_T).mean())
    off_mask = ~np.eye(n, dtype=bool)
    mismatched_ok = float((cos[off_mask] < INCONSISTENT_T).mean())
    kf = provider.image_text_similarity_batch(kf_images, kf_texts)
    return {
        "retrieval_at_1": r1,
        "margin": float(diag.mean() - off),
        "diag_mean": float(diag.mean()),
        "off_mean": float(off),
        "band_matched_gt_025": matched_ok,
        "band_mismatched_lt_015": mismatched_ok,
        "keyframe_vs_transcript_mean": float(np.mean(kf)),
        "keyframe_vs_transcript_max": float(np.max(kf)),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--new", default="checkpoints/hf_staging/clip")
    ap.add_argument("--old", default="checkpoints/clip.npz")
    ap.add_argument("--n", type=int, default=24,
                    help="text scenes for the retrieval matrix (n^2 pairs)")
    ap.add_argument("--seed", type=int, default=20260821)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)
    if args.cpu:
        import fvd_tpu

        fvd_tpu.force_cpu()

    from pretrain_hf_clip import (FACE_CAPTION, build_pool, make_face_scene)

    from fvd_tpu.models.synthetic_text import random_text
    from fvd_tpu.providers.hf_models import HFClip

    # --- fresh scenes (held-out seed; same families as training) ---
    rng = np.random.RandomState(args.seed)
    imgs, caps = build_pool(rng, args.n, 2, 1)
    images = [imgs[i] for i in range(len(imgs))]

    # keyframe probe: face frames vs transcript-phrase captions (C2's
    # bench-time pairing — no learnable correspondence, scores should sit
    # in/below the ambiguous band, far under the matched band)
    kf_images = [make_face_scene(rng) for _ in range(8)]
    kf_texts = [" ".join(random_text(rng, 3, 8) for _ in range(3))
                for _ in range(8)]

    # --- providers ---
    new = HFClip.from_local(args.new)
    results = {"new": provider_metrics(new, images, caps, kf_images, kf_texts)}

    old_metrics = None
    if os.path.exists(args.old):
        from fvd_tpu.models import encoders

        meta_path = args.old.replace(".npz", ".json")
        kwargs = {}
        if os.path.exists(meta_path):
            import inspect

            with open(meta_path) as f:
                meta = json.load(f)
            accepted = set(
                inspect.signature(encoders.JaxClip.__init__).parameters)
            kwargs = {k: v for k, v in meta.items() if k in accepted}
        old = encoders.JaxClip(checkpoint=args.old, **kwargs)
        old_metrics = provider_metrics(old, images, caps, kf_images, kf_texts)
        results["old"] = old_metrics

    for name in results:
        m = results[name]
        print(f"[{name}] retrieval@1={m['retrieval_at_1']:.3f} "
              f"margin={m['margin']:.3f} "
              f"diag={m['diag_mean']:.3f} off={m['off_mean']:.3f} "
              f"band(+)={m['band_matched_gt_025']:.3f} "
              f"band(-)={m['band_mismatched_lt_015']:.3f} "
              f"kf-vs-transcript={m['keyframe_vs_transcript_mean']:.3f}")

    gate = None
    if old_metrics is not None:
        nm = results["new"]

        def _balanced(m):
            return (m["band_matched_gt_025"] + m["band_mismatched_lt_015"]) / 2

        gate = bool(
            nm["retrieval_at_1"] >= old_metrics["retrieval_at_1"]
            and nm["margin"] >= old_metrics["margin"]
            and _balanced(nm) >= _balanced(old_metrics))
    results["meets_verdict_gate"] = gate
    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
