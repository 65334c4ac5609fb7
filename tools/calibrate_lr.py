"""Calibrate LR fusion weights on the framework's own labeled corpus.

The shipped ``assets/lr_weights_pretrained.json`` is the REFERENCE's trained
vector (`lr_weights.json`, BASELINE.md) — its decision boundary was fit to
the reference's 11-video corpus, and under this framework's feature
distribution it separates fakes from reals without putting the fake above
the 0.5 verdict threshold (`/root/reference/app.py:332-334`; BENCH_r03
probe: sync 0.263 vs desync_texture 0.399 — ranked right, classified
wrong).  This tool fits a calibrated vector on a generated labeled corpus
(make_labeled_corpus recipes: plain fakes, ambiguous fakes, hard reals)
with full-batch logistic regression, validates on FRESH seeds, and writes
``assets/lr_weights_calibrated.json`` — which the bench probe then scores
with so its discrimination check is a true classification check.

    python tools/calibrate_lr.py [--cpu] [--n-real 6 --n-fake 8 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

FEATURES = ("speech_rate", "pause_ratio", "lip_sync", "gesture_score",
            "blink_rate", "headpose_jerk", "texture", "claim_reliability",
            "evidence_reliability")


def pipeline_features(videos, labels, config, providers):
    """Run the full 16-node DAG per video; return (X, y) feature matrix."""
    from fvd_tpu.runtime.scheduler import Scheduler
    from fvd_tpu.graph import build_graph
    from fvd_tpu.state import State

    dag = build_graph(config, providers)
    X, y = [], []
    for path, label in zip(videos, labels):
        t0 = time.perf_counter()
        final = Scheduler(dag).invoke(State(input_path=path))
        feats = final.features or {}
        X.append([float(feats.get(k, 0.0)) for k in FEATURES])
        y.append(label)
        print(f"  {os.path.basename(path):34s} label={label} "
              f"p_ref={final.fake_probability:.3f} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)
    return np.asarray(X, np.float64), np.asarray(y, np.float64)


#: sign constraints matching the reference's trained semantics
#: (lr_weights.json: supported claims and reliable evidence argue REAL;
#: texture argues FAKE) — an 18-sample fit can invert these through
#: collinearity with the hard-real recipes (claimless noisy reals), and a
#: semantically-backwards vector must not ship even if it classifies
SIGN = {"claim_reliability": -1, "evidence_reliability": -1, "texture": +1,
        "lip_sync": -1}


def fit_lr(X, y, l2=1e-3, lr=0.5, epochs=4000):
    """Full-batch projected-GD logistic regression (bias unregularized;
    SIGN-constrained coordinates projected each step)."""
    n, d = X.shape
    w = np.zeros(d)
    b = 0.0
    signs = np.array([SIGN.get(k, 0) for k in FEATURES], np.float64)
    for _ in range(epochs):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
        g = p - y
        w -= lr * (X.T @ g / n + l2 * w)
        b -= lr * g.mean()
        w = np.where(signs > 0, np.maximum(w, 0.0),
                     np.where(signs < 0, np.minimum(w, 0.0), w))
    return w, b


def predict(X, w, b):
    return 1.0 / (1.0 + np.exp(-np.clip(X @ w + b, -30, 30)))


def build(args, seed_shift, tag):
    from make_labeled_corpus import build_corpus

    out = tempfile.mkdtemp(prefix=f"fvd_calib_{tag}_")
    # seed_shift picks disjoint seeds (build_corpus seeds are 100/200/300/400
    # + index; shifting by 50 keeps families but fresh instances)
    import make_labeled_corpus as mlc
    import fvd_tpu.synthetic as syn

    orig = syn.make_face_video

    def shifted(*a, **kw):
        kw["seed"] = kw.get("seed", 0) + seed_shift
        return orig(*a, **kw)

    mlc.make_face_video = shifted
    try:
        paths = build_corpus(out, args.n_real, args.n_fake, args.duration,
                             fps=args.fps, n_ambiguous=args.ambiguous,
                             n_hard_real=args.hard_reals)
    finally:
        mlc.make_face_video = orig
    labels = [0 if "_real_" in os.path.basename(p) else 1 for p in paths]
    return paths, labels


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n-real", type=int, default=6)
    ap.add_argument("--n-fake", type=int, default=8)
    ap.add_argument("--ambiguous", type=int, default=2)
    ap.add_argument("--hard-reals", type=int, default=2)
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--fps", type=float, default=30.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--refit-from-meta", action="store_true",
                    help="refit from the persisted feature matrices in "
                         "*_meta.json (seconds) instead of re-running the "
                         "pipeline (tens of minutes)")
    args = ap.parse_args(argv)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = args.out or os.path.join(repo, "assets", "lr_weights_calibrated.json")
    if args.refit_from_meta:
        with open(out.replace(".json", "_meta.json")) as f:
            meta = json.load(f)
        Xtr = np.asarray(meta["train"]["X"])
        ytr = np.asarray(meta["train"]["y"])
        fit_rows = [i for i, v in enumerate(meta["train"]["videos"])
                    if "_real_vlog" not in v]
        w, b = fit_lr(Xtr[fit_rows], ytr[fit_rows])
        Xv, yv = np.asarray(meta["val"]["X"]), np.asarray(meta["val"]["y"])
        pv = predict(Xv, w, b)
        acc_v = float(np.mean((pv > 0.5) == yv))
        payload = {"bias": float(b)}
        payload.update({k: float(v) for k, v in zip(FEATURES, w)})
        with open(out, "w") as f:
            json.dump(payload, f, indent=2)
        meta["val_acc"] = acc_v
        meta["fit"] = "refit-from-meta, hard reals excluded"
        with open(out.replace(".json", "_meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
        print(f"refit saved {out} (val acc {acc_v:.3f}; "
              f"p(val)={np.round(pv, 3).tolist()})")
        return 0

    import fvd_tpu

    if args.cpu:
        fvd_tpu.force_cpu()

    import dataclasses

    from fvd_tpu.config import EvidenceConfig, default_config
    from fvd_tpu.providers.factory import default_checkpoint_dir, production_providers

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scratch = tempfile.mkdtemp(prefix="fvd_calib_run_")
    os.chdir(scratch)  # nodes write cwd-relative artifacts
    config = dataclasses.replace(
        default_config(), evidence=EvidenceConfig(rate_limit_s=0.0, max_workers=4))
    providers = production_providers(
        checkpoint_dir=os.path.join(repo, "checkpoints"), recorded_services=True)

    print("— train corpus —", flush=True)
    train_videos, train_labels = build(args, 0, "train")
    Xtr, ytr = pipeline_features(train_videos, train_labels, config, providers)
    # hard reals (_real_vlog: sensor-noise + claimless speech) are DESIGNED
    # false positives — the reference's own trained weights misclassify its
    # noisy reals too (BBC real, texture 0.65), and the production answer is
    # the online-learning arc, not the prior.  Including them in the fit
    # suppresses the texture weight toward zero through label conflict, so
    # they are excluded from the FIT and kept in the corpus for reporting.
    fit_rows = [i for i, v in enumerate(train_videos)
                if "_real_vlog" not in os.path.basename(v)]
    w, b = fit_lr(Xtr[fit_rows], ytr[fit_rows])
    ptr = predict(Xtr, w, b)
    acc_tr = float(np.mean((ptr > 0.5) == ytr))
    print(f"train acc {acc_tr:.3f}  p(real) {ptr[np.asarray(ytr) == 0].round(3)}"
          f"  p(fake) {ptr[np.asarray(ytr) == 1].round(3)}", flush=True)

    print("— fresh-seed validation corpus —", flush=True)
    val_videos, val_labels = build(args, 50, "val")
    Xv, yv = pipeline_features(val_videos, val_labels, config, providers)
    pv = predict(Xv, w, b)
    acc_v = float(np.mean((pv > 0.5) == yv))
    print(f"val acc {acc_v:.3f}  p(real) {pv[np.asarray(yv) == 0].round(3)}"
          f"  p(fake) {pv[np.asarray(yv) == 1].round(3)}", flush=True)

    out = args.out or os.path.join(repo, "assets", "lr_weights_calibrated.json")
    payload = {"bias": float(b)}
    payload.update({k: float(v) for k, v in zip(FEATURES, w)})
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    meta = {"train_acc": acc_tr, "val_acc": acc_v,
            "corpus": {"n_real": args.n_real, "n_fake": args.n_fake,
                       "ambiguous": args.ambiguous, "hard_reals": args.hard_reals,
                       "duration": args.duration, "fps": args.fps},
            "sign_constraints": SIGN,
            # the raw fit data, so refits don't need 40 min of pipeline runs
            "train": {"X": Xtr.tolist(), "y": ytr.tolist(),
                      "videos": [os.path.basename(v) for v in train_videos]},
            "val": {"X": Xv.tolist(), "y": yv.tolist(),
                    "videos": [os.path.basename(v) for v in val_videos]},
            "date": "2026-08-20"}
    with open(out.replace(".json", "_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(f"saved {out}  (train {acc_tr:.3f} / val {acc_v:.3f})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
