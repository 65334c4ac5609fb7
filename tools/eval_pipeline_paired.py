"""Paired END-TO-END pipeline contract for checkpoint adoption.

A candidate checkpoint ships only if the full 16-node pipeline keeps its
discrimination on the SAME fresh clips (CLAUDE.md adoption recipe): one
in-sync clip and one desync+texture fake are rendered once, then analyzed
with the SHIPPED checkpoints and with the candidate overrides; the
sync/desync separation (lip_sync feature and fused probability) must
survive.

    python tools/eval_pipeline_paired.py \
        --override face_ssd.npz=/tmp/det_r3/face_ssd.npz [--cpu] [--heldout]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def compose_ckpt_dir(base: str, overrides: dict) -> str:
    out = tempfile.mkdtemp(prefix="fvd_ckpt_")
    for f in os.listdir(base):
        if f.endswith((".npz", ".json")):
            os.symlink(os.path.join(base, f), os.path.join(out, f))
    for name, path in overrides.items():
        dst = os.path.join(out, name)
        if os.path.lexists(dst):
            os.unlink(dst)
        shutil.copy2(path, dst)
        sidecar = path.replace(".npz", ".json")
        if path.endswith(".npz") and os.path.exists(sidecar):
            dst_side = dst.replace(".npz", ".json")
            if os.path.lexists(dst_side):
                os.unlink(dst_side)
            shutil.copy2(sidecar, dst_side)
    return out


def analyze(video: str, ckpt_dir: str):
    from fvd_tpu.config import EvidenceConfig, default_config
    from fvd_tpu.graph import build_graph
    from fvd_tpu.providers.factory import production_providers
    from fvd_tpu.runtime.scheduler import Scheduler
    from fvd_tpu.state import State

    cfg = dataclasses.replace(
        default_config(),
        evidence=EvidenceConfig(rate_limit_s=0.0, max_workers=2))
    providers = production_providers(checkpoint_dir=ckpt_dir,
                                     recorded_services=True)
    final = Scheduler(build_graph(cfg, providers)).invoke(State(input_path=video))
    return {"p": round(float(final.fake_probability), 4),
            "lip": round(float(final.features.get("lip_sync", 0.0)), 4),
            "words": int(final.word_count or 0),
            "claims": len(final.claims or [])}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--override", action="append", default=[],
                    metavar="NAME=PATH",
                    help="checkpoint file(s) the candidate replaces, e.g. "
                         "face_ssd.npz=/tmp/det_r3/face_ssd.npz")
    ap.add_argument("--duration", type=float, default=8.0)
    ap.add_argument("--fps", type=float, default=10.0)
    ap.add_argument("--heldout", action="store_true",
                    help="render the clips in the held-out face distribution")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)
    if args.cpu:
        import fvd_tpu

        fvd_tpu.force_cpu()

    overrides = dict(o.split("=", 1) for o in args.override)
    base = os.path.join(REPO, "checkpoints")
    new_dir = compose_ckpt_dir(base, overrides)

    from fvd_tpu.providers.factory import asr_speech_domain
    from fvd_tpu.synthetic import make_face_video

    cwd = os.getcwd()
    work = tempfile.mkdtemp(prefix="fvd_paired_")
    os.chdir(work)
    try:
        renderer = asr_speech_domain(base)
        common = dict(duration=args.duration, fps=args.fps, width=320,
                      height=240, speech_renderer=renderer,
                      heldout=args.heldout,
                      speech_text="the river level rose two feet")
        sync = make_face_video("media", name="sync", seed=21, **common)
        fake = make_face_video("media", name="fake", seed=22,
                               mouth_gate_hz=1.37, texture_noise=14.0,
                               **common)
        results = {}
        for tag, ckpt in (("old", base), ("new", new_dir)):
            results[tag] = {"sync": analyze(sync, ckpt),
                            "fake": analyze(fake, ckpt)}
            print(f"[{tag}] sync={results[tag]['sync']} "
                  f"fake={results[tag]['fake']}", flush=True)
    finally:
        os.chdir(cwd)

    sep_old = results["old"]["sync"]["lip"] - results["old"]["fake"]["lip"]
    sep_new = results["new"]["sync"]["lip"] - results["new"]["fake"]["lip"]
    p_gap_old = results["old"]["fake"]["p"] - results["old"]["sync"]["p"]
    p_gap_new = results["new"]["fake"]["p"] - results["new"]["sync"]["p"]
    ok = sep_new >= 0.5 * sep_old and sep_new > 0.2 and p_gap_new > 0.0
    results["lip_separation"] = {"old": round(sep_old, 4), "new": round(sep_new, 4)}
    results["prob_gap"] = {"old": round(p_gap_old, 4), "new": round(p_gap_new, 4)}
    results["contract_ok"] = bool(ok)
    print(f"paired pipeline contract: {'OK' if ok else 'FAIL'} "
          f"(lip separation {sep_old:.3f}->{sep_new:.3f}, "
          f"prob gap {p_gap_old:.3f}->{p_gap_new:.3f})")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
