"""Interleaved A/B throughput benchmark for env-var perf levers.

The tunnel's dispatch latency swings 3x+ between runs (CLAUDE.md), so a
perf lever can never be judged from two separate bench runs.  This tool
runs bench.py's overlapped real-model passes with the lever toggled
PER PASS (A/B/A/B...) inside one process — both arms see the same tunnel
window, and per-arm bests/medians compare apples to apples.

    python tools/ab_bench.py FVD_TPU_FUSED_DETLM=1 [--passes 8] [--cpu]

The lever is an env assignment applied on B passes and removed on A
passes (levers are read at call time by the providers).  Multiple levers
may be given; they toggle together as one arm.

Prints one JSON line:
  {"lever": ..., "a_best": ..., "b_best": ..., "a_med": ..., "b_med": ...,
   "speedup_best": ..., "speedup_med": ..., "passes": [...]}
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("levers", nargs="+", help="NAME=VALUE env levers for the B arm")
    ap.add_argument("--passes", type=int, default=8,
                    help="total interleaved passes (half per arm)")
    ap.add_argument("--n-videos", type=int, default=8)
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--b-first", action="store_true",
                    help="start with the lever-ON arm")
    args = ap.parse_args()

    levers = []
    for spec in args.levers:
        name, _, val = spec.partition("=")
        if not name or not val:
            ap.error(f"lever must be NAME=VALUE: {spec!r}")
        levers.append((name, val))

    if args.cpu:
        import fvd_tpu

        fvd_tpu.force_cpu()
    import jax

    from fvd_tpu.batch import run_pipeline_many
    from fvd_tpu.config import EvidenceConfig, default_config
    from fvd_tpu.graph import build_graph
    from fvd_tpu.providers.coalesce import coalesce_providers
    from fvd_tpu.providers.factory import asr_speech_domain, production_providers
    from fvd_tpu.runtime.scheduler import Scheduler
    from fvd_tpu.state import State
    from fvd_tpu.synthetic import make_face_video

    log(f"backend: {jax.default_backend()}")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt_dir = os.path.join(repo_root, "checkpoints")
    os.chdir(tempfile.mkdtemp(prefix="fvd_ab_"))

    fps = 30.0
    sentences = [
        "the mayor said the city will cut taxes next year",
        "the river level rose two feet after the storm",
        "the new bridge opened to traffic last month",
        "the school board voted to extend the year",
        "the state added nine thousand jobs in july",
        "the court ruled the ban can not take effect",
        "the team won the final game by six points",
        "the museum opened a wing for modern art",
    ]
    renderer = asr_speech_domain(ckpt_dir)
    log(f"generating {args.n_videos} face videos ({args.duration}s @ {fps}fps, "
        f"{renderer} speech)...")
    videos = [
        make_face_video("media", name=f"clip{i}", duration=args.duration,
                        fps=fps, width=320, height=240, seed=i,
                        speech_text=sentences[i % len(sentences)],
                        speech_renderer=renderer)
        for i in range(args.n_videos)
    ]

    providers = production_providers(checkpoint_dir=ckpt_dir,
                                     recorded_services=True)
    providers, close_coalesce = coalesce_providers(providers)
    config = dataclasses.replace(
        default_config(), evidence=EvidenceConfig(rate_limit_s=0.0, max_workers=4)
    )
    dag = build_graph(config, providers)

    def set_arm(on: bool) -> None:
        for name, val in levers:
            if on:
                os.environ[name] = val
            else:
                os.environ.pop(name, None)

    # Warm both arms so every pass after this hits compiled programs.
    for arm_on in (False, True):
        set_arm(arm_on)
        t0 = time.perf_counter()
        final = Scheduler(dag).invoke(State(input_path=videos[0]))
        log(f"warmup arm={'B' if arm_on else 'A'}: "
            f"{time.perf_counter() - t0:.2f}s p={final.fake_probability:.4f}")

    results = []  # (arm, elapsed)
    for i in range(args.passes):
        arm_on = (i % 2 == 0) == args.b_first
        set_arm(arm_on)
        t0 = time.perf_counter()
        run_pipeline_many(videos, config, providers,
                          concurrency=args.concurrency)
        elapsed = time.perf_counter() - t0
        vpm = 60.0 / (elapsed / args.n_videos)
        results.append(("B" if arm_on else "A", elapsed))
        log(f"pass {i + 1} arm={'B' if arm_on else 'A'}: {elapsed:.2f}s "
            f"({vpm:.1f} videos/min)")
    set_arm(False)
    close_coalesce()

    a = sorted(e for arm, e in results if arm == "A")
    b = sorted(e for arm, e in results if arm == "B")
    out = {
        "lever": " ".join(f"{n}={v}" for n, v in levers),
        "a_best": round(min(a), 2), "b_best": round(min(b), 2),
        "a_med": round(statistics.median(a), 2),
        "b_med": round(statistics.median(b), 2),
        "speedup_best": round(min(a) / min(b), 3),
        "speedup_med": round(statistics.median(a) / statistics.median(b), 3),
        "passes": [[arm, round(e, 2)] for arm, e in results],
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
