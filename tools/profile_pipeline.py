"""Per-node pipeline profiler.

Runs the hermetic pipeline (synthetic media + deterministic providers) twice
— warmup/compile, then measured — and prints a per-node wall-time table from
the structured tracer.  Optionally captures a ``jax.profiler`` device trace.

    python tools/profile_pipeline.py [--duration 30] [--fps 30] [--trace DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--fps", type=float, default=30.0)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--video", help="profile a real video instead of synthetic")
    ap.add_argument("--trace", help="directory for a jax.profiler trace")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--models", action="store_true",
                    help="real-model path: face video + trained checkpoints")
    args = ap.parse_args()

    import jax

    if args.cpu:
        import fvd_tpu

        fvd_tpu.force_cpu()

    import dataclasses

    from fvd_tpu.config import EvidenceConfig, default_config
    from fvd_tpu.graph import build_graph
    from fvd_tpu.runtime.scheduler import Scheduler
    from fvd_tpu.runtime.tracer import Tracer, set_tracer
    from fvd_tpu.state import State
    from fvd_tpu.synthetic import hermetic_providers, make_synthetic_video

    print(f"backend: {jax.default_backend()}")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.video:
        video = os.path.abspath(args.video)
    else:
        os.chdir(tempfile.mkdtemp(prefix="fvd_profile_"))
        if args.models:
            from fvd_tpu.synthetic import make_face_video

            video = make_face_video(
                "media", duration=args.duration, fps=args.fps,
                width=args.width, height=args.height,
            )
        else:
            video = make_synthetic_video(
                "media", duration=args.duration, fps=args.fps,
                width=args.width, height=args.height,
            )

    config = dataclasses.replace(
        default_config(), evidence=EvidenceConfig(rate_limit_s=0.0, max_workers=4)
    )
    if args.models:
        from fvd_tpu.providers.factory import production_providers

        providers = production_providers(
            checkpoint_dir=os.path.join(repo_root, "checkpoints"),
            use_llm=False, use_search=False,
        )
    else:
        providers = hermetic_providers(fps=args.fps)
    dag = build_graph(config, providers)

    print("warmup (compiling)...")
    t0 = time.perf_counter()
    Scheduler(dag).invoke(State(input_path=video))
    print(f"warmup: {time.perf_counter() - t0:.2f}s")

    tracer = set_tracer(Tracer(use_jax_annotations=bool(args.trace)))
    ctx = None
    if args.trace:
        jax.profiler.start_trace(args.trace)
    t0 = time.perf_counter()
    final = Scheduler(dag).invoke(State(input_path=video))
    total = time.perf_counter() - t0
    if args.trace:
        jax.profiler.stop_trace()
        print(f"device trace written to {args.trace}")

    print(f"\ntotal wall: {total:.3f}s   fake_probability={final.fake_probability}")
    print(f"{'node':14s} {'wall s':>8s} {'% of total':>11s}")
    for name, secs in sorted(tracer.summary().items(), key=lambda kv: -kv[1]):
        print(f"{name:14s} {secs:8.3f} {100 * secs / total:10.1f}%")
    print("(concurrent nodes overlap: per-node times can sum past the total)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
