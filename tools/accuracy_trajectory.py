"""Record the end-to-end accuracy trajectory under online LR training.

Mirrors the reference's defining experiment: repeated labeled batch runs
with `--train` online SGD, accuracy climbing run over run
(`/root/reference/results/batch_results1.txt` ... `batch_results10.txt`,
`batch_test.py:158-189`).  Everything runs hermetically: procedural-face
corpus (tools/make_labeled_corpus.py), trained device models, recorded
LLM/search fixtures.

    python tools/accuracy_trajectory.py --workdir /tmp/traj --runs 10
    python tools/accuracy_trajectory.py --cpu ...   # force the CPU backend
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="traj_run")
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--n-real", type=int, default=6)
    ap.add_argument("--n-fake", type=int, default=6)
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--ambiguous", type=int, default=0,
                    help="additional feature-ambiguous fakes (subtle "
                         "manipulations at feature-sensitivity edges — "
                         "makes run-1 accuracy start below 100%% like the "
                         "reference's 63.64%%)")
    ap.add_argument("--hard-reals", type=int, default=0,
                    help="additional noisy genuine clips with no verifiable "
                         "claims (false-positive hard cases: under the "
                         "pretrained weights they start on the fake side "
                         "with a deficit near the 100-retry movement "
                         "budget, so run-1 accuracy starts below 100%%)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the harness pins "
                         "jax_platforms at import; see CLAUDE.md)")
    ap.add_argument("--baseline-eval", action="store_true",
                    help="record a run-0 WITHOUT --train first: the "
                         "pre-training accuracy baseline.  The reference's "
                         "63.64%% run-1 rows behave exactly like this — "
                         "every WRONG row carries p<0.5, which persisting "
                         "per-attempt retraining would have crossed "
                         "(tools/analyze_reference_trajectory.py), so its "
                         "first recorded run is an untrained baseline in "
                         "all but name")
    ap.add_argument("--fresh-weights", action="store_true",
                    help="start from all-zero LR weights instead of the "
                         "shipped pretrained ones — records the full "
                         "online-learning climb, mirroring the reference's "
                         "63.64%%->100%% arc")
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS",
            (os.environ.get("XLA_FLAGS", "") +
             " --xla_force_host_platform_device_count=1").strip())
        import fvd_tpu

        fvd_tpu.force_cpu()

    os.makedirs(args.workdir, exist_ok=True)
    os.chdir(args.workdir)

    from tools.make_labeled_corpus import build_corpus

    if not os.path.isdir("videos") or not os.listdir("videos"):
        print("generating labeled corpus...")
        build_corpus("videos", args.n_real, args.n_fake, args.duration,
                     n_ambiguous=args.ambiguous, n_hard_real=args.hard_reals)

    from fvd_tpu import batch
    from fvd_tpu.providers import set_providers
    from fvd_tpu.providers.factory import production_providers

    set_providers(production_providers(
        checkpoint_dir=os.path.join(REPO, "checkpoints"), recorded_services=True))

    if args.fresh_weights and not os.path.exists("lr_weights.json"):
        import json

        from fvd_tpu.ops.fusion import FEATURE_ORDER

        with open("lr_weights.json", "w") as f:
            json.dump({"bias": 0.0, **{k: 0.0 for k in FEATURE_ORDER}}, f)
        print("starting from all-zero LR weights")

    accs = []
    attempts = []
    runs = [(r, True) for r in range(1, args.runs + 1)]
    if args.baseline_eval:
        runs.insert(0, (0, False))
    for run, train in runs:
        results = f"results/batch_results{run}.txt"
        print(f"=== run {run}/{args.runs} ({'--train' if train else 'eval baseline'}) ===",
              flush=True)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            batch.main((["--train"] if train else []) + ["--results", results])
        out = buf.getvalue()
        print(out, flush=True)
        with open(results) as f:
            table = f.read()
        m = re.search(r"Total Accuracy: ([0-9.]+)%", table)
        accs.append(float(m.group(1)) if m else float("nan"))
        # total SGD retries this run: the online-learning effort curve
        attempts.append(sum(int(a) for a in re.findall(r"attempts=(\d+)", out)))
        print(f"run {run}: accuracy {accs[-1]}% (total attempts {attempts[-1]})",
              flush=True)

    print("trajectory:", " -> ".join(f"{a:.2f}%" for a in accs))
    print("attempts:  ", " -> ".join(str(a) for a in attempts))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
