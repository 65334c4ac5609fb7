"""Paired evaluation of two ASR checkpoints on fresh utterance families.

The adoption contract (CLAUDE.md): continuation finetunes ship ONLY on a
paired-eval win — both checkpoints decode the SAME fresh samples, so the
comparison is noise-matched.  Families:

* ``base``  — formant_speech, the shipped checkpoint's domain (the audio
  make_face_video / bench render); a regression here vetoes adoption.
* ``hard``  — formant_speech_hard (rate variation, coarticulation
  undershoot, F0 drift, reverb; models/synthetic_speech.py) — the round-3
  held-out family the new data idea targets.

    python tools/eval_asr_paired.py --old checkpoints/asr_formant.npz \
        --new /tmp/asr_r3/asr_formant.npz --n 64 --cpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_ckpt(path: str):
    import jax
    import jax.numpy as jnp

    from fvd_tpu.models import asr
    from fvd_tpu.models.encoders import load_params

    with open(path.replace(".npz", ".json")) as f:
        meta = json.load(f)
    dim, depth = int(meta["dim"]), int(meta["depth"])
    mel_frames, max_tokens = int(meta["chunk_frames"]), int(meta["max_tokens"])
    model = asr.AsrModel(dim=dim, depth=depth)
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, mel_frames, asr.N_MELS), jnp.float32),
        jnp.zeros((1, max_tokens), jnp.int32))
    params = load_params(path, template)
    return params, meta


def decode_all(params, meta, mels, max_tokens):
    import jax.numpy as jnp

    from fvd_tpu.models import asr
    from fvd_tpu.models.transformer import ByteTokenizer

    tok = ByteTokenizer()
    ids = asr.greedy_decode(params, jnp.asarray(mels), dim=int(meta["dim"]),
                            depth=int(meta["depth"]), max_tokens=max_tokens)
    return [tok.decode(row).strip() for row in np.asarray(ids)]


def score(decoded, texts):
    exact = sum(d == t for d, t in zip(decoded, texts)) / max(len(texts), 1)
    ok = tot = 0
    for d, t in zip(decoded, texts):
        tot += len(t)
        ok += sum(a == b for a, b in zip(d, t))
    return exact, ok / max(tot, 1)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", default="checkpoints/asr_formant.npz")
    ap.add_argument("--new", required=True)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--seed", type=int, default=20260819)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)
    if args.cpu:
        import fvd_tpu

        fvd_tpu.force_cpu()

    from pretrain_asr import Domain, asr_batch

    from fvd_tpu.models.synthetic_speech import formant_speech_hard
    from fvd_tpu.models.transformer import ByteTokenizer

    old_p, old_m = load_ckpt(args.old)
    new_p, new_m = load_ckpt(args.new)
    mel_frames = int(old_m["chunk_frames"])
    max_tokens = int(old_m["max_tokens"])
    assert mel_frames == int(new_m["chunk_frames"])
    dither = float(old_m.get("dither", 0.0))
    tok = ByteTokenizer()

    results = {}
    for fam in ("base", "hard"):
        dom = Domain("formant", noise=dither)
        if fam == "hard":
            base_render = None

            def render(text, rng=None, _d=dither):
                rng = rng or np.random.RandomState(0)
                a = formant_speech_hard(text, rng, variability=1.0)
                if _d > 0:
                    a = a + _d * rng.randn(len(a)).astype(np.float32)
                return a

            dom.render = render
        rng = np.random.RandomState(args.seed + (1 if fam == "hard" else 0))
        mels, _, _, texts = asr_batch(rng, args.n, tok, mel_frames, max_tokens,
                                      domain=dom)
        for name, params, meta in (("old", old_p, old_m), ("new", new_p, new_m)):
            exact, char = score(decode_all(params, meta, mels, max_tokens), texts)
            results[f"{fam}_{name}"] = {"exact": round(exact, 4),
                                        "char": round(char, 4)}
            print(f"[{fam}] {name}: exact={exact:.3f} char={char:.3f}",
                  flush=True)

    win = (results["hard_new"]["exact"] > results["hard_old"]["exact"]
           and results["base_new"]["exact"] >= results["base_old"]["exact"] - 0.03)
    results["adopt"] = bool(win)
    print(f"paired verdict: {'ADOPT' if win else 'REJECT'} "
          f"(hard {results['hard_old']['exact']}->{results['hard_new']['exact']}, "
          f"base {results['base_old']['exact']}->{results['base_new']['exact']})")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
