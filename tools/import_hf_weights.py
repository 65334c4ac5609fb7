"""Import the reference's exact model checkpoints for weight-compatible
providers.

Run this where the HuggingFace checkpoints are available (any machine with
network or a model cache), then copy the output directory to this host:

    python tools/import_hf_weights.py --out checkpoints/hf \
        --minilm sentence-transformers/all-MiniLM-L6-v2 \
        --clip openai/clip-vit-base-patch32 \
        --whisper openai/whisper-base

Each model is materialized as a self-contained local directory (Flax
weights + tokenizer/processor files).  ``providers/factory.py`` picks them
up automatically from ``checkpoints/hf/{minilm,clip,whisper}``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def import_model(kind: str, repo: str, out_dir: str) -> None:
    from transformers import AutoProcessor, AutoTokenizer

    dest = os.path.join(out_dir, kind)
    os.makedirs(dest, exist_ok=True)
    print(f"[{kind}] importing {repo} -> {dest}")

    if kind == "minilm":
        from transformers import FlaxAutoModel

        model = FlaxAutoModel.from_pretrained(repo, from_pt=True)
        tok = AutoTokenizer.from_pretrained(repo)
        model.save_pretrained(dest)
        tok.save_pretrained(dest)
    elif kind == "clip":
        from transformers import FlaxCLIPModel

        model = FlaxCLIPModel.from_pretrained(repo, from_pt=True)
        proc = AutoProcessor.from_pretrained(repo)
        model.save_pretrained(dest)
        proc.save_pretrained(dest)
    elif kind == "whisper":
        from transformers import FlaxWhisperForConditionalGeneration, WhisperProcessor

        model = FlaxWhisperForConditionalGeneration.from_pretrained(repo, from_pt=True)
        proc = WhisperProcessor.from_pretrained(repo)
        model.save_pretrained(dest)
        proc.save_pretrained(dest)
    else:
        raise ValueError(kind)
    print(f"[{kind}] done")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="checkpoints/hf")
    ap.add_argument("--minilm", default="sentence-transformers/all-MiniLM-L6-v2")
    ap.add_argument("--clip", default="openai/clip-vit-base-patch32")
    ap.add_argument("--whisper", default="openai/whisper-base")
    ap.add_argument("--skip", nargs="*", default=[], choices=["minilm", "clip", "whisper"])
    args = ap.parse_args()

    for kind, repo in [("minilm", args.minilm), ("clip", args.clip),
                       ("whisper", args.whisper)]:
        if kind in args.skip:
            continue
        try:
            import_model(kind, repo, args.out)
        except Exception as e:
            print(f"[{kind}] FAILED: {e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
