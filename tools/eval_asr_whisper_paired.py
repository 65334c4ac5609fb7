"""Paired eval: trained whisper-base-geometry checkpoint vs the dim-192 ASR.

VERDICT r3 #3's adoption gate for the real-geometry ASR: both models decode
the SAME fresh utterances (noise-matched), each through its own inference
convention — the dim-192 encoder-decoder via its 128-frame greedy decode
(tools/eval_asr_paired.py conventions), the whisper-geometry model via its
30 s window + generate (providers/hf_models.HFWhisperASR path).  Two
levels:

* utterance: 64 fresh single phrases (<=10 chars, the dim-192 training
  budget) — exact / char accuracy;
* transcript: full 30 s `gated_speech` sentences through BOTH providers'
  ``transcribe()`` — word accuracy on the spoken words (the A2-node-level
  comparison the bench pipeline actually exercises).

    python tools/eval_asr_whisper_paired.py \
        --whisper checkpoints/hf_staging/whisper [--cpu] [--n 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def word_acc(hyp: str, ref_words: list) -> float:
    hyp_words = hyp.split()
    ok = sum(a == b for a, b in zip(hyp_words, ref_words))
    return ok / max(len(ref_words), 1)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--whisper", default="checkpoints/hf_staging/whisper")
    ap.add_argument("--old", default="checkpoints/asr_formant.npz")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--n-sentences", type=int, default=12)
    ap.add_argument("--seed", type=int, default=20260820)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)
    if args.cpu:
        import fvd_tpu

        fvd_tpu.force_cpu()

    import jax.numpy as jnp

    from eval_asr_paired import load_ckpt, score
    from pretrain_asr import Domain

    from fvd_tpu.models import asr as asr_mod
    from fvd_tpu.models.transformer import ByteTokenizer
    from fvd_tpu.providers.hf_models import HFWhisperASR
    from fvd_tpu.ops.whisper_frontend import whisper_log_mel

    old_p, old_m = load_ckpt(args.old)
    mel_frames = int(old_m["chunk_frames"])
    max_tokens = int(old_m["max_tokens"])
    dither = float(old_m.get("dither", 0.0))
    tok = ByteTokenizer()
    hf = HFWhisperASR.from_local(args.whisper)
    assert hf._mel_filters is not None

    # --- utterance level: same fresh audio to both models ---
    dom = Domain("formant", noise=dither)
    rng = np.random.RandomState(args.seed)
    texts, audios = [], []
    for _ in range(args.n):
        t = dom.utterance(rng)
        texts.append(t)
        audios.append(dom.render(t, rng))

    # dim-192 path: its own log-mel + greedy decode at 128 frames
    pad_len = mel_frames * asr_mod.HOP
    mels = np.zeros((args.n, mel_frames, asr_mod.N_MELS), np.float32)
    import jax

    batched_mel = jax.jit(jax.vmap(asr_mod.log_mel))
    buf = np.zeros((args.n, pad_len), np.float32)
    for i, a in enumerate(audios):
        n = min(len(a), pad_len)
        buf[i, :n] = a[:n]
    m = np.asarray(batched_mel(jnp.asarray(buf)))
    for i, a in enumerate(audios):
        frames_i = min(1 + len(a) // asr_mod.HOP, mel_frames, m.shape[1])
        mels[i, :frames_i] = m[i, :frames_i]
    ids = asr_mod.greedy_decode(old_p, jnp.asarray(mels), dim=int(old_m["dim"]),
                                depth=int(old_m["depth"]), max_tokens=max_tokens)
    old_decoded = [tok.decode(row).strip() for row in np.asarray(ids)]
    old_exact, old_char = score(old_decoded, texts)

    # whisper path: utterance at slot 0 of the 30 s window, generate
    fb = jnp.asarray(hf._mel_filters)
    new_decoded = []
    for i in range(0, args.n, 16):
        feats = jnp.stack([
            whisper_log_mel(jnp.asarray(a, jnp.float32), fb)
            for a in audios[i:i + 16]])
        out = hf.model.generate(feats, max_length=24).sequences
        new_decoded += [t.strip() for t in hf.processor.batch_decode(
            np.asarray(out), skip_special_tokens=True)]
    new_exact, new_char = score(new_decoded, texts)

    print(f"[utterance n={args.n}] dim-192: exact={old_exact:.3f} "
          f"char={old_char:.3f} | whisper-base-geom: exact={new_exact:.3f} "
          f"char={new_char:.3f}")
    for t, d in list(zip(texts, new_decoded))[:4]:
        print(f"    {t!r} -> {d!r}")

    # --- transcript level: full 30 s sentences through both providers ---
    from eval_asr_paired import load_ckpt as _unused  # noqa: F401
    from fvd_tpu.models.asr import JaxASR
    from fvd_tpu.synthetic import gated_speech
    from fvd_tpu.utils.wav import write_wav

    jax_asr = JaxASR.from_checkpoint(args.old)
    sentences = []
    srng = np.random.RandomState(args.seed + 1)
    words_pool = ("the mayor said the city will cut taxes next year "
                  "the river level rose two feet after the storm "
                  "the court ruled the ban can not take effect").split()
    for _ in range(args.n_sentences):
        k = srng.randint(6, 11)
        sentences.append(" ".join(words_pool[srng.randint(len(words_pool))]
                                  for _ in range(k)))
    tdir = tempfile.mkdtemp(prefix="fvd_asr_pair_")
    accs = {"old": [], "new": []}
    for i, s in enumerate(sentences):
        sig = gated_speech(s, 30.0, renderer="formant")
        path = os.path.join(tdir, f"s{i}.wav")
        write_wav(path, sig, 16000)
        # the words actually rendered (gated_speech drops words past the clip)
        spoken = s.split()
        old_out = jax_asr.transcribe(path) or {"text": ""}
        new_out = hf.transcribe(path) or {"text": ""}
        accs["old"].append(word_acc(old_out["text"], spoken))
        accs["new"].append(word_acc(new_out["text"], spoken))
    t_old = float(np.mean(accs["old"]))
    t_new = float(np.mean(accs["new"]))
    print(f"[transcript n={args.n_sentences}] dim-192 word acc={t_old:.3f} | "
          f"whisper-base-geom word acc={t_new:.3f}")

    results = {
        "utterance": {"n": args.n,
                      "old": {"exact": round(old_exact, 4), "char": round(old_char, 4)},
                      "new": {"exact": round(new_exact, 4), "char": round(new_char, 4)}},
        "transcript": {"n": args.n_sentences,
                       "old_word_acc": round(t_old, 4),
                       "new_word_acc": round(t_new, 4)},
        "meets_verdict_gate": bool(new_exact >= old_exact and new_char >= old_char),
    }
    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
