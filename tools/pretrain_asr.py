"""Train the ASR encoder-decoder on synthetic tone-coded speech.

Each character maps to a unique tone (a frequency ladder); "utterances" are
concatenated character tones with noise.  The model must learn the full
transduction — log-mel frontend -> encoder -> cross-attention decoder ->
byte tokens — and the greedy `lax.while_loop` decode must read back the
transcript.  This validates the whole ASR stack end-to-end without external
speech data (real Whisper weights slot in via providers/hf_models.py).

    python tools/pretrain_asr.py --steps 1500 --batch 16
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from fvd_tpu.synthetic import TONE_ALPHABET as ALPHABET
from fvd_tpu.synthetic import TONE_CHAR_S
from fvd_tpu.synthetic import TONE_SR as SR
from fvd_tpu.synthetic import tone_speech

_VOWELS = "aeiou"
_CONSONANTS = "bcdfghjklmnpqrstvwxyz"


def random_letters(rng: np.random.RandomState, min_len=3, max_len=10) -> str:
    n = rng.randint(min_len, max_len + 1)
    return "".join(ALPHABET[rng.randint(len(ALPHABET))] for _ in range(n))


def random_pronounceable(rng: np.random.RandomState, min_len=3, max_len=10) -> str:
    """CV(C) syllables — pronounceable strings whose formant renderings
    carry well-defined consonant-vowel transitions."""
    out = []
    n = rng.randint(min_len, max_len + 1)
    while len(out) < n:
        out.append(_CONSONANTS[rng.randint(len(_CONSONANTS))])
        out.append(_VOWELS[rng.randint(len(_VOWELS))])
        if rng.rand() < 0.3:
            out.append(_CONSONANTS[rng.randint(len(_CONSONANTS))])
        if rng.rand() < 0.25 and len(out) < n:
            out.append(" ")
    return "".join(out[:n]).strip() or "ba"


_COMMON_WORDS = (
    "the a of to and in that it is was for on said will year city state "
    "next cut tax taxes mayor court team game final point museum bridge "
    "open month school board vote river level rose feet after storm new "
    "two six nine thousand jobs july added ruled ban effect won art wing "
    "port dock repair fair crowd summer library late friday airline route "
    "coast record modern traffic last this has had they but not can"
).split()


def random_common_words(rng: np.random.RandomState, min_len=3, max_len=10) -> str:
    """Phrases of common English words (clipped to the utterance budget) —
    the vocabulary register of narrated news video."""
    out = ""
    while True:
        w = _COMMON_WORDS[rng.randint(len(_COMMON_WORDS))]
        cand = w if not out else f"{out} {w}"
        if len(cand) > max_len:
            break
        out = cand
    return out or "the"


class Domain:
    """Audio-rendering domain: tone-coded alphabet (round-1 checkpoint) or
    formant-synthesized speech (models/synthetic_speech.py)."""

    def __init__(self, name: str, noise: float = 0.0):
        self.name = name
        self.noise = noise
        if name == "tone":
            self.char_s = TONE_CHAR_S
            self.render = tone_speech
            self.utterance = random_letters
            self.dither = 0.01
        else:
            from fvd_tpu.models.synthetic_speech import (PHONE_S, formant_speech,
                                                         formant_speech_hard)

            self.char_s = PHONE_S
            hard = name == "formant_hard"

            def render(text, rng=None):
                rng = rng or np.random.RandomState(0)
                # joint family: half base renders, half hard renders — the
                # continuation must master the harder axes (rate variation,
                # undershoot, F0 drift, reverb) WITHOUT regressing on the
                # base family make_face_video/bench audio comes from
                if hard and rng.rand() < 0.5:
                    a = formant_speech_hard(text, rng, variability=1.0)
                else:
                    a = formant_speech(text, rng)
                if noise > 0:
                    a = a + noise * rng.randn(len(a)).astype(np.float32)
                return a

            self.render = render

            def utterance(rng, min_len=3, max_len=10):
                # 60% pronounceable syllables, 40% common-word phrases
                if rng.rand() < 0.6:
                    return random_pronounceable(rng, min_len, max_len)
                return random_common_words(rng, min_len, max_len)

            self.utterance = utterance
            self.dither = noise


CHAR_S = TONE_CHAR_S  # default (tone); overridden per-domain in asr_batch
text_to_audio = tone_speech
random_utterance = random_letters


_batched_log_mel = None


def asr_batch(rng, batch: int, tok, mel_frames: int, max_tokens: int,
              domain=None):
    """Host work is numpy-only; the log-mel frontend runs as ONE batched
    device program per step (a per-sample jnp dispatch inside this loop
    would starve the single host core, CLAUDE.md environment rules)."""
    import jax
    import jax.numpy as jnp

    from fvd_tpu.models.asr import HOP, N_MELS, log_mel

    global _batched_log_mel
    if _batched_log_mel is None:
        _batched_log_mel = jax.jit(jax.vmap(log_mel))

    domain = domain or Domain("tone")
    max_chars = 10
    pad_len = int(SR * domain.char_s) * max_chars
    audio = np.zeros((batch, pad_len), np.float32)
    lens = np.zeros(batch, np.int64)
    tokens_in = np.zeros((batch, max_tokens), np.int32)
    tokens_out = np.zeros((batch, max_tokens), np.int32)
    texts = []
    for i in range(batch):
        text = domain.utterance(rng)
        a = domain.render(text, rng)
        n = min(len(a), pad_len)
        audio[i, :n] = a[:n]
        lens[i] = n
        target = tok.encode(text, max_tokens, add_special=True)
        tokens_in[i] = np.concatenate([[tok.BOS], target[:-1]])
        tokens_out[i] = target
        texts.append(text)

    mel = np.asarray(_batched_log_mel(jnp.asarray(audio)))  # [B, F, 80]
    mels = np.zeros((batch, mel_frames, N_MELS), np.float32)
    for i in range(batch):
        m = min(1 + int(lens[i]) // HOP, mel_frames, mel.shape[1])
        mels[i, :m] = mel[i, :m]
    return mels, tokens_in, tokens_out, texts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--domain", choices=["tone", "formant", "formant_hard"],
                    default="tone")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (harness pins jax_platforms; "
                         "config.update after import is the working override)")
    ap.add_argument("--noise", type=float, default=0.002,
                    help="formant-domain training noise floor (also the "
                         "checkpoint's inference dither)")
    ap.add_argument("--resume", action="store_true",
                    help="continuation-finetune: load params from --out")
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()
    if args.cpu:
        import fvd_tpu

        fvd_tpu.force_cpu()
    if args.out is None:
        args.out = ("checkpoints/asr.npz" if args.domain == "tone"
                    else "checkpoints/asr_formant.npz")
    domain = Domain(args.domain, noise=args.noise)

    import jax
    import jax.numpy as jnp
    import optax

    from fvd_tpu.models import asr
    from fvd_tpu.models.encoders import save_params
    from fvd_tpu.models.transformer import ByteTokenizer

    print(f"backend: {jax.default_backend()}")
    rng = np.random.RandomState(0)
    tok = ByteTokenizer()
    mel_frames = 128   # ~1.3 s of audio
    max_tokens = 16

    model = asr.AsrModel(dim=args.dim, depth=args.depth)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, mel_frames, asr.N_MELS), jnp.float32),
        jnp.zeros((1, max_tokens), jnp.int32),
    )
    if args.resume and os.path.exists(args.out):
        from fvd_tpu.models.encoders import load_params

        params = load_params(args.out, params)
        print(f"[asr] resumed params from {args.out}")
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, mel, tin, tout):
        loss, grads = jax.value_and_grad(asr.asr_loss)(params, model, mel, tin, tout)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    for i in range(args.steps):
        mel, tin, tout, _ = asr_batch(rng, args.batch, tok, mel_frames, max_tokens,
                                      domain=domain)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(mel),
                                       jnp.asarray(tin), jnp.asarray(tout))
        if i % 100 == 0 or i == args.steps - 1:
            print(f"[asr] step {i:4d} loss {float(loss):.3f} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)

    # eval: greedy-decode fresh utterances
    mel, _, _, texts = asr_batch(rng, 16, tok, mel_frames, max_tokens,
                                 domain=domain)
    ids = asr.greedy_decode(params, jnp.asarray(mel), dim=args.dim,
                            depth=args.depth, max_tokens=max_tokens)
    decoded = [tok.decode(row).strip() for row in np.asarray(ids)]
    exact = sum(d == t for d, t in zip(decoded, texts)) / len(texts)
    char_ok = char_total = 0
    for d, t in zip(decoded, texts):
        char_total += len(t)
        char_ok += sum(a == b for a, b in zip(d, t))
    print(f"[asr] eval: exact={exact:.2f} char_acc={char_ok / max(char_total, 1):.2f} "
          f"sample: {texts[0]!r} -> {decoded[0]!r}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_params(args.out, params)
    import json

    with open(args.out.replace(".npz", ".json"), "w") as f:
        # "domain" names the BASE rendering family consumers dispatch on
        # (synthetic.py speech_renderer / factory.asr_speech_domain);
        # "train_domain" records the actual training mixture
        json.dump({"dim": args.dim, "depth": args.depth,
                   "chunk_frames": mel_frames, "max_tokens": max_tokens,
                   "domain": ("formant" if args.domain.startswith("formant")
                              else args.domain),
                   "train_domain": args.domain, "dither": domain.dither}, f)
    print(f"[asr] saved {args.out}")


if __name__ == "__main__":
    main()
