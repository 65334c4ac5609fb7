"""Fabricate FULL-GEOMETRY HF checkpoints offline (random init).

The reference's capability on arbitrary real media rests on pretrained
checkpoints it auto-downloads: Whisper base (`a2_vad_asr.py:27-30`), CLIP
ViT-B/32 (`c2_gesture_narration_check.py:49-54`), MiniLM-L6
(`e1_web_evidence.py:334-347`).  This sandbox has no network, so the
genuine *weights* cannot exist here — but the genuine *geometry* can:
this tool instantiates the exact model configurations with random init,
fabricates working tokenizer / feature-extractor assets at the exact
vocabulary sizes (byte-level BPE for Whisper/CLIP, WordPiece for MiniLM),
and saves everything in the same local-directory layout
``tools/import_hf_weights.py`` produces.  Factory precedence
(`providers/factory.py`), provider plumbing (`providers/hf_models.py`) and
the node schemas then run at the real shapes, so genuine weights are
plug-and-play the day network exists — drop them over these directories.

    python tools/make_hf_geometry_checkpoints.py --out /tmp/hf_geom/hf

NOTE: deliberately NOT written into ``checkpoints/hf`` by default — the
factory gives the HF directory precedence over the first-party trained
models, and random-init weights must never shadow trained ones in a
production checkout.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("HF_HUB_OFFLINE", "1")


# ---------------------------------------------------------------------------
# tokenizer fabrication
# ---------------------------------------------------------------------------
def _bytelevel_bpe(vocab_size: int, specials: list) -> "object":
    """A working byte-level BPE fast tokenizer with exactly ``vocab_size``
    entries: specials first, the 256-char GPT-2 byte alphabet, then unique
    filler tokens composed of alphabet chars (so ByteLevel decode of ANY id
    is well-defined)."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    alphabet = sorted(pre_tokenizers.ByteLevel.alphabet())
    vocab = {}
    for tok in specials:
        vocab[tok] = len(vocab)
    for ch in alphabet:
        if ch not in vocab:
            vocab[ch] = len(vocab)
    i = 0
    n = len(alphabet)
    while len(vocab) < vocab_size:
        a, b = divmod(i, n)
        t = alphabet[a % n] + alphabet[b] + alphabet[(a // n) % n]
        if t not in vocab:
            vocab[t] = len(vocab)
        i += 1
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[],
                               unk_token=specials[0] if specials else None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    return tok


def _claim_domain_lexicon() -> list:
    """Whole-word vocabulary for the WordPiece fabrication: the claim/
    evidence generator's lexicon (tools/pretrain_text_encoder.py) plus a
    small common-English core.  With only the char-level fallback, a
    40-word evidence string tokenizes to ~200 single-char pieces and E1's
    128-token truncation drops the discriminative slot values; whole-word
    entries keep runtime strings ~1 token/word.  Genuine MiniLM weights
    ship their own vocab.txt and replace this wholesale."""
    words = set("""
        the a an of to in on by for with at from and or but will is are was
        were be been has have had said says new more after over under about
        city county state federal report reports reported officials according
        plans percent cases jobs feet river water levels overnight responded
        emerge details our reporters examined whether know what we rating
        fact check verification reality coverage claim sourcing context
        respond spoke video shows people year years million thousand today
        area local residents during statement week month told press
    """.split())
    try:
        import pretrain_text_encoder as pt

        for group in (pt.OFFICIALS, pt.CITIES, pt.THINGS, pt.RIVERS,
                      pt.DISEASES, pt.ORGS, pt.COMPANIES, pt.AGENCIES,
                      pt.PHENOMENA, pt.WORDS_0_20):
            for entry in group:
                words.update(str(entry).lower().split())
        for alts in pt.SYN.values():
            for alt in alts:
                words.update(alt.lower().split())
        for style in pt.TITLE_STYLES + pt.SNIPPET_STYLES:
            words.update(
                style.replace("{s}", " ").replace(":", " ")
                .replace(".", " ").replace(",", " ").replace("'", " ")
                .lower().split())
    except ImportError:  # lexicon source optional: chars still cover all
        pass
    return sorted(w for w in words if w.isalpha())


def _wordpiece(vocab_size: int) -> "object":
    """A working WordPiece fast tokenizer with the BERT special-token layout
    ([PAD]=0, [UNK]=100, [CLS]=101, [SEP]=102, [MASK]=103 — the MiniLM
    vocab positions), a char-level fallback vocabulary, and the claim-domain
    whole-word lexicon."""
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers, processors

    vocab = {"[PAD]": 0}
    for i in range(99):
        vocab[f"[unused{i}]"] = len(vocab)
    for s in ("[UNK]", "[CLS]", "[SEP]", "[MASK]"):
        vocab[s] = len(vocab)
    assert vocab["[UNK]"] == 100 and vocab["[CLS]"] == 101
    chars = "abcdefghijklmnopqrstuvwxyz0123456789.,;:!?'\"-()[]{}"
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab["##" + c] = len(vocab)
    for w in _claim_domain_lexicon():
        if w not in vocab and len(vocab) < vocab_size:
            vocab[w] = len(vocab)
    i = 0
    while len(vocab) < vocab_size:
        t = f"[fill{i}]"
        vocab[t] = len(vocab)
        i += 1
    tok = Tokenizer(models.WordPiece(vocab=vocab, unk_token="[UNK]",
                                     max_input_chars_per_word=100))
    tok.normalizer = normalizers.BertNormalizer(lowercase=True)
    tok.pre_tokenizer = pre_tokenizers.BertPreTokenizer()
    tok.post_processor = processors.TemplateProcessing(
        single="[CLS] $A [SEP]",
        pair="[CLS] $A [SEP] $B:1 [SEP]:1",
        special_tokens=[("[CLS]", vocab["[CLS]"]), ("[SEP]", vocab["[SEP]"])],
    )
    return tok


# ---------------------------------------------------------------------------
# model fabrication at the reference's exact geometries
# ---------------------------------------------------------------------------
def make_minilm(dest: str, seed: int = 0) -> None:
    """all-MiniLM-L6-v2 geometry: 6-layer BERT, hidden 384, heads 12,
    intermediate 1536, vocab 30522 (e1_web_evidence.py:334-347)."""
    from transformers import BertConfig, BertTokenizerFast, FlaxBertModel

    cfg = BertConfig(
        vocab_size=30522, hidden_size=384, num_hidden_layers=6,
        num_attention_heads=12, intermediate_size=1536,
        max_position_embeddings=512,
    )
    model = FlaxBertModel(cfg, seed=seed)
    tok = BertTokenizerFast(tokenizer_object=_wordpiece(cfg.vocab_size),
                            unk_token="[UNK]", pad_token="[PAD]",
                            cls_token="[CLS]", sep_token="[SEP]",
                            mask_token="[MASK]", do_lower_case=True)
    os.makedirs(dest, exist_ok=True)
    model.save_pretrained(dest)
    tok.save_pretrained(dest)


def make_clip(dest: str, seed: int = 0, tiny: bool = False) -> None:
    """CLIP ViT-B/32 geometry — transformers' CLIPConfig *defaults* are
    exactly openai/clip-vit-base-patch32: text 512x12 (vocab 49408, 77
    positions), vision 768x12 patch 32 image 224, projection 512
    (c2_gesture_narration_check.py:49-54).

    ``tiny``: 2-layer 64d towers at the same 224/77 interface — trainer
    smoke tests on CPU, never a capability artifact."""
    from transformers import CLIPConfig, CLIPTokenizerFast, FlaxCLIPModel

    from tokenizers import pre_tokenizers, processors

    if tiny:
        cfg = CLIPConfig(
            text_config=dict(hidden_size=64, intermediate_size=128,
                             num_hidden_layers=2, num_attention_heads=2,
                             vocab_size=49408),
            vision_config=dict(hidden_size=64, intermediate_size=128,
                               num_hidden_layers=2, num_attention_heads=2,
                               patch_size=32, image_size=224),
            projection_dim=64,
        )
    else:
        cfg = CLIPConfig()
    # Align control-token ids with the fabricated vocabulary (eos=0, bos=1):
    # FlaxCLIPTextTransformer pools the hidden state at
    # ``(input_ids == eos_token_id).argmax`` — with the genuine ids (49407)
    # and this tokenizer the match never fires and pooling silently takes
    # position 0 (which, under the causal text mask, has seen ONE token).
    # Genuine OpenAI weights ship their own config.json + tokenizer and
    # replace these files wholesale, so the ids travel with the weights.
    cfg.text_config.eos_token_id = 0
    cfg.text_config.bos_token_id = 1
    cfg.text_config.pad_token_id = 0
    model = FlaxCLIPModel(cfg, seed=seed)
    backend = _bytelevel_bpe(
        cfg.text_config.vocab_size, ["<|endoftext|>", "<|startoftext|>"])
    # CLIPTokenizerFast (>=4.17) requires a Sequence pre-tokenizer
    backend.pre_tokenizer = pre_tokenizers.Sequence(
        [pre_tokenizers.ByteLevel(add_prefix_space=False)])
    # bos + content + eos, so eos-position pooling always has a real eos to
    # find (truncation reserves room for the specials)
    backend.post_processor = processors.TemplateProcessing(
        single="<|startoftext|> $A <|endoftext|>",
        pair="<|startoftext|> $A <|endoftext|> $B <|endoftext|>",
        special_tokens=[("<|endoftext|>", 0), ("<|startoftext|>", 1)],
    )
    tok = CLIPTokenizerFast(
        tokenizer_object=backend,
        unk_token="<|endoftext|>", bos_token="<|startoftext|>",
        eos_token="<|endoftext|>", pad_token="<|endoftext|>")
    os.makedirs(dest, exist_ok=True)
    model.save_pretrained(dest)
    tok.save_pretrained(dest)


def make_whisper(dest: str, seed: int = 0, *, d_model: int = 512,
                 layers: int = 6, heads: int = 8, ffn: int = 2048,
                 vocab_size: int = 51865) -> None:
    """openai/whisper-base geometry: d_model 512, 6+6 layers, 8 heads,
    ffn 2048, mel 80, vocab 51865, source 1500 / target 448 positions
    (a2_vad_asr.py:27-30).

    Control-token ids are aligned with the fabricated tokenizer's special
    tokens (<|endoftext|>=0 as pad/bos/eos, <|startoftranscript|>=1 as the
    decoder start) so ``skip_special_tokens`` strips exactly what a model
    trained on this vocabulary emits; genuine OpenAI weights ship their own
    config.json + tokenizer and simply replace these files."""
    from transformers import (FlaxWhisperForConditionalGeneration,
                              WhisperConfig, WhisperFeatureExtractor,
                              WhisperTokenizerFast)

    cfg = WhisperConfig(
        vocab_size=vocab_size, num_mel_bins=80, d_model=d_model,
        encoder_layers=layers, encoder_attention_heads=heads, encoder_ffn_dim=ffn,
        decoder_layers=layers, decoder_attention_heads=heads, decoder_ffn_dim=ffn,
        max_source_positions=1500, max_target_positions=448,
        pad_token_id=0, bos_token_id=0, eos_token_id=0,
        decoder_start_token_id=1,
        suppress_tokens=[], begin_suppress_tokens=[],
    )
    model = FlaxWhisperForConditionalGeneration(cfg, seed=seed)
    fe = WhisperFeatureExtractor()  # defaults = whisper's mel frontend
    tok = WhisperTokenizerFast(
        tokenizer_object=_bytelevel_bpe(
            cfg.vocab_size, ["<|endoftext|>", "<|startoftranscript|>"]),
        unk_token="<|endoftext|>", bos_token="<|endoftext|>",
        eos_token="<|endoftext|>", pad_token="<|endoftext|>",
        additional_special_tokens=["<|startoftranscript|>"])
    os.makedirs(dest, exist_ok=True)
    model.save_pretrained(dest)
    fe.save_pretrained(dest)
    tok.save_pretrained(dest)


MAKERS = {"minilm": make_minilm, "clip": make_clip, "whisper": make_whisper}


def make_all(out_dir: str, kinds=("minilm", "clip", "whisper")) -> None:
    for kind in kinds:
        MAKERS[kind](os.path.join(out_dir, kind))


def hf_geometry_cache_dir(kinds=("minilm", "clip", "whisper")) -> str:
    """A persistent fabricated-geometry hf/ directory under /tmp, keyed on a
    digest of this file (fabricating whisper-base + CLIP + MiniLM costs
    minutes of 1-core host time; kernel_bench and bench --real-geometry
    both want it warm).  A COMPLETE marker guards half-written caches."""
    import hashlib
    import tempfile

    with open(os.path.abspath(__file__), "rb") as f:
        digest = hashlib.sha1(f.read()).hexdigest()[:16]
    d = os.path.join(tempfile.gettempdir(), "fvd_hf_geom", digest)
    marker = os.path.join(d, "COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        for kind in kinds:
            print(f"[hf-geom cache] fabricating {kind}...")
            MAKERS[kind](os.path.join(d, kind))
        with open(marker, "w") as f:
            f.write("ok\n")
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/hf_geom/hf",
                    help="hf/ directory to create (factory expects "
                         "<checkpoint_dir>/hf/{minilm,clip,whisper})")
    ap.add_argument("--only", nargs="*", default=[], choices=list(MAKERS))
    args = ap.parse_args()
    kinds = args.only or list(MAKERS)
    for kind in kinds:
        print(f"[{kind}] fabricating full-geometry random-init checkpoint...")
        MAKERS[kind](os.path.join(args.out, kind))
        print(f"[{kind}] -> {os.path.join(args.out, kind)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
