"""Shared transformer building blocks (flax) for the text/CLIP/ASR models."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class MHABlock(nn.Module):
    """Pre-LN transformer block; optional causal masking + cross-attention."""

    dim: int
    heads: int
    mlp_ratio: int = 4
    causal: bool = False

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        attn_mask = mask
        if self.causal:
            T = x.shape[-2]
            causal = jnp.tril(jnp.ones((T, T), bool))
            attn_mask = causal if attn_mask is None else jnp.logical_and(attn_mask, causal)
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(num_heads=self.heads)(
            h, h, mask=attn_mask
        )
        x = x + h
        if context is not None:
            h = nn.LayerNorm()(x)
            x = x + nn.MultiHeadDotProductAttention(num_heads=self.heads)(h, context)
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim * self.mlp_ratio)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim)(h)
        return x + h


def sincos_positions(length: int, dim: int) -> np.ndarray:
    pos = np.arange(length)[:, None]
    i = np.arange(dim // 2)[None, :]
    angle = pos / np.power(10000.0, 2 * i / dim)
    emb = np.concatenate([np.sin(angle), np.cos(angle)], axis=1)
    return emb.astype(np.float32)


class ByteTokenizer:
    """Self-contained byte-level tokenizer (no downloaded vocab files).

    ids: 0 pad, 1 bos, 2 eos, 3..258 bytes.
    """

    PAD, BOS, EOS = 0, 1, 2
    OFFSET = 3
    vocab_size = 259

    def encode(self, text: str, max_len: int, add_special: bool = False) -> np.ndarray:
        ids = [b + self.OFFSET for b in text.encode("utf-8")]
        if add_special:
            ids = [self.BOS] + ids[: max_len - 2] + [self.EOS]
        ids = ids[:max_len]
        out = np.full(max_len, self.PAD, np.int32)
        out[: len(ids)] = ids
        return out

    def decode(self, ids) -> str:
        bs = bytes(int(i) - self.OFFSET for i in ids
                   if int(i) >= self.OFFSET)
        return bs.decode("utf-8", errors="replace")
