"""Sentence encoder + CLIP-style dual towers.

Roles filled (SURVEY §2.4): MiniLM-L6-v2 (E1 evidence re-ranking,
``e1_web_evidence.py:330-354``) and CLIP ViT-B/32 (C2 gesture-narration
consistency, ``c2_gesture_narration_check.py:49-121``).

Retrained-equivalent architectures with a byte tokenizer (no downloaded
vocab): a 6-layer mean-pooled text transformer, and dual image/text towers
trained contrastively.  Batched jitted forwards; provider wrappers expose
the framework's TextEncoder / ClipProvider protocols.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fvd_tpu.models.transformer import ByteTokenizer, MHABlock, sincos_positions

MAX_TEXT_LEN = 128
IMAGE_SIZE = 112
PATCH = 16


class TextTower(nn.Module):
    dim: int = 192
    depth: int = 6
    heads: int = 0  # 0 -> dim // 32
    out_dim: int = 256

    @nn.compact
    def __call__(self, ids):  # [B, T] int32
        mask = ids != ByteTokenizer.PAD
        x = nn.Embed(ByteTokenizer.vocab_size, self.dim)(ids)
        x = x + jnp.asarray(sincos_positions(ids.shape[-1], self.dim))
        attn_mask = mask[:, None, None, :] & mask[:, None, :, None]
        heads = self.heads or max(1, self.dim // 32)
        for _ in range(self.depth):
            x = MHABlock(self.dim, heads)(x, mask=attn_mask)
        x = nn.LayerNorm()(x)
        # masked mean pooling (the sentence-transformers pooling)
        denom = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1)
        pooled = jnp.sum(x * mask[..., None], axis=-2) / denom
        return nn.Dense(self.out_dim)(pooled)


class ImageTower(nn.Module):
    dim: int = 192
    depth: int = 6
    heads: int = 0  # 0 -> dim // 32
    out_dim: int = 256

    @nn.compact
    def __call__(self, images):  # float [B, 112, 112, 3] in 0..1
        x = nn.Conv(self.dim, (PATCH, PATCH), strides=(PATCH, PATCH))(images)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        cls = self.param("cls", nn.initializers.normal(0.02), (1, 1, self.dim))
        x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), x], axis=1)
        x = x + jnp.asarray(sincos_positions(x.shape[1], self.dim))
        heads = self.heads or max(1, self.dim // 32)
        for _ in range(self.depth):
            x = MHABlock(self.dim, heads)(x)
        x = nn.LayerNorm()(x)
        return nn.Dense(self.out_dim)(x[:, 0])


class ClipModel(nn.Module):
    """Dual towers + learned logit scale (CLIP training objective)."""

    dim: int = 192
    depth: int = 6
    out_dim: int = 256

    def setup(self):
        self.text = TextTower(dim=self.dim, depth=self.depth, out_dim=self.out_dim)
        self.image = ImageTower(dim=self.dim, depth=self.depth, out_dim=self.out_dim)
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(np.log(1 / 0.07), jnp.float32)
        )

    def encode_text(self, ids):
        e = self.text(ids)
        return e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-8)

    def encode_image(self, images):
        e = self.image(images)
        return e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-8)

    def __call__(self, images, ids):
        ie = self.encode_image(images)
        te = self.encode_text(ids)
        return ie @ te.T * jnp.exp(self.logit_scale)


def clip_loss(params, model: ClipModel, images, ids):
    """Symmetric InfoNCE."""
    logits = model.apply(params, images, ids)
    n = logits.shape[0]
    labels = jnp.arange(n)
    li = -jnp.mean(jax.nn.log_softmax(logits, axis=1)[labels, labels])
    lt = -jnp.mean(jax.nn.log_softmax(logits, axis=0)[labels, labels])
    return (li + lt) / 2


# ---------------------------------------------------------------------------
# Param I/O (shared)
# ---------------------------------------------------------------------------
def save_params(path: str, params) -> None:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    np.savez(path, **{jax.tree_util.keystr(k): np.asarray(v) for k, v in flat})


def load_params(path: str, template):
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    values = [jnp.asarray(data[jax.tree_util.keystr(k)]) for k, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, values)


# ---------------------------------------------------------------------------
# Provider wrappers
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("dim", "depth", "out_dim"))
def _text_forward(params, ids, dim=192, depth=6, out_dim=256):
    return TextTower(dim=dim, depth=depth, out_dim=out_dim).apply(params, ids)


class JaxTextEncoder:
    """TextEncoder protocol over the TextTower (MiniLM role)."""

    def __init__(self, params=None, dim: int = 192, depth: int = 6, out_dim: int = 256,
                 checkpoint: Optional[str] = None):
        self.tok = ByteTokenizer()
        self.dim, self.depth, self.out_dim = dim, depth, out_dim
        if params is None:
            template = TextTower(dim=dim, depth=depth, out_dim=out_dim).init(
                jax.random.PRNGKey(0), jnp.zeros((1, MAX_TEXT_LEN), jnp.int32)
            )
            params = load_params(checkpoint, template) if checkpoint else template
        self.params = params

    def encode(self, text: str) -> np.ndarray:
        return self.encode_batch([text])[0]

    def encode_batch(self, texts: List[str]) -> np.ndarray:
        ids = np.stack([self.tok.encode(t, MAX_TEXT_LEN) for t in texts])
        # pad the batch dim to a power-of-two bucket: E1's result count
        # varies per claim and each distinct size would otherwise recompile
        n = len(texts)
        bucket = 1 << max(0, (n - 1)).bit_length()
        if bucket != n:
            ids = np.concatenate(
                [ids, np.zeros((bucket - n, MAX_TEXT_LEN), np.int32)])
        out = _text_forward(self.params, jnp.asarray(ids),
                            dim=self.dim, depth=self.depth, out_dim=self.out_dim)
        return np.asarray(out[:n])


@partial(jax.jit, static_argnames=("dim", "depth", "out_dim"))
def _clip_similarity(params, images, ids, dim=192, depth=6, out_dim=256):
    if images.dtype == jnp.uint8:  # ship uint8, normalize on device
        images = images.astype(jnp.float32) / 255.0
    model = ClipModel(dim=dim, depth=depth, out_dim=out_dim)
    ie = model.apply(params, images, method=ClipModel.encode_image)
    te = model.apply(params, ids, method=ClipModel.encode_text)
    return jnp.sum(ie * te, axis=-1)


class JaxClip:
    """ClipProvider protocol over the dual towers (CLIP ViT-B/32 role).

    ``cal_offset``/``cal_scale`` linearly map this model's cosine range onto
    the reference CLIP's (whose 0.25/0.15 thresholds C2 inherits): computed
    at train time as (mean mismatched cosine, 0.35 / (matched - mismatched))
    and stored in the checkpoint sidecar.
    """

    #: device-forward provider: eligible for cross-video coalescing
    coalescable = True

    def __init__(self, params=None, dim: int = 192, depth: int = 6, out_dim: int = 256,
                 checkpoint: Optional[str] = None,
                 cal_offset: float = 0.0, cal_scale: float = 1.0):
        self.tok = ByteTokenizer()
        self.dim, self.depth, self.out_dim = dim, depth, out_dim
        self.cal_offset, self.cal_scale = cal_offset, cal_scale
        if params is None:
            model = ClipModel(dim=dim, depth=depth, out_dim=out_dim)
            template = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32),
                jnp.zeros((1, MAX_TEXT_LEN), jnp.int32),
            )
            params = load_params(checkpoint, template) if checkpoint else template
        self.params = params

    def image_text_similarity(self, image: np.ndarray, text: str) -> float:
        return float(self.image_text_similarity_batch([image], [text])[0])

    def image_text_similarity_batch(self, images, texts) -> np.ndarray:
        """Paired (image_i, text_i) cosines in ONE device program — C2 scores
        a whole keyframe set per dispatch instead of one."""
        import cv2

        imgs = np.stack([cv2.resize(im, (IMAGE_SIZE, IMAGE_SIZE)) for im in images])
        ids = np.stack([self.tok.encode(t, MAX_TEXT_LEN) for t in texts])
        sim = _clip_similarity(
            self.params, jnp.asarray(imgs), jnp.asarray(ids),
            dim=self.dim, depth=self.depth, out_dim=self.out_dim,
        )
        return (np.asarray(sim) - self.cal_offset) * self.cal_scale
