"""Detection ops: SSD anchor generation, box decoding, batched NMS.

The reference's face detector is OpenCV-DNN's res10 SSD whose C++ pipeline
does priorbox generation, offset decoding and NMS internally
(``v1_keyframes_facetrack.py:105-108``).  These are the TPU-native
equivalents: static-shape jnp programs (NMS is a ``fori_loop`` over a fixed
detection budget, masking instead of dynamic lists) so the whole detector —
backbone forward + decode + NMS — jits as one program over a frame batch.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_anchors(
    feature_shapes: Sequence[Tuple[int, int]],
    scales: Sequence[Sequence[float]],
    aspect_ratios: Sequence[Sequence[float]] = None,
) -> np.ndarray:
    """SSD prior boxes in normalized cxcywh, one set per feature map.

    feature_shapes: [(h, w), ...] per detection head;
    scales: per head, list of box scales (fraction of image);
    aspect_ratios: per head, list of w/h ratios (default [1.0]).
    Returns [num_anchors, 4] (cx, cy, w, h).
    """
    if aspect_ratios is None:
        aspect_ratios = [[1.0]] * len(feature_shapes)
    out = []
    for (fh, fw), head_scales, head_ars in zip(feature_shapes, scales, aspect_ratios):
        ys = (np.arange(fh) + 0.5) / fh
        xs = (np.arange(fw) + 0.5) / fw
        cy, cx = np.meshgrid(ys, xs, indexing="ij")
        for s in head_scales:
            for ar in head_ars:
                w = s * np.sqrt(ar)
                h = s / np.sqrt(ar)
                boxes = np.stack(
                    [cx.ravel(), cy.ravel(), np.full(fh * fw, w), np.full(fh * fw, h)],
                    axis=1,
                )
                out.append(boxes)
    return np.concatenate(out, axis=0).astype(np.float32)


@jax.jit
def decode_boxes(
    deltas: jax.Array, anchors: jax.Array, variances: Tuple[float, float] = (0.1, 0.2)
) -> jax.Array:
    """SSD offset decode: deltas [..., A, 4] (dcx, dcy, dw, dh) + anchors
    [A, 4] cxcywh -> corner boxes [..., A, 4] (x1, y1, x2, y2), normalized."""
    acx, acy, aw, ah = anchors[..., 0], anchors[..., 1], anchors[..., 2], anchors[..., 3]
    cx = deltas[..., 0] * variances[0] * aw + acx
    cy = deltas[..., 1] * variances[0] * ah + acy
    w = jnp.exp(jnp.clip(deltas[..., 2] * variances[1], -10.0, 10.0)) * aw
    h = jnp.exp(jnp.clip(deltas[..., 3] * variances[1], -10.0, 10.0)) * ah
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def encode_boxes(boxes, anchors, variances: Tuple[float, float] = (0.1, 0.2)):
    """Inverse of decode_boxes (training targets). Works on numpy or jnp
    inputs (host data path uses numpy to avoid per-sample device dispatch)."""
    xp = jnp if isinstance(boxes, jax.Array) or isinstance(anchors, jax.Array) else np
    bw = xp.maximum(boxes[..., 2] - boxes[..., 0], 1e-6)
    bh = xp.maximum(boxes[..., 3] - boxes[..., 1], 1e-6)
    bcx = (boxes[..., 0] + boxes[..., 2]) / 2
    bcy = (boxes[..., 1] + boxes[..., 3]) / 2
    acx, acy, aw, ah = anchors[..., 0], anchors[..., 1], anchors[..., 2], anchors[..., 3]
    return xp.stack(
        [
            (bcx - acx) / (variances[0] * aw),
            (bcy - acy) / (variances[0] * ah),
            xp.log(bw / aw) / variances[1],
            xp.log(bh / ah) / variances[1],
        ],
        axis=-1,
    )


def iou_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU for corner boxes: a [N, 4] x b [M, 4] -> [N, M]."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


@partial(jax.jit, static_argnames=("max_out", "iou_threshold", "score_threshold"))
def nms(
    boxes: jax.Array,
    scores: jax.Array,
    max_out: int = 200,
    iou_threshold: float = 0.45,
    score_threshold: float = 0.01,
) -> Tuple[jax.Array, jax.Array]:
    """Static-shape greedy NMS.

    boxes [A, 4], scores [A] -> (boxes [max_out, 4], scores [max_out]);
    suppressed/empty slots have score 0.  fori_loop over the output budget:
    each iteration takes the argmax survivor and masks its neighborhood.
    """
    A = scores.shape[0]
    alive = scores > score_threshold
    ious = iou_matrix(boxes, boxes)

    def body(i, carry):
        alive, out_idx, out_score = carry
        masked = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked)
        best_ok = masked[best] > -jnp.inf
        out_idx = out_idx.at[i].set(jnp.where(best_ok, best, -1))
        out_score = out_score.at[i].set(jnp.where(best_ok, scores[best], 0.0))
        suppress = ious[best] >= iou_threshold
        alive = jnp.where(best_ok, jnp.logical_and(alive, jnp.logical_not(suppress)), alive)
        alive = alive.at[best].set(False)
        return alive, out_idx, out_score

    out_idx = jnp.full((max_out,), -1, jnp.int32)
    out_score = jnp.zeros((max_out,), jnp.float32)
    _, out_idx, out_score = jax.lax.fori_loop(0, max_out, body, (alive, out_idx, out_score))
    out_boxes = jnp.where(
        (out_idx >= 0)[:, None], boxes[jnp.clip(out_idx, 0)], jnp.zeros((max_out, 4))
    )
    return out_boxes, out_score


def match_anchors(
    gt_boxes: np.ndarray, anchors: np.ndarray, pos_iou: float = 0.5
) -> Tuple[np.ndarray, np.ndarray]:
    """Training-time anchor matching (host): each anchor gets the best gt if
    IoU >= pos_iou; every gt claims its best anchor.  Returns
    (labels [A] in {0,1}, matched_gt [A, 4] corner boxes)."""
    A = anchors.shape[0]
    labels = np.zeros(A, np.float32)
    matched = np.zeros((A, 4), np.float32)
    if len(gt_boxes) == 0:
        return labels, matched
    corners = np.stack(
        [
            anchors[:, 0] - anchors[:, 2] / 2,
            anchors[:, 1] - anchors[:, 3] / 2,
            anchors[:, 0] + anchors[:, 2] / 2,
            anchors[:, 1] + anchors[:, 3] / 2,
        ],
        axis=1,
    )
    # pure-numpy pairwise IoU: this runs per-sample on the host data path,
    # where tiny per-call device dispatches would dominate
    lt = np.maximum(corners[:, None, :2], gt_boxes[None, :, :2])
    rb = np.minimum(corners[:, None, 2:], gt_boxes[None, :, 2:])
    wh = np.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (corners[:, 2] - corners[:, 0]) * (corners[:, 3] - corners[:, 1])
    area_b = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    ious = np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)
    best_gt = ious.argmax(axis=1)
    best_iou = ious.max(axis=1)
    pos = best_iou >= pos_iou
    # force-match each gt's best anchor
    for g in range(len(gt_boxes)):
        a = ious[:, g].argmax()
        pos[a] = True
        best_gt[a] = g
    labels[pos] = 1.0
    matched[pos] = gt_boxes[best_gt[pos]]
    return labels, matched
