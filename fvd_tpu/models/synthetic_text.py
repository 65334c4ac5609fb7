"""Procedural text rendering for OCR pretraining.

cv2-rendered strings on textured backgrounds with known content and boxes —
trains the CTC recognizer to actually read and the region detector to
localize, without external datasets (the OCR analog of
fvd_tpu.models.synthetic_faces).
"""

from __future__ import annotations

import string
from typing import List, Tuple

import numpy as np

from fvd_tpu.models.ocr import DET_SIZE, LINE_H, LINE_W, encode_ctc_labels

#: Training alphabet: uppercase + digits + space (broadcast-overlay style,
#: matching the reference's news-chyron OCR use case).
ALPHABET = string.ascii_uppercase + string.digits + " "


def random_text(rng: np.random.RandomState, min_len=3, max_len=12) -> str:
    n = rng.randint(min_len, max_len + 1)
    return "".join(ALPHABET[rng.randint(len(ALPHABET))] for _ in range(n)).strip() or "A"


def render_line(rng: np.random.RandomState, text: str) -> np.ndarray:
    """Render one text line -> float [LINE_H, LINE_W, 1] in 0..1."""
    import cv2

    img = np.full((LINE_H, LINE_W), int(rng.randint(0, 80)), np.uint8)
    img = img + rng.randint(0, 25, img.shape).astype(np.uint8)
    scale = rng.uniform(0.55, 0.8)
    color = int(rng.randint(180, 255))
    x = rng.randint(2, 12)
    y = rng.randint(LINE_H - 12, LINE_H - 4)
    cv2.putText(img, text, (x, y), cv2.FONT_HERSHEY_SIMPLEX, scale, color, 2)
    return img.astype(np.float32)[..., None] / 255.0


def recognizer_batch(rng: np.random.RandomState, batch: int):
    """(lines float [B, 32, 256, 1], labels [B, 32] int32, texts)."""
    lines = np.zeros((batch, LINE_H, LINE_W, 1), np.float32)
    labels = np.zeros((batch, 32), np.int32)
    texts: List[str] = []
    for i in range(batch):
        text = random_text(rng)
        lines[i] = render_line(rng, text)
        labels[i] = encode_ctc_labels(text)
        texts.append(text)
    return lines, labels, texts


def detector_sample(rng: np.random.RandomState) -> Tuple[np.ndarray, np.ndarray]:
    """One detection image: RGB uint8 [DET_SIZE, DET_SIZE, 3] with 1-3 text
    strips, plus the ground-truth text mask [DET_SIZE, DET_SIZE] float."""
    import cv2

    img = (rng.rand(DET_SIZE, DET_SIZE, 3) * 90).astype(np.uint8)
    img = cv2.blur(img, (5, 5))
    mask = np.zeros((DET_SIZE, DET_SIZE), np.float32)
    for _ in range(rng.randint(1, 4)):
        text = random_text(rng, 4, 14)
        scale = rng.uniform(0.5, 0.9)
        ((tw, th), baseline) = cv2.getTextSize(text, cv2.FONT_HERSHEY_SIMPLEX, scale, 2)
        x = rng.randint(2, max(3, DET_SIZE - tw - 2))
        y = rng.randint(th + 2, DET_SIZE - baseline - 2)
        color = tuple(int(c) for c in rng.randint(170, 255, 3))
        cv2.putText(img, text, (x, y), cv2.FONT_HERSHEY_SIMPLEX, scale, color, 2)
        mask[max(0, y - th - 2) : min(DET_SIZE, y + baseline + 2),
             max(0, x - 2) : min(DET_SIZE, x + tw + 2)] = 1.0
    return img, mask


def detector_batch(rng: np.random.RandomState, batch: int):
    imgs = np.zeros((batch, DET_SIZE, DET_SIZE, 3), np.float32)
    masks = np.zeros((batch, DET_SIZE, DET_SIZE), np.float32)
    for i in range(batch):
        img, mask = detector_sample(rng)
        imgs[i] = img.astype(np.float32) / 255.0
        masks[i] = mask
    return imgs, masks
