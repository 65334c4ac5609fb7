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


def _train_font(rng: np.random.RandomState) -> int:
    """A cv2 font face for AUGMENTED training renders.

    Deliberately excludes the held-out faces (DUPLEX/COMPLEX/TRIPLEX and
    SIMPLEX|ITALIC — tools/eval_heldout.py): generalization to those is the
    thing being measured.  Multiple seen faces + the shape augmentations in
    :func:`_augment_line` teach glyph-shape invariance instead of one
    face's strokes."""
    import cv2

    faces = [cv2.FONT_HERSHEY_SIMPLEX, cv2.FONT_HERSHEY_PLAIN,
             cv2.FONT_HERSHEY_COMPLEX_SMALL, cv2.FONT_HERSHEY_SCRIPT_SIMPLEX,
             cv2.FONT_HERSHEY_PLAIN | cv2.FONT_ITALIC,
             cv2.FONT_HERSHEY_COMPLEX_SMALL | cv2.FONT_ITALIC]
    return int(faces[rng.randint(len(faces))])


def _augment_line(rng: np.random.RandomState, line: np.ndarray) -> np.ndarray:
    """Font-agnostic shape/photometric jitter on a [H, W] float 0..1 line:
    shear (slant), stroke-width morphology, blur, contrast/gamma, noise."""
    import cv2

    h, w = line.shape[:2]
    img = line[..., 0] if line.ndim == 3 else line
    if rng.rand() < 0.7:  # horizontal shear: italic-like slant
        s = rng.uniform(-0.25, 0.25)
        m = np.float32([[1, s, -s * h / 2], [0, 1, 0]])
        img = cv2.warpAffine(img, m, (w, h), borderMode=cv2.BORDER_REPLICATE)
    if rng.rand() < 0.5:  # stroke width: erode/dilate one step
        k = np.ones((2, 2), np.uint8)
        img = (cv2.dilate(img, k) if rng.rand() < 0.5 else cv2.erode(img, k))
    if rng.rand() < 0.5:
        img = cv2.GaussianBlur(img, (3, 3), rng.uniform(0.3, 1.0))
    if rng.rand() < 0.5:  # contrast/gamma jitter
        img = np.clip(img ** rng.uniform(0.7, 1.4) * rng.uniform(0.8, 1.2), 0, 1)
    if rng.rand() < 0.3:
        img = np.clip(img + rng.randn(h, w).astype(np.float32) * 0.03, 0, 1)
    return img.astype(np.float32)[..., None]


def render_line(rng: np.random.RandomState, text: str,
                font: int | None = None) -> np.ndarray:
    """Render one text line -> float [LINE_H, LINE_W, 1] in 0..1.

    Matches the inference path (ocr.py read_text_batch): text is rendered at
    an arbitrary scale/thickness, then the tight region crop is resized to
    the recognizer's line shape — so the model sees the same stretch
    statistics the detector's region boxes produce.
    """
    import cv2

    if font is None:
        font = cv2.FONT_HERSHEY_SIMPLEX
    scale = rng.uniform(0.45, 1.6)
    thickness = int(rng.randint(1, 4))
    (tw, th), baseline = cv2.getTextSize(text, font, scale, thickness)
    mx, my = int(rng.randint(1, 8)), int(rng.randint(1, 8))
    h, w = th + baseline + 2 * my, tw + 2 * mx
    img = np.full((h, w), int(rng.randint(0, 80)), np.uint8)
    img = img + rng.randint(0, 25, img.shape).astype(np.uint8)
    color = int(rng.randint(180, 255))
    cv2.putText(img, text, (mx, my + th), font, scale, color, thickness)
    img = cv2.resize(img, (LINE_W, LINE_H))
    return img.astype(np.float32)[..., None] / 255.0


def scene_crop_line(rng: np.random.RandomState, text: str,
                    font: int | None = None) -> np.ndarray:
    """Render ``text`` into a detector-style scene and crop it the way
    ``read_text_batch`` does: region box (with detector-like jitter) ->
    grayscale -> resize to the recognizer line shape.  This is the exact
    inference distribution — scene background, box quantization noise and
    all — where :func:`render_line` is the clean upper bound.

    ``font``: cv2 font face override (training always uses
    FONT_HERSHEY_SIMPLEX; tools/eval_heldout.py passes held-out faces).
    """
    import cv2

    if font is None:
        font = cv2.FONT_HERSHEY_SIMPLEX
    scale = rng.uniform(0.4, 1.4)
    thickness = int(rng.randint(1, 4))
    (tw, th), baseline = cv2.getTextSize(text, font, scale, thickness)
    if tw >= DET_SIZE - 6:
        scale *= (DET_SIZE - 8) / tw
        (tw, th), baseline = cv2.getTextSize(text, font, scale, thickness)
    img = (rng.rand(DET_SIZE, DET_SIZE, 3) * 90).astype(np.uint8)
    img = cv2.blur(img, (5, 5))
    x = rng.randint(2, max(3, DET_SIZE - tw - 2))
    y = rng.randint(th + 2, DET_SIZE - baseline - 2)
    color = tuple(int(c) for c in rng.randint(170, 255, 3))
    cv2.putText(img, text, (x, y), font, scale, color, thickness)
    # tight region box + detector-ish jitter of every edge
    x1 = max(0, x - 2 + rng.randint(-3, 4))
    y1 = max(0, y - th - 2 + rng.randint(-3, 4))
    x2 = min(DET_SIZE, x + tw + 2 + rng.randint(-3, 4))
    y2 = min(DET_SIZE, y + baseline + 2 + rng.randint(-3, 4))
    if x2 - x1 < 4 or y2 - y1 < 4:
        x1, y1 = max(0, x - 2), max(0, y - th - 2)
        x2, y2 = min(DET_SIZE, x + tw + 2), min(DET_SIZE, y + baseline + 2)
    gray = cv2.cvtColor(img[y1:y2, x1:x2], cv2.COLOR_RGB2GRAY)
    line = cv2.resize(gray, (LINE_W, LINE_H))
    return line.astype(np.float32)[..., None] / 255.0


def recognizer_batch(rng: np.random.RandomState, batch: int,
                     augment: bool = False):
    """(lines float [B, 32, 256, 1], labels [B, 32] int32, texts).

    Half the batch is clean :func:`render_line` strips, half is
    :func:`scene_crop_line` — crops produced exactly like the inference
    path, including long chyron-length strings.

    ``augment``: half of each kind additionally draws a random NON-held-out
    font face (:func:`_train_font`) and passes through the font-agnostic
    shape/photometric jitter (:func:`_augment_line`) — the glyph-shape
    invariance lever for unseen-font generalization.
    """
    lines = np.zeros((batch, LINE_H, LINE_W, 1), np.float32)
    labels = np.zeros((batch, 32), np.int32)
    texts: List[str] = []
    for i in range(batch):
        aug = augment and i % 2 == 1
        font = _train_font(rng) if aug else None
        if i % 4 < 2:
            text = random_text(rng)
            lines[i] = render_line(rng, text, font=font)
        else:
            text = random_text(rng, 4, 18)
            lines[i] = scene_crop_line(rng, text, font=font)
        if aug:
            lines[i] = _augment_line(rng, lines[i])
        labels[i] = encode_ctc_labels(text)
        texts.append(text)
    return lines, labels, texts


def detector_sample(rng: np.random.RandomState,
                    augment: bool = False,
                    font: int | None = None) -> Tuple[np.ndarray, np.ndarray]:
    """One detection image: RGB uint8 [DET_SIZE, DET_SIZE, 3] with 1-3 text
    strips, plus the ground-truth text mask [DET_SIZE, DET_SIZE] float.

    ``augment``: draw each strip in a random NON-held-out font face
    (:func:`_train_font`) so region detection generalizes to unseen glyph
    shapes too.  ``font``: explicit cv2 font-face override for every strip
    (held-out evaluation renders faces training never saw); wins over
    ``augment``."""
    import cv2

    img = (rng.rand(DET_SIZE, DET_SIZE, 3) * 90).astype(np.uint8)
    img = cv2.blur(img, (5, 5))
    mask = np.zeros((DET_SIZE, DET_SIZE), np.float32)
    for _ in range(rng.randint(1, 4)):
        text = random_text(rng, 4, 14)
        strip_font = font if font is not None else (
            _train_font(rng) if augment else cv2.FONT_HERSHEY_SIMPLEX)
        scale = rng.uniform(0.4, 1.4)
        thickness = int(rng.randint(1, 4))
        ((tw, th), baseline) = cv2.getTextSize(text, strip_font, scale, thickness)
        if tw >= DET_SIZE - 6:
            scale *= (DET_SIZE - 8) / tw
            ((tw, th), baseline) = cv2.getTextSize(text, strip_font, scale,
                                                   thickness)
        x = rng.randint(2, max(3, DET_SIZE - tw - 2))
        y = rng.randint(th + 2, DET_SIZE - baseline - 2)
        color = tuple(int(c) for c in rng.randint(170, 255, 3))
        cv2.putText(img, text, (x, y), strip_font, scale, color, thickness)
        mask[max(0, y - th - 2) : min(DET_SIZE, y + baseline + 2),
             max(0, x - 2) : min(DET_SIZE, x + tw + 2)] = 1.0
    return img, mask


def detector_batch(rng: np.random.RandomState, batch: int,
                   augment: bool = False):
    imgs = np.zeros((batch, DET_SIZE, DET_SIZE, 3), np.float32)
    masks = np.zeros((batch, DET_SIZE, DET_SIZE), np.float32)
    for i in range(batch):
        img, mask = detector_sample(rng, augment=augment and i % 2 == 1)
        imgs[i] = img.astype(np.float32) / 255.0
        masks[i] = mask
    return imgs, masks
