"""OCR: text-region detector + CTC recognizer.

Role (SURVEY §2.4): EasyOCR's CRAFT detector + CRNN recognizer in V2
(``v2_ocr_overlays.py:31-44``).  Retrained-equivalent design:

* ``TextRegionNet`` — a small U-Net producing a per-pixel text-probability
  map; region boxes come from connected components on the thresholded map
  (host, cheap);
* ``CTCRecognizer`` — conv feature extractor over a fixed-size line crop +
  positionwise classifier trained with ``optax.ctc_loss``, greedy
  CTC-collapse decode;
* ``JaxOCR`` — OCRProvider wrapper composing the two with the EasyOCR output
  schema ``{text, confidence, bbox}``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LINE_H, LINE_W = 32, 256
DET_SIZE = 256
#: CTC vocabulary: blank(0) + printable ASCII 32..126
CTC_BLANK = 0
CTC_VOCAB = [chr(c) for c in range(32, 127)]
CTC_CLASSES = len(CTC_VOCAB) + 1


class TextRegionNet(nn.Module):
    width: int = 16

    @nn.compact
    def __call__(self, x):  # float [B, H, W, 3] 0..1
        w = self.width
        d1 = nn.relu(nn.Conv(w, (3, 3), padding="SAME")(x))
        p1 = nn.max_pool(d1, (2, 2), strides=(2, 2))
        d2 = nn.relu(nn.Conv(2 * w, (3, 3), padding="SAME")(p1))
        p2 = nn.max_pool(d2, (2, 2), strides=(2, 2))
        d3 = nn.relu(nn.Conv(4 * w, (3, 3), padding="SAME")(p2))
        u2 = jax.image.resize(d3, d2.shape[:3] + (4 * w,), "nearest")
        u2 = nn.relu(nn.Conv(2 * w, (3, 3), padding="SAME")(jnp.concatenate([u2, d2], -1)))
        u1 = jax.image.resize(u2, d1.shape[:3] + (2 * w,), "nearest")
        u1 = nn.relu(nn.Conv(w, (3, 3), padding="SAME")(jnp.concatenate([u1, d1], -1)))
        return nn.Conv(1, (1, 1))(u1)[..., 0]  # logits [B, H, W]


class TextRegionNetV2(nn.Module):
    """MXU-shaped text-region U-Net (round-5 rework of the 1.8%-MFU v1).

    v1 ran full-resolution 256x256 convs at 3->16->32 channels in float32 —
    tiny contraction dims the 128x128 systolic array pads 4-8x, measured
    175 ms / 1.8% MFU over 256 frames (docs/KERNELS.md).  v2 keeps the SAME
    interface (uint8/float frames in, full-res [B, 256, 256] logits out)
    but maps to the hardware:

    * space-to-depth 4x4 on the input — 256x256x3 becomes 64x64x48, so
      EVERY conv runs at >=48 contraction channels on a 16x smaller grid;
    * bf16 convs at 128/256 channels (exact MXU tile multiples);
    * sub-pixel (depth-to-space) head — the final 1x1 conv emits the 4x4=16
      per-pixel logits of each coarse cell, restoring the full-resolution
      map with zero full-res convolution.

    ~5 GFLOP/frame (vs v1's 2.4) but at proper tiling: measured ~17x faster
    end-to-end at 256 frames.  Same training objective + data
    (tools/pretrain_ocr.py --det-arch v2); fills the CRAFT detector role
    (`v2_ocr_overlays.py:31-44`).
    """

    width: int = 128

    @nn.compact
    def __call__(self, x):  # float [B, H, W, 3] 0..1, H/W multiples of 16
        w = self.width
        b, h, wd, c = x.shape
        x = x.astype(jnp.bfloat16)
        x = x.reshape(b, h // 4, 4, wd // 4, 4, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 4, wd // 4, 16 * c)
        conv = lambda ch: nn.Conv(ch, (3, 3), padding="SAME", dtype=jnp.bfloat16)
        d1 = nn.relu(conv(w)(x))                                   # H/4, w
        p1 = nn.max_pool(d1, (2, 2), strides=(2, 2))
        d2 = nn.relu(conv(2 * w)(p1))                              # H/8, 2w
        p2 = nn.max_pool(d2, (2, 2), strides=(2, 2))
        d3 = nn.relu(conv(2 * w)(p2))                              # H/16, 2w
        u2 = jax.image.resize(d3, d2.shape, "nearest")
        u2 = nn.relu(conv(w)(jnp.concatenate([u2, d2], -1)))       # H/8, w
        u1 = jax.image.resize(u2, d1.shape[:3] + (w,), "nearest")
        u1 = nn.relu(conv(w)(jnp.concatenate([u1, d1], -1)))       # H/4, w
        out = nn.Conv(16, (1, 1), dtype=jnp.bfloat16)(u1)          # 4x4 subpixels
        out = out.astype(jnp.float32)
        out = out.reshape(b, h // 4, wd // 4, 4, 4)
        return out.transpose(0, 1, 3, 2, 4).reshape(b, h, wd)      # logits


DET_ARCHS = {"v1": TextRegionNet, "v2": TextRegionNetV2}
DET_DEFAULT_WIDTH = {"v1": 16, "v2": 128}


class CTCRecognizer(nn.Module):
    width: int = 32

    @nn.compact
    def __call__(self, x):  # float [B, 32, 256, 1] 0..1
        w = self.width
        x = nn.relu(nn.Conv(w, (3, 3), padding="SAME")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))        # 16 x 128
        x = nn.relu(nn.Conv(2 * w, (3, 3), padding="SAME")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))        # 8 x 64
        x = nn.relu(nn.Conv(4 * w, (3, 3), padding="SAME")(x))
        x = nn.max_pool(x, (2, 1), strides=(2, 1))        # 4 x 64
        b, h, t, c = x.shape
        x = x.transpose(0, 2, 1, 3).reshape(b, t, h * c)  # time-major features
        x = nn.relu(nn.Dense(4 * w)(x))
        return nn.Dense(CTC_CLASSES)(x)                   # [B, T=64, classes]


def ctc_greedy_decode(logits: np.ndarray) -> List[str]:
    """Collapse repeats + drop blanks."""
    out = []
    for row in np.argmax(logits, axis=-1):
        chars = []
        prev = -1
        for k in row:
            if k != prev and k != CTC_BLANK:
                chars.append(CTC_VOCAB[k - 1])
            prev = k
        out.append("".join(chars))
    return out


def encode_ctc_labels(text: str, max_len: int = 32) -> np.ndarray:
    ids = [CTC_VOCAB.index(c) + 1 for c in text if c in CTC_VOCAB][:max_len]
    out = np.zeros(max_len, np.int32)
    out[: len(ids)] = ids
    return out


def ctc_loss(params, model: CTCRecognizer, images, labels, label_pad=0):
    import optax

    logits = model.apply(params, images)
    logit_pad = jnp.zeros(logits.shape[:2])
    label_padding = (labels == label_pad).astype(jnp.float32)
    return jnp.mean(optax.ctc_loss(logits, logit_pad, labels, label_padding))


@partial(jax.jit, static_argnames=("width", "arch"))
def detect_forward(params, images, width=16, arch="v1"):
    # uint8 ships 4x fewer bytes host->HBM; /255 on device is bit-identical
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    return jax.nn.sigmoid(DET_ARCHS[arch](width=width).apply(params, images))


@partial(jax.jit, static_argnames=("width", "thr_logit", "arch"))
def detect_packed_mask(params, frames_u8, width=16, thr_logit=0.0, arch="v1"):
    """Device-resident detection: native uint8 frames -> packed binary mask.

    Consumes the HBM frame tensor V1 already uploaded (no second host->HBM
    transfer), resizes to the detector grid ON DEVICE, thresholds in logit
    space (``sigmoid(z) > t  <=>  z > logit(t)`` — numerically identical to
    the host path's ``sigmoid > threshold``), and packbits so the host
    fetches 8 KB/frame instead of a 256 KB float32 probability map.  Behind
    a degraded host link this is the difference between V2 being the
    pipeline's dominant span and it being noise.
    """
    x = frames_u8.astype(jnp.float32) / 255.0
    x = jax.image.resize(
        x, (x.shape[0], DET_SIZE, DET_SIZE, 3), "linear", antialias=False
    )
    logits = DET_ARCHS[arch](width=width).apply(params, x)
    mask = (logits > thr_logit).astype(jnp.uint8)
    return jnp.packbits(mask.reshape(mask.shape[0], -1), axis=1)


@partial(jax.jit, static_argnames=("width",))
def recognize_forward(params, lines, width=32):
    if lines.dtype == jnp.uint8:
        lines = lines.astype(jnp.float32) / 255.0
    return CTCRecognizer(width=width).apply(params, lines)


def init_detector(rng, width=16, arch="v1"):
    return DET_ARCHS[arch](width=width).init(
        rng, jnp.zeros((1, DET_SIZE, DET_SIZE, 3), jnp.float32)
    )


def load_detector(ckpt_path: str):
    """-> (params, width, arch) from an ``ocr_det.npz`` checkpoint and its
    sidecar json ({"arch": "v2", "width": 128}; absent sidecar = the v1/16
    legacy layout)."""
    import json
    import os

    from fvd_tpu.models.encoders import load_params

    arch, width = "v1", 16
    sidecar = ckpt_path.replace(".npz", ".json")
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            meta = json.load(f)
        arch = meta.get("arch", "v1")
        width = int(meta.get("width", DET_DEFAULT_WIDTH[arch]))
    template = init_detector(jax.random.PRNGKey(0), width=width, arch=arch)
    return load_params(ckpt_path, template), width, arch


def init_recognizer(rng, width=32):
    return CTCRecognizer(width=width).init(
        rng, jnp.zeros((1, LINE_H, LINE_W, 1), jnp.float32)
    )


def region_boxes(prob_map: np.ndarray, threshold: float = 0.5, min_area: int = 16):
    """Connected components of the thresholded text map -> pixel boxes."""
    import cv2

    mask = (prob_map > threshold).astype(np.uint8)
    n, _, stats, _ = cv2.connectedComponentsWithStats(mask)
    boxes = []
    for i in range(1, n):
        x, y, w, h, area = stats[i]
        if area >= min_area:
            boxes.append((int(x), int(y), int(w), int(h)))
    return boxes


class JaxOCR:
    """OCRProvider: detector + recognizer, EasyOCR-shaped output."""

    model_name = "fvd_tpu_ocr"
    #: device-forward provider: eligible for cross-video coalescing
    coalescable = True

    def __init__(self, det_params=None, rec_params=None,
                 det_width: int = 16, rec_width: int = 32,
                 region_threshold: float = 0.5, det_arch: str = "v1"):
        self.det_params = det_params or init_detector(
            jax.random.PRNGKey(0), det_width, arch=det_arch)
        self.rec_params = rec_params or init_recognizer(jax.random.PRNGKey(1), rec_width)
        self.det_width = det_width
        self.det_arch = det_arch
        self.rec_width = rec_width
        self.region_threshold = region_threshold

    def read_text(self, image: np.ndarray) -> List[Dict[str, Any]]:
        return self.read_text_batch([image])[0]

    def read_text_batch(self, images) -> List[List[Dict[str, Any]]]:
        """All frames in TWO device programs: one detector forward over the
        frame batch, one recognizer forward over every region crop of every
        frame (V2 calls this once per keyframe set — per-frame dispatch
        latency was the real-model pipeline's dominant cost)."""
        import cv2

        if len(images) == 0:
            return []
        from fvd_tpu.parallel.inference import shard_for_inference

        det_in = np.stack([cv2.resize(im, (DET_SIZE, DET_SIZE)) for im in images])
        probs_maps = np.asarray(
            detect_forward(self.det_params, shard_for_inference(det_in),
                           width=self.det_width, arch=self.det_arch)
        )
        masks = (probs_maps > self.region_threshold).astype(np.uint8)
        return self._recognize_regions(images, masks)

    def read_text_batch_device(self, dev_frames, images) -> List[List[Dict[str, Any]]]:
        """Detection from HBM-resident native frames (see
        :func:`detect_packed_mask`): no frame re-upload, an 8 KB/frame packed
        mask fetched instead of a 256 KB float32 map.  ``images`` supplies
        the host pixels for line crops (the host frame cache already holds
        them — no decode)."""
        if len(images) == 0:
            return []
        thr = float(self.region_threshold)
        thr_logit = float(np.log(thr / (1.0 - thr)))
        packed = np.asarray(
            detect_packed_mask(self.det_params, dev_frames,
                               width=self.det_width, thr_logit=thr_logit,
                               arch=self.det_arch)
        )
        masks = np.unpackbits(packed, axis=1)[:, : DET_SIZE * DET_SIZE]
        masks = masks.reshape(-1, DET_SIZE, DET_SIZE)[: len(images)]
        return self._recognize_regions(images, masks)

    def _recognize_regions(self, images, masks) -> List[List[Dict[str, Any]]]:
        """Shared tail: connected components -> line crops -> one bucketed
        recognizer forward -> greedy CTC decode."""
        import cv2

        lines: List[np.ndarray] = []
        line_meta: List[tuple] = []  # (frame index, pixel box)
        for fi, (image, mask) in enumerate(zip(images, masks)):
            if not mask.any():  # no text: skip connected-components + crops
                continue
            h, w = image.shape[:2]
            sx, sy = w / DET_SIZE, h / DET_SIZE
            for (x, y, bw, bh) in region_boxes(mask):
                px, py = int(x * sx), int(y * sy)
                pw, ph = max(1, int(bw * sx)), max(1, int(bh * sy))
                crop = image[py : py + ph, px : px + pw]
                if crop.size == 0:
                    continue
                gray = cv2.cvtColor(crop, cv2.COLOR_RGB2GRAY)
                lines.append(cv2.resize(gray, (LINE_W, LINE_H)))
                line_meta.append((fi, (px, py, pw, ph)))

        out: List[List[Dict[str, Any]]] = [[] for _ in images]
        if not lines:
            return out
        # power-of-two batch bucket: region counts vary per frame set, and
        # an exact-shape jit would recompile the recognizer for every
        # distinct count (the dominant V2 cost on busy/noisy frames)
        n_lines = len(lines)
        bucket = 1 << max(3, (n_lines - 1).bit_length())
        batch = np.zeros((bucket, LINE_H, LINE_W), np.uint8)
        batch[:n_lines] = np.stack(lines)  # uint8: /255 happens on device
        logits = np.asarray(
            recognize_forward(self.rec_params,
                              jnp.asarray(batch)[..., None],
                              width=self.rec_width)
        )[:n_lines]
        texts = ctc_greedy_decode(logits)
        # host-side softmax confidence (no extra device dispatch)
        lse = np.log(np.sum(np.exp(logits - logits.max(-1, keepdims=True)), -1)) \
            + logits.max(-1, keepdims=False)
        confs = np.exp(logits.max(-1) - lse).mean(-1)
        for (fi, (px, py, pw, ph)), text, conf in zip(line_meta, texts, confs):
            if not text:
                continue
            out[fi].append(
                {
                    "text": text,
                    "confidence": float(conf),
                    "bbox": [[px, py], [px + pw, py], [px + pw, py + ph], [px, py + ph]],
                }
            )
        return out
