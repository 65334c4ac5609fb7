"""Device-resident OCR detection path (V2's degraded-link fast path).

``read_text_batch_device`` consumes HBM-resident native frames (the tensor
V1 uploads) and fetches a packbits'd binary mask instead of a float32
probability map; its detections must agree with the host batch path on the
same pixels (the only difference is cv2 vs jax.image bilinear resampling,
which may move a region edge by a pixel but not the text read).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from fvd_tpu.models import ocr  # noqa: E402

CKPT_DIR = os.path.join(os.path.dirname(__file__), "..", "checkpoints")


def _trained_ocr():
    det, rec = (os.path.join(CKPT_DIR, "ocr_det.npz"),
                os.path.join(CKPT_DIR, "ocr_rec.npz"))
    if not (os.path.exists(det) and os.path.exists(rec)):
        pytest.skip("trained OCR checkpoints not present")
    from fvd_tpu.providers.factory import _build_ocr

    return _build_ocr(det, rec)


def _scene_frame(text: str, seed: int, hw=(240, 320)) -> np.ndarray:
    import cv2

    rng = np.random.RandomState(seed)
    h, w = hw
    img = (rng.rand(h, w, 3) * 80).astype(np.uint8)
    img = cv2.blur(img, (5, 5))
    cv2.putText(img, text, (16, h // 2), cv2.FONT_HERSHEY_SIMPLEX, 1.0,
                (240, 240, 240), 2)
    return img


def _texts(dets):
    return sorted(d["text"] for d in dets)


def test_device_path_matches_host_path():
    prov = _trained_ocr()
    frames = [_scene_frame("BREAKING NEWS", 0), _scene_frame("LIVE 24", 1)]
    host = prov.read_text_batch(frames)
    dev = prov.read_text_batch_device(jnp.asarray(np.stack(frames)), frames)
    assert [_texts(d) for d in dev] == [_texts(h) for h in host]
    assert any(_texts(h) for h in host)  # the comparison is non-vacuous


def test_coalescing_ocr_device_split():
    """Two concurrent device-path requests merge into one program and split
    back per caller."""
    from fvd_tpu.providers.coalesce import CoalescingOCR

    prov = _trained_ocr()
    co = CoalescingOCR(prov, bucket_images=8, max_wait_ms=30.0)
    try:
        f1 = [_scene_frame("HELLO", 2)]
        f2 = [_scene_frame("WORLD 7", 3), _scene_frame("FVD TPU", 4)]
        import threading

        res = {}

        def call(name, fr):
            res[name] = co.read_text_batch_device(
                jnp.asarray(np.stack(fr)), fr
            )

        ts = [threading.Thread(target=call, args=("a", f1)),
              threading.Thread(target=call, args=("b", f2))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    finally:
        co.close()
    direct_a = prov.read_text_batch_device(jnp.asarray(np.stack(f1)), f1)
    direct_b = prov.read_text_batch_device(jnp.asarray(np.stack(f2)), f2)
    assert [_texts(d) for d in res["a"]] == [_texts(d) for d in direct_a]
    assert [_texts(d) for d in res["b"]] == [_texts(d) for d in direct_b]


def test_coalescing_ocr_device_falls_back_without_inner_support():
    from fvd_tpu.providers.coalesce import CoalescingOCR

    class Scripted:
        model_name = "scripted"

        def read_text_batch(self, images):
            return [[{"text": "X", "confidence": 1.0,
                      "bbox": [[0, 0], [1, 0], [1, 1], [0, 1]]}]
                    for _ in images]

    co = CoalescingOCR(Scripted(), bucket_images=8, max_wait_ms=5.0)
    try:
        frames = [_scene_frame("A", 5)]
        out = co.read_text_batch_device(jnp.asarray(np.stack(frames)), frames)
    finally:
        co.close()
    assert out[0][0]["text"] == "X"
