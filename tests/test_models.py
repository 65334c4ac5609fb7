"""Model-zoo tests: shapes, decode math, trainability (loss-decrease smoke
tests at tiny widths — the full models share the same code paths)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from fvd_tpu.models import asr, encoders, face_ssd, landmarks_fan, ocr
from fvd_tpu.models.transformer import ByteTokenizer
from fvd_tpu.ops import detection


# ---------------------------------------------------------------------------
# detection ops
# ---------------------------------------------------------------------------
def test_make_anchors_counts():
    a = detection.make_anchors([(2, 2), (1, 1)], [[0.1], [0.5, 0.7]], [[1.0], [1.0, 2.0]])
    assert a.shape == (2 * 2 * 1 * 1 + 1 * 1 * 2 * 2, 4)
    assert (a[:, 2:] > 0).all()


def test_encode_decode_roundtrip():
    anchors = jnp.asarray(detection.make_anchors([(4, 4)], [[0.3]], [[1.0]]))
    rng = np.random.RandomState(0)
    boxes = []
    for _ in range(16):
        cx, cy = rng.uniform(0.2, 0.8, 2)
        w, h = rng.uniform(0.1, 0.3, 2)
        boxes.append([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
    boxes = jnp.asarray(boxes, jnp.float32)
    deltas = detection.encode_boxes(boxes, anchors)
    recovered = detection.decode_boxes(deltas, anchors)
    np.testing.assert_allclose(np.asarray(recovered), np.asarray(boxes), atol=1e-5)


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray(
        [[0.1, 0.1, 0.4, 0.4],
         [0.12, 0.12, 0.42, 0.42],   # overlaps first
         [0.6, 0.6, 0.9, 0.9]], jnp.float32
    )
    scores = jnp.asarray([0.9, 0.8, 0.7], jnp.float32)
    out_boxes, out_scores = detection.nms(boxes, scores, max_out=3, iou_threshold=0.45)
    kept = np.asarray(out_scores) > 0
    assert kept.sum() == 2
    np.testing.assert_allclose(np.asarray(out_boxes)[0], [0.1, 0.1, 0.4, 0.4], atol=1e-6)
    assert np.asarray(out_scores)[0] == pytest.approx(0.9)


def test_nms_score_threshold():
    boxes = jnp.asarray([[0.1, 0.1, 0.2, 0.2]], jnp.float32)
    scores = jnp.asarray([0.001], jnp.float32)
    _, out_scores = detection.nms(boxes, scores, max_out=2, score_threshold=0.01)
    assert (np.asarray(out_scores) == 0).all()


def test_match_anchors_force_match():
    anchors = detection.make_anchors([(4, 4)], [[0.25]], [[1.0]])
    gt = np.asarray([[0.0, 0.0, 0.05, 0.05]], np.float32)  # tiny: no anchor passes 0.5 IoU
    labels, matched = detection.match_anchors(gt, anchors)
    assert labels.sum() == 1  # its best anchor got force-matched
    np.testing.assert_allclose(matched[labels > 0][0], gt[0])


# ---------------------------------------------------------------------------
# SSD face detector
# ---------------------------------------------------------------------------
def test_ssd_forward_shapes():
    params = face_ssd.init_params(jax.random.PRNGKey(0), width=8)
    x = jnp.zeros((2, 300, 300, 3), jnp.float32)
    loc, conf = face_ssd.FaceSSD(width=8).apply(params, x)
    A = face_ssd.anchors().shape[0]
    assert loc.shape == (2, A, 4)
    assert conf.shape == (2, A)


def test_ssd_detect_batch_api():
    det = face_ssd.SSDFaceDetector(width=8, max_out=8)
    frames = np.zeros((2, 120, 160, 3), np.uint8)
    out = det.detect_batch(frames)
    assert len(out) == 2
    for dets in out:
        for d in dets:
            assert 0.0 <= d.confidence <= 1.0


def test_photometric_domain_randomization():
    """Round-3 data-realism lever: lighting/noise/blur/JPEG randomization
    keeps image shape+dtype, is deterministic per rng seed, changes pixels,
    and leaves the detector-batch contract intact."""
    from fvd_tpu.models.synthetic_faces import (detector_batch,
                                                photometric_randomize,
                                                render_face)

    rng = np.random.RandomState(0)
    img, box, pts = render_face(rng, 300, augment=True, photometric=True)
    assert img.shape == (300, 300, 3) and img.dtype == np.uint8
    assert np.all((0.0 <= box) & (box <= 1.0)) and box[2] > box[0]

    base = render_face(np.random.RandomState(1), 300, augment=True)[0]
    a = photometric_randomize(base, np.random.RandomState(2))
    b = photometric_randomize(base, np.random.RandomState(2))
    assert a.shape == base.shape and a.dtype == np.uint8
    assert np.array_equal(a, b)
    assert not np.array_equal(a, base)

    frames, labels, locs, boxes = detector_batch(
        np.random.RandomState(3), 4, augment=True, photometric=True)
    assert frames.shape[0] == 4 and np.all(np.isfinite(frames))


def test_ssd_loss_decreases():
    rng = np.random.RandomState(0)
    params = face_ssd.init_params(jax.random.PRNGKey(0), width=8)
    anchors = face_ssd.anchors()
    gt = np.asarray([[0.3, 0.3, 0.7, 0.7]], np.float32)
    labels, matched = detection.match_anchors(gt, anchors)
    loc_t = np.array(detection.encode_boxes(jnp.asarray(matched), jnp.asarray(anchors)))
    loc_t[labels == 0] = 0
    frames = rng.rand(1, 300, 300, 3).astype(np.float32) * 50
    frames[0, 90:210, 90:210] += 150

    step, init_opt = face_ssd.make_train_step(width=8, lr=1e-3)
    opt_state = init_opt(params)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(frames),
            jnp.asarray(labels[None]), jnp.asarray(loc_t[None]),
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_ssd_params_save_load_roundtrip(tmp_path):
    params = face_ssd.init_params(jax.random.PRNGKey(0), width=8)
    path = str(tmp_path / "ssd.npz")
    face_ssd.save_params(path, params)
    loaded = face_ssd.load_params(path, width=8)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# landmarks + pose
# ---------------------------------------------------------------------------
def test_decode_heatmaps_recovers_peaks():
    h = w = 32
    hm = np.full((1, h, w, 2), -5.0, np.float32)
    hm[0, 8, 24, 0] = 5.0    # x=24.5/32, y=8.5/32
    hm[0, 20, 4, 1] = 5.0
    coords = np.asarray(landmarks_fan.decode_heatmaps(jnp.asarray(hm), temperature=10.0))
    assert coords[0, 0, 0] == pytest.approx(24.5 / 32, abs=0.02)
    assert coords[0, 0, 1] == pytest.approx(8.5 / 32, abs=0.02)
    assert coords[0, 1, 0] == pytest.approx(4.5 / 32, abs=0.02)


def test_rotation_6d_orthonormal():
    rng = np.random.RandomState(0)
    d6 = jnp.asarray(rng.randn(5, 6), jnp.float32)
    R = np.asarray(landmarks_fan.rotation_6d_to_matrix(d6))
    for r in R:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-5)


def test_euler_known_rotations():
    # identity -> all zeros
    e = np.asarray(landmarks_fan.euler_from_matrix_deg(jnp.eye(3)[None]))
    np.testing.assert_allclose(e, 0.0, atol=1e-5)
    # yaw 30deg about y: R = Ry(30)
    th = np.deg2rad(30)
    Ry = np.asarray([[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]])
    e = np.asarray(landmarks_fan.euler_from_matrix_deg(jnp.asarray(Ry[None])))
    assert e[0, 1] == pytest.approx(30.0, abs=1e-3)


def test_landmark_loss_decreases():
    rng = np.random.RandomState(0)
    params = landmarks_fan.init_landmark_params(jax.random.PRNGKey(0), width=16)
    crops = rng.rand(2, 128, 128, 3).astype(np.float32)
    targets = rng.rand(2, 68, 2).astype(np.float32)
    step, init_opt = landmarks_fan.make_landmark_train_step(width=16, lr=3e-3)
    opt_state = init_opt(params)
    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state, jnp.asarray(crops),
                                       jnp.asarray(targets))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_fan_provider_maps_coords_back_to_frame():
    from fvd_tpu.synthetic import SyntheticFaceDetector, make_synthetic_video

    prov = landmarks_fan.FANLandmarks(SyntheticFaceDetector(), width=16, pose_width=16)
    frames = np.full((2, 120, 160, 3), 16, np.uint8)
    frames[:, 20:90, 40:110] = 200
    out = prov.landmarks_batch(frames)
    assert len(out) == 2
    pts = out[0][0]
    assert pts.shape == (68, 2)
    # all landmarks inside the detected face box
    assert (pts[:, 0] >= 39).all() and (pts[:, 0] <= 111).all()
    assert (pts[:, 1] >= 19).all() and (pts[:, 1] <= 91).all()
    poses = prov.pose_batch(np.zeros((3, 64, 64, 3), np.uint8))
    assert poses.shape == (3, 3)


def test_fused_landmarks_pose_matches_two_stage():
    """The fused landmark+pose program (device-derived crop boxes) must
    reproduce the legacy flow: landmark fetch -> host tracker box (padded
    landmark bbox, int truncation) -> pose_boxes_batch."""
    from fvd_tpu.nodes._tracking import FaceTracker, TrackerConfig, track_chunk
    from fvd_tpu.synthetic import SyntheticFaceDetector

    prov = landmarks_fan.FANLandmarks(SyntheticFaceDetector(), width=16,
                                      pose_width=16)
    rng = np.random.RandomState(7)
    frames = np.full((4, 120, 160, 3), 16, np.uint8)
    for i in range(4):  # moving face so every frame's box differs
        x0, y0 = 30 + 6 * i, 15 + 4 * i
        frames[i, y0:y0 + 70, x0:x0 + 70] = 200
        frames[i] += rng.randint(0, 8, frames[i].shape).astype(np.uint8)
    dev = jnp.asarray(frames)
    pad_frac = 0.1

    # legacy two-stage path
    lm = prov.landmarks_batch(frames, device_frames=dev)
    tracker = FaceTracker(TrackerConfig(frame_width=160, frame_height=120,
                                        aspect_gate=False, pad_frac=pad_frac))
    _, _, valid, boxes, sel = track_chunk(
        lm, list(range(4)), 5.0, tracker, n_pts=68, dim=3,
        collect_boxes=True, collect_sel=True)
    usable = [i for i in range(4) if valid[i] and boxes[i] is not None]
    assert usable, "tracker should lock onto the synthetic face"
    legacy = np.asarray(prov.pose_boxes_batch(
        dev, [tuple(boxes[i]) for i in usable], usable))

    # fused single-dispatch path
    lm2, poses2 = prov.landmarks_pose_batch(frames, device_frames=dev,
                                            pose_pad=pad_frac)
    for per_a, per_b in zip(lm, lm2):
        assert len(per_a) == len(per_b)
        for a, b in zip(per_a, per_b):
            np.testing.assert_allclose(a, b, atol=1e-5)
    for row, i in enumerate(usable):
        np.testing.assert_allclose(poses2[i][sel[i]], legacy[row], atol=1e-3)


def test_fused_landmarks_pose_host_fallback():
    from fvd_tpu.synthetic import SyntheticFaceDetector

    prov = landmarks_fan.FANLandmarks(SyntheticFaceDetector(), width=16,
                                      pose_width=16)
    frames = np.full((2, 120, 160, 3), 16, np.uint8)
    frames[:, 20:90, 40:110] = 200
    lm, poses = prov.landmarks_pose_batch(frames, device_frames=None,
                                          pose_pad=0.1)
    assert poses is None  # no HBM tensor -> caller uses the two-stage path
    assert len(lm) == 2 and lm[0][0].shape == (68, 2)


# ---------------------------------------------------------------------------
# text / CLIP towers
# ---------------------------------------------------------------------------
def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    ids = tok.encode("Hello, wörld!", 64)
    assert tok.decode(ids) == "Hello, wörld!"
    ids = tok.encode("x" * 300, 32)
    assert len(ids) == 32


def test_text_encoder_similarity_structure():
    enc = encoders.JaxTextEncoder(dim=32, depth=1, out_dim=32)
    vecs = enc.encode_batch(["the moon landing", "the moon landing", "pasta recipe"])
    assert vecs.shape == (3, 32)
    np.testing.assert_allclose(vecs[0], vecs[1], atol=1e-5)  # deterministic


def test_text_encoder_batch_bucketing_matches_singles():
    """encode_batch pads the batch dim to a power-of-two bucket (E1's
    variable result counts must not recompile); padding rows must not
    change the real rows."""
    enc = encoders.JaxTextEncoder(dim=32, depth=1, out_dim=32)
    texts = ["alpha beam", "casts a shadow", "over the third", "claim", "today"]
    batched = enc.encode_batch(texts)
    assert batched.shape == (5, 32)
    singles = np.stack([enc.encode(t) for t in texts])
    np.testing.assert_allclose(batched, singles, atol=1e-5)


def test_clip_provider_api():
    clip = encoders.JaxClip(dim=32, depth=1, out_dim=32)
    img = np.random.RandomState(0).randint(0, 255, (64, 64, 3)).astype(np.uint8)
    s = clip.image_text_similarity(img, "a face")
    assert -1.0 <= s <= 1.0
    assert clip.image_text_similarity(img, "a face") == pytest.approx(s)


def test_clip_loss_decreases():
    model = encoders.ClipModel(dim=32, depth=1, out_dim=32)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(4, 112, 112, 3), jnp.float32)
    tok = ByteTokenizer()
    ids = jnp.asarray(np.stack([tok.encode(t, 128) for t in ["aa", "bb", "cc", "dd"]]))
    params = model.init(jax.random.PRNGKey(0), images, ids)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(encoders.clip_loss)(params, model, images, ids)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


# ---------------------------------------------------------------------------
# ASR
# ---------------------------------------------------------------------------
def test_asr_loss_decreases_and_decodes():
    tok = ByteTokenizer()
    model = asr.AsrModel(dim=32, depth=1)
    mel = jnp.asarray(np.random.RandomState(0).rand(1, 64, asr.N_MELS), jnp.float32)
    text = "hi"
    target = tok.encode(text, 8, add_special=True)
    tokens_in = jnp.asarray(np.concatenate([[tok.BOS], target[:-1]])[None])
    tokens_out = jnp.asarray(target[None])
    params = model.init(jax.random.PRNGKey(0), mel, tokens_in)

    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(asr.asr_loss)(params, model, mel,
                                                       tokens_in, tokens_out)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5

    decoded = asr.greedy_decode(params, mel, dim=32, depth=1, max_tokens=8)
    assert decoded.shape == (1, 8)


def test_log_mel_shape():
    y = jnp.asarray(np.random.RandomState(0).randn(16000), jnp.float32)
    mel = asr.log_mel(y)
    assert mel.shape[1] == asr.N_MELS
    assert np.isfinite(np.asarray(mel)).all()


def test_jax_asr_provider_shapes(tmp_path):
    from fvd_tpu.utils.wav import write_wav

    path = str(tmp_path / "a.wav")
    write_wav(path, np.random.RandomState(0).randn(8000).astype(np.float32) * 0.1, 16000)
    prov = asr.JaxASR(dim=32, depth=1)
    result = prov.transcribe(path)
    assert result is not None
    assert "text" in result and "segments" in result


# ---------------------------------------------------------------------------
# OCR
# ---------------------------------------------------------------------------
def test_ctc_greedy_decode_collapse():
    # logits favoring: blank, 'H','H', blank, 'I' -> "HI"
    T = 5
    logits = np.full((1, T, ocr.CTC_CLASSES), -5.0, np.float32)
    hi = [ocr.CTC_VOCAB.index("H") + 1, ocr.CTC_VOCAB.index("I") + 1]
    logits[0, 0, ocr.CTC_BLANK] = 5
    logits[0, 1, hi[0]] = 5
    logits[0, 2, hi[0]] = 5
    logits[0, 3, ocr.CTC_BLANK] = 5
    logits[0, 4, hi[1]] = 5
    assert ocr.ctc_greedy_decode(logits) == ["HI"]


def test_region_boxes_connected_components():
    prob = np.zeros((64, 64), np.float32)
    prob[10:20, 5:30] = 0.9
    prob[40:50, 40:60] = 0.9
    boxes = ocr.region_boxes(prob)
    assert len(boxes) == 2
    assert (5, 10, 25, 10) in boxes


def test_ctc_recognizer_loss_decreases():
    model = ocr.CTCRecognizer(width=8)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, ocr.LINE_H, ocr.LINE_W, 1), jnp.float32)
    labels = jnp.asarray(np.stack([ocr.encode_ctc_labels("HELLO"),
                                   ocr.encode_ctc_labels("WORLD")]))
    params = model.init(jax.random.PRNGKey(0), images)
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(ocr.ctc_loss)(params, model, images, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_jax_ocr_provider_api():
    prov = ocr.JaxOCR(det_width=8, rec_width=8)
    img = np.random.RandomState(0).randint(0, 255, (120, 160, 3)).astype(np.uint8)
    out = prov.read_text(img)
    for det in out:
        assert set(det) == {"text", "confidence", "bbox"}
        assert len(det["bbox"]) == 4


def test_ssd_bf16_matches_f32_decisions():
    """bf16 backbone must produce near-identical detections to f32."""
    params = face_ssd.init_params(jax.random.PRNGKey(0), width=8)
    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (1, 120, 160, 3)).astype(np.uint8)
    )
    b16, s16 = face_ssd.detect_batch_jit(params, frames, width=8, max_out=8,
                                         compute_dtype=jnp.bfloat16)
    b32, s32 = face_ssd.detect_batch_jit(params, frames, width=8, max_out=8,
                                         compute_dtype=jnp.float32)
    # random-init logits hover near 0.5; scores agree within bf16 tolerance
    np.testing.assert_allclose(np.sort(np.asarray(s16).ravel()),
                               np.sort(np.asarray(s32).ravel()), atol=0.05)


def test_landmarks_bf16_close_to_f32():
    """bf16 vs f32 on TRAINED weights (random-init heatmaps are near-flat,
    where soft-argmax amplifies rounding noise — not the deployed regime)."""
    import os

    ckpt = os.path.join(os.path.dirname(__file__), "..", "checkpoints", "landmarks.npz")
    if not os.path.exists(ckpt):
        pytest.skip("trained landmark checkpoint not present")
    template = landmarks_fan.init_landmark_params(jax.random.PRNGKey(0), width=32)
    params = landmarks_fan.load_params(ckpt, template)

    from fvd_tpu.models.synthetic_faces import landmark_batch

    crops, _ = landmark_batch(np.random.RandomState(0), 4)
    crops_u8 = jnp.asarray((crops * 255).astype(np.uint8))
    c16 = np.asarray(landmarks_fan.landmarks_forward(params, crops_u8, width=32,
                                                     compute_dtype=jnp.bfloat16))
    c32 = np.asarray(landmarks_fan.landmarks_forward(params, crops_u8, width=32,
                                                     compute_dtype=jnp.float32))
    np.testing.assert_allclose(c16, c32, atol=0.02)  # coords in [0,1]


def test_clip_heldout_scene_discrimination():
    """The shipped CLIP separates face/background and matches overlay text
    on HELD-OUT renders (striped-background faces with accessories, unseen
    font faces) as well as in-domain — the C2 gesture check's robustness
    guard."""
    import os

    import cv2

    ckpt = os.path.join(os.path.dirname(__file__), "..", "checkpoints", "clip.npz")
    if not os.path.exists(ckpt):
        pytest.skip("trained CLIP checkpoint not present")
    import inspect
    import json

    from fvd_tpu.models.encoders import IMAGE_SIZE

    with open(ckpt.replace(".npz", ".json")) as f:
        meta = json.load(f)
    accepted = set(inspect.signature(encoders.JaxClip.__init__).parameters)
    clip = encoders.JaxClip(checkpoint=ckpt,
                            **{k: v for k, v in meta.items() if k in accepted})

    sys_path = os.path.join(os.path.dirname(__file__), "..", "tools")
    import sys

    sys.path.insert(0, sys_path)
    try:
        from eval_heldout import render_face_heldout
    finally:
        sys.path.remove(sys_path)

    rng = np.random.RandomState(9)
    ok = total = 0
    for i in range(8):
        if i % 2 == 0:
            img, _, _ = render_face_heldout(rng, IMAGE_SIZE)
            a = clip.image_text_similarity(img, "a person's face looking at the camera")
            b = clip.image_text_similarity(img, "an empty textured background")
        else:
            from fvd_tpu.models.synthetic_text import random_text

            text = random_text(rng, 3, 10)
            img = (rng.rand(IMAGE_SIZE, IMAGE_SIZE, 3) * 70).astype(np.uint8)
            img = cv2.blur(img, (3, 3))
            font = [cv2.FONT_HERSHEY_DUPLEX, cv2.FONT_HERSHEY_COMPLEX,
                    cv2.FONT_HERSHEY_TRIPLEX][rng.randint(3)]
            cv2.putText(img, text, (4, rng.randint(30, IMAGE_SIZE - 10)), font,
                        rng.uniform(0.45, 0.7), (235, 235, 235), 2)
            a = clip.image_text_similarity(img, f"text saying {text}")
            b = clip.image_text_similarity(img, f"text saying {random_text(rng, 3, 10)}")
        total += 1
        ok += int(a > b)
    assert ok >= 7, f"held-out CLIP discrimination {ok}/{total}"


def test_ocr_detector_heldout_font_floor():
    """The text-region U-Net must localize scene text rendered in font
    faces its training renderer never draws (DUPLEX/COMPLEX/TRIPLEX +
    italic).  Measured 0.939 pixel-mask IoU at n=64 (tools/eval_heldout.py
    --only ocr_det); guard a sampling-safe floor so a future checkpoint
    adoption can't silently regress unseen-glyph generalization."""
    import os

    import cv2
    import jax
    import jax.numpy as jnp

    ckpt = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                        "ocr_det.npz")
    if not os.path.exists(ckpt):
        pytest.skip("trained OCR detector checkpoint not present")
    from fvd_tpu.models.synthetic_text import detector_sample

    params, det_width, det_arch = ocr.load_detector(ckpt)
    fonts = [cv2.FONT_HERSHEY_DUPLEX, cv2.FONT_HERSHEY_COMPLEX,
             cv2.FONT_HERSHEY_TRIPLEX,
             cv2.FONT_HERSHEY_SIMPLEX | cv2.FONT_ITALIC]
    rng = np.random.RandomState(19)
    n = 16
    imgs = np.zeros((n, ocr.DET_SIZE, ocr.DET_SIZE, 3), np.float32)
    masks = np.zeros((n, ocr.DET_SIZE, ocr.DET_SIZE), np.float32)
    for i in range(n):
        img, mask = detector_sample(rng, font=fonts[rng.randint(len(fonts))])
        imgs[i] = img.astype(np.float32) / 255.0
        masks[i] = mask
    prob = np.asarray(ocr.detect_forward(params, jnp.asarray(imgs),
                                         width=det_width, arch=det_arch))
    pred, gt = prob > 0.5, masks > 0.5
    inter = (pred & gt).reshape(n, -1).sum(1)
    union = (pred | gt).reshape(n, -1).sum(1)
    iou = float(np.mean(inter / np.maximum(union, 1)))
    assert iou >= 0.85, f"held-out-font OCR detection IoU regressed: {iou}"


def test_chained_detlm_matches_unchained(monkeypatch):
    """FVD_TPU_FUSED_DETLM: the chained det->lm->pose single-fetch program
    must reproduce the un-chained fused path exactly (single-face frames,
    detections <= chained_k_slots)."""
    from fvd_tpu.models import face_ssd

    det = face_ssd.SSDFaceDetector(width=16, max_out=8)
    prov = landmarks_fan.FANLandmarks(det, width=16, pose_width=16,
                                      detector_threshold=0.05)
    # random-weight detector: many low-score detections per frame — carry
    # them ALL in the chained slots so the two paths see identical lists
    prov.chained_k_slots = 8
    rng = np.random.RandomState(11)
    frames = np.full((3, 120, 160, 3), 30, np.uint8)
    for i in range(3):
        x0, y0 = 35 + 8 * i, 18 + 5 * i
        frames[i, y0:y0 + 72, x0:x0 + 64] = 205
        frames[i] += rng.randint(0, 6, frames[i].shape).astype(np.uint8)
    dev = jnp.asarray(frames)

    monkeypatch.delenv("FVD_TPU_FUSED_DETLM", raising=False)
    lm_a, pose_a = prov.landmarks_pose_batch(frames, device_frames=dev,
                                             pose_pad=0.1)
    monkeypatch.setenv("FVD_TPU_FUSED_DETLM", "1")
    lm_b, pose_b = prov.landmarks_pose_batch(frames, device_frames=dev,
                                             pose_pad=0.1)

    assert [len(x) for x in lm_a] == [len(x) for x in lm_b]
    for per_a, per_b in zip(lm_a, lm_b):
        for a, b in zip(per_a, per_b):
            np.testing.assert_allclose(a, b, atol=1e-5)
    for per_a, per_b in zip(pose_a, pose_b):
        for a, b in zip(per_a, per_b):
            np.testing.assert_allclose(a, b, atol=1e-3)
