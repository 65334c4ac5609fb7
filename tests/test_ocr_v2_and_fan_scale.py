"""Round-5 additions: the MXU-shaped OCR detector (TextRegionNetV2) and the
reference-scale vision modules (FAN 4-stack hourglass / ResNet-50 pose).

Covers the v2 detector's interface parity with v1 (same logits shape, same
packed-mask layout, sidecar-driven arch selection through load_detector /
the provider factory) and shape/trainability smoke at reduced widths for
the FAN-geometry modules (full-width forwards live in tools/kernel_bench.py
--real-geometry and dryrun check 3c — too heavy for the unit suite).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from fvd_tpu.models import ocr  # noqa: E402


def test_v2_detector_interface_matches_v1():
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, ocr.DET_SIZE, ocr.DET_SIZE, 3), jnp.float32)
    p2 = ocr.init_detector(jax.random.PRNGKey(0), width=32, arch="v2")
    out = ocr.detect_forward(p2, imgs, width=32, arch="v2")
    assert out.shape == (2, ocr.DET_SIZE, ocr.DET_SIZE)
    assert np.all(np.asarray(out) >= 0) and np.all(np.asarray(out) <= 1)

    frames = jnp.asarray(rng.randint(0, 255, (2, 240, 320, 3), np.uint8))
    packed = ocr.detect_packed_mask(p2, frames, width=32, arch="v2")
    # same packbits layout as v1 (8 KB per frame at DET_SIZE=256)
    assert packed.shape == (2, ocr.DET_SIZE * ocr.DET_SIZE // 8)


def test_v2_detector_trains():
    """A few BCE steps on a fixed target must reduce the loss (the
    pretrain_ocr objective at reduced width)."""
    import optax

    rng = np.random.RandomState(1)
    model = ocr.TextRegionNetV2(width=32)
    imgs = jnp.asarray(rng.rand(2, ocr.DET_SIZE, ocr.DET_SIZE, 3), jnp.float32)
    masks = jnp.asarray((rng.rand(2, ocr.DET_SIZE, ocr.DET_SIZE) > 0.8),
                        jnp.float32)
    params = model.init(jax.random.PRNGKey(1), imgs)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def loss_fn(p):
        logits = model.apply(p, imgs)
        bce = (jnp.maximum(logits, 0) - logits * masks
               + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        return jnp.mean(bce)

    @jax.jit
    def step(p, o):
        loss, g = jax.value_and_grad(loss_fn)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    losses = []
    for _ in range(5):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_load_detector_sidecar_roundtrip(tmp_path):
    from fvd_tpu.models.encoders import save_params

    params = ocr.init_detector(jax.random.PRNGKey(2), width=32, arch="v2")
    ckpt = str(tmp_path / "ocr_det.npz")
    save_params(ckpt, params)
    with open(str(tmp_path / "ocr_det.json"), "w") as f:
        json.dump({"arch": "v2", "width": 32}, f)
    loaded, width, arch = ocr.load_detector(ckpt)
    assert (width, arch) == (32, "v2")
    a = jax.tree_util.tree_leaves(params)[0]
    b = jax.tree_util.tree_leaves(loaded)[0]
    assert np.allclose(np.asarray(a), np.asarray(b))

    # absent sidecar -> legacy v1/16
    params1 = ocr.init_detector(jax.random.PRNGKey(3), width=16, arch="v1")
    ckpt1 = str(tmp_path / "legacy.npz")
    save_params(ckpt1, params1)
    _, width1, arch1 = ocr.load_detector(ckpt1)
    assert (width1, arch1) == (16, "v1")


def test_factory_builds_v2_provider(tmp_path):
    from fvd_tpu.models.encoders import save_params
    from fvd_tpu.providers.factory import _build_ocr

    params = ocr.init_detector(jax.random.PRNGKey(4), width=32, arch="v2")
    ckpt = str(tmp_path / "ocr_det.npz")
    save_params(ckpt, params)
    with open(str(tmp_path / "ocr_det.json"), "w") as f:
        json.dump({"arch": "v2", "width": 32}, f)
    prov = _build_ocr(ckpt, str(tmp_path / "missing_rec.npz"))
    assert prov.det_arch == "v2" and prov.det_width == 32


def test_fan_landmark_net_shapes_reduced_width():
    from fvd_tpu.models import landmarks_fan as lf

    rng = np.random.RandomState(5)
    crops = jnp.asarray(rng.rand(1, lf.FAN_CROP_SIZE, lf.FAN_CROP_SIZE, 3),
                        jnp.float32)
    net = lf.FANLandmarkNet(width=32, n_stacks=2)
    params = net.init(jax.random.PRNGKey(5), crops)
    hm = net.apply(params, crops)
    assert hm.shape == (1, lf.FAN_HEATMAP_SIZE, lf.FAN_HEATMAP_SIZE,
                        lf.N_LANDMARKS)
    coords = lf.decode_heatmaps(hm)
    assert coords.shape == (1, lf.N_LANDMARKS, 2)
    assert np.all(np.asarray(coords) >= 0) and np.all(np.asarray(coords) <= 1)


def test_pose_resnet_shapes_reduced_depth():
    """Full ResNet-50 is kernel-bench territory; here the block family and
    head plumbing: a 2-stage bottleneck stack emits valid euler angles."""
    import flax.linen as nn

    from fvd_tpu.models import landmarks_fan as lf

    class SmallPose(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(16, (7, 7), strides=(4, 4), padding="SAME")(x)
            x = lf.Bottleneck(32, stride=2)(x)
            x = lf.Bottleneck(64, stride=2)(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(6)(x)

    rng = np.random.RandomState(6)
    crops = jnp.asarray(rng.rand(2, 224, 224, 3), jnp.float32)
    net = SmallPose()
    d6 = net.apply(net.init(jax.random.PRNGKey(6), crops), crops)
    R = lf.rotation_6d_to_matrix(d6)
    eye = jnp.einsum("bij,bkj->bik", R, R)
    assert np.allclose(np.asarray(eye), np.eye(3)[None], atol=1e-5)
    euler = lf.euler_from_matrix_deg(R)
    assert euler.shape == (2, 3)


def test_fan_full_geometry_param_count():
    """The FAN-geometry module really is reference scale: >=10M params at
    FAN's exact crop/heatmap/stack/width geometry and ~18 GFLOP/crop
    (face_alignment FAN 4-stack: 23.8M params, ~19 GFLOP;
    `v3_mouth_landmarks_timeseries.py:94`).  The shipped toy checkpoint is
    ~0.2M — two orders below this floor, so the bound separates them."""
    from fvd_tpu.models import landmarks_fan as lf

    params = lf.init_fan_params(jax.random.PRNGKey(7))
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    assert 10e6 < n < 40e6, f"FAN-geometry param count off: {n / 1e6:.1f}M"
