"""Hourglass landmark regressor + 6D head-pose head.

Fills the roles of face_alignment's FAN (68-point landmarks,
``v3_mouth_landmarks_timeseries.py:94``) and SixDRepNet (6D rotation head
pose, ``v4_blink_headpose_dynamics.py:133-135``) with a single compact
flax model family:

* ``LandmarkHourglass``: crop [B, 128, 128, 3] -> 68 heatmaps, decoded with
  a differentiable soft-argmax (trainable end-to-end, one jitted batch
  forward for the whole sampled-frame tensor);
* ``PoseHead``: crop -> 6D rotation representation -> orthonormal rotation
  matrix (Gram-Schmidt) -> (pitch, yaw, roll) euler degrees, the exact
  SixDRepNet output convention.

Retrained-equivalent design (SURVEY §7 weight provenance); checkpoints load
via save_params/load_params, random init otherwise; overfit smoke tests in
tests/test_models.py prove trainability.
"""

from __future__ import annotations

import os
from functools import partial
from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CROP_SIZE = 128
HEATMAP_SIZE = 32
N_LANDMARKS = 68


class ResBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        r = x
        x = nn.GroupNorm(num_groups=8)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        x = nn.GroupNorm(num_groups=8)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        if r.shape[-1] != self.features:
            r = nn.Conv(self.features, (1, 1))(r)
        return x + r


class Hourglass(nn.Module):
    features: int
    depth: int = 3

    @nn.compact
    def __call__(self, x):
        skips = []
        for _ in range(self.depth):
            skips.append(ResBlock(self.features)(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = ResBlock(self.features)(x)
        x = ResBlock(self.features)(x)
        for skip in reversed(skips):
            x = jax.image.resize(x, skip.shape, "nearest")
            x = ResBlock(self.features)(x + skip)
        return x


class LandmarkHourglass(nn.Module):
    """[B, 128, 128, 3] float (0..1) -> heatmaps [B, 32, 32, 68]."""

    width: int = 64

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.width, (7, 7), strides=(2, 2), padding="SAME")(x)  # 64
        x = nn.relu(nn.GroupNorm(num_groups=8)(x))
        x = ResBlock(self.width)(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))                          # 32
        x = Hourglass(self.width)(x)
        x = nn.relu(nn.GroupNorm(num_groups=8)(x))
        return nn.Conv(N_LANDMARKS, (1, 1))(x)


def decode_heatmaps(heatmaps: jax.Array, temperature: float = 10.0) -> jax.Array:
    """Soft-argmax: [..., H, W, K] -> [..., K, 2] (x, y) in [0, 1]."""
    *lead, h, w, k = heatmaps.shape
    flat = heatmaps.reshape(*lead, h * w, k) * temperature
    attn = jax.nn.softmax(flat, axis=-2)
    ys = (jnp.arange(h) + 0.5) / h
    xs = (jnp.arange(w) + 0.5) / w
    grid_y = jnp.repeat(ys, w)
    grid_x = jnp.tile(xs, h)
    x = jnp.einsum("...ak,a->...k", attn, grid_x)
    y = jnp.einsum("...ak,a->...k", attn, grid_y)
    return jnp.stack([x, y], axis=-1)


class PoseHead(nn.Module):
    """[B, 128, 128, 3] -> 6D rotation representation [B, 6]."""

    width: int = 32

    @nn.compact
    def __call__(self, x):
        for i, s in enumerate([2, 2, 2, 2]):
            x = nn.Conv(self.width * (2 ** min(i, 2)), (3, 3), strides=(s, s),
                        padding="SAME")(x)
            x = nn.relu(nn.GroupNorm(num_groups=8)(x))
        x = jnp.mean(x, axis=(1, 2))
        x = nn.relu(nn.Dense(128)(x))
        return nn.Dense(6)(x)


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """Gram-Schmidt 6D -> SO(3) (Zhou et al., the SixDRepNet representation)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + 1e-8)
    a2_proj = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2_proj / (jnp.linalg.norm(a2_proj, axis=-1, keepdims=True) + 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def euler_from_matrix_deg(R: jax.Array) -> jax.Array:
    """Rotation matrix -> (pitch, yaw, roll) degrees, SixDRepNet convention."""
    sy = jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2)
    singular = sy < 1e-6
    pitch = jnp.where(
        singular,
        jnp.arctan2(-R[..., 1, 2], R[..., 1, 1]),
        jnp.arctan2(R[..., 2, 1], R[..., 2, 2]),
    )
    yaw = jnp.arctan2(-R[..., 2, 0], sy)
    roll = jnp.where(singular, 0.0, jnp.arctan2(R[..., 1, 0], R[..., 0, 0]))
    return jnp.stack([pitch, yaw, roll], axis=-1) * (180.0 / jnp.pi)


# ---------------------------------------------------------------------------
# Reference-scale vision models (FAN / SixDRepNet geometry)
# ---------------------------------------------------------------------------
FAN_CROP_SIZE = 256
FAN_HEATMAP_SIZE = 64


class Bottleneck(nn.Module):
    """Pre-activation 1x1-3x3-1x1 bottleneck residual (the FAN / ResNet-50
    block family).  ``mid`` defaults to the ResNet-50 4x expansion
    (features//4); the FAN hourglass uses features//2 (its ConvBlocks keep
    half-width 3x3s, which is where FAN's ~19 GFLOP/crop lives)."""

    features: int
    stride: int = 1
    mid: int | None = None
    dtype: "jnp.dtype" = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.mid or self.features // 4
        r = x
        y = nn.relu(nn.GroupNorm(num_groups=8, dtype=self.dtype)(x))
        y = nn.Conv(mid, (1, 1), dtype=self.dtype)(y)
        y = nn.relu(nn.GroupNorm(num_groups=8, dtype=self.dtype)(y))
        y = nn.Conv(mid, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", dtype=self.dtype)(y)
        y = nn.relu(nn.GroupNorm(num_groups=8, dtype=self.dtype)(y))
        y = nn.Conv(self.features, (1, 1), dtype=self.dtype)(y)
        if r.shape[-1] != self.features or self.stride != 1:
            r = nn.Conv(self.features, (1, 1),
                        strides=(self.stride, self.stride), dtype=self.dtype)(r)
        return y + r


class HourglassB(nn.Module):
    """Bottleneck-block hourglass (the FAN building unit; half-width 3x3
    contractions — see Bottleneck.mid)."""

    features: int
    depth: int = 4
    dtype: "jnp.dtype" = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.features // 2
        skips = []
        for _ in range(self.depth):
            skips.append(Bottleneck(self.features, mid=mid, dtype=self.dtype)(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = Bottleneck(self.features, mid=mid, dtype=self.dtype)(x)
        x = Bottleneck(self.features, mid=mid, dtype=self.dtype)(x)
        for skip in reversed(skips):
            x = jax.image.resize(x, skip.shape, "nearest")
            x = Bottleneck(self.features, mid=mid, dtype=self.dtype)(x + skip)
        return x


class FANLandmarkNet(nn.Module):
    """Reference-scale FAN: ``n_stacks`` stacked 256-feature hourglasses over
    256x256 crops -> 64x64x68 heatmaps with intermediate supervision
    (face_alignment's FAN, `v3_mouth_landmarks_timeseries.py:94,130` — the
    geometry the shipped 864 KB hourglass stands in for: same crop size,
    heatmap size, stack count and feature width; ~14M params / ~18 GFLOP
    per crop, FLOP-parity with FAN's ~19).  Returns the LAST stack's
    heatmaps; ``decode_heatmaps`` applies unchanged, so this drops into
    the V3 path at checkpoint-scale."""

    width: int = 256
    n_stacks: int = 4
    dtype: "jnp.dtype" = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, 256, 256, 3] -> [B, 64, 64, 68]
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                    dtype=self.dtype)(x)                                # 128
        x = nn.relu(nn.GroupNorm(num_groups=8, dtype=self.dtype)(x))
        x = Bottleneck(128, dtype=self.dtype)(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))                      # 64
        x = Bottleneck(self.width, dtype=self.dtype)(x)
        hm = None
        for s in range(self.n_stacks):
            y = HourglassB(self.width, dtype=self.dtype)(x)
            y = Bottleneck(self.width, dtype=self.dtype)(y)
            y = nn.relu(nn.GroupNorm(num_groups=8, dtype=self.dtype)(
                nn.Conv(self.width, (1, 1), dtype=self.dtype)(y)))
            hm = nn.Conv(N_LANDMARKS, (1, 1), dtype=self.dtype)(y)
            if s < self.n_stacks - 1:  # intermediate-supervision remix
                x = (x + nn.Conv(self.width, (1, 1), dtype=self.dtype)(y)
                     + nn.Conv(self.width, (1, 1), dtype=self.dtype)(hm))
        return hm.astype(jnp.float32)


class PoseResNet50(nn.Module):
    """ResNet-50-scale 6D pose backbone (SixDRepNet's backbone class,
    `v4_blink_headpose_dynamics.py:133-135`): [3,4,6,3] bottleneck stages
    at 256/512/1024/2048 channels over 224x224 crops -> 6D rotation."""

    dtype: "jnp.dtype" = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, 224, 224, 3] -> [B, 6]
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                    dtype=self.dtype)(x)
        x = nn.relu(nn.GroupNorm(num_groups=8, dtype=self.dtype)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for ch, blocks, stride in ((256, 3, 1), (512, 4, 2),
                                   (1024, 6, 2), (2048, 3, 2)):
            x = Bottleneck(ch, stride=stride, dtype=self.dtype)(x)
            for _ in range(blocks - 1):
                x = Bottleneck(ch, dtype=self.dtype)(x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(6)(x)


def init_fan_params(rng, width: int = 256, n_stacks: int = 4,
                    dtype=jnp.float32):
    dummy = jnp.zeros((1, FAN_CROP_SIZE, FAN_CROP_SIZE, 3), jnp.float32)
    return FANLandmarkNet(width=width, n_stacks=n_stacks,
                          dtype=dtype).init(rng, dummy)


def init_pose50_params(rng, dtype=jnp.float32):
    dummy = jnp.zeros((1, 224, 224, 3), jnp.float32)
    return PoseResNet50(dtype=dtype).init(rng, dummy)


# ---------------------------------------------------------------------------
# Param management
# ---------------------------------------------------------------------------
def init_landmark_params(rng, width: int = 64):
    dummy = jnp.zeros((1, CROP_SIZE, CROP_SIZE, 3), jnp.float32)
    return LandmarkHourglass(width=width).init(rng, dummy)


def init_pose_params(rng, width: int = 32):
    dummy = jnp.zeros((1, CROP_SIZE, CROP_SIZE, 3), jnp.float32)
    return PoseHead(width=width).init(rng, dummy)


def save_params(path: str, params) -> None:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    np.savez(path, **{jax.tree_util.keystr(k): np.asarray(v) for k, v in flat})


def load_params(path: str, template):
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    values = [jnp.asarray(data[jax.tree_util.keystr(k)]) for k, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, values)


# ---------------------------------------------------------------------------
# Jitted batch forwards
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("width", "compute_dtype"))
def landmarks_forward(params, crops: jax.Array, width: int = 64,
                      compute_dtype=jnp.bfloat16) -> jax.Array:
    """crops uint8 [B, S, S, 3] -> landmark coords [B, 68, 2] in crop [0,1].

    Backbone in ``compute_dtype`` (bf16 default); the soft-argmax decode
    runs in float32 for coordinate precision."""
    x = crops.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (x.shape[0], CROP_SIZE, CROP_SIZE, 3), "linear")
    cast_params = jax.tree.map(lambda p: p.astype(compute_dtype), params)
    hm = LandmarkHourglass(width=width).apply(cast_params, x.astype(compute_dtype))
    return decode_heatmaps(hm.astype(jnp.float32))


@partial(jax.jit, static_argnames=("width",))
def pose_forward(params, crops: jax.Array, width: int = 32) -> jax.Array:
    """crops uint8 [B, S, S, 3] -> (pitch, yaw, roll) degrees [B, 3]."""
    x = crops.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (x.shape[0], CROP_SIZE, CROP_SIZE, 3), "linear")
    d6 = PoseHead(width=width).apply(params, x)
    return euler_from_matrix_deg(rotation_6d_to_matrix(d6))


def _device_crops(frames_dev: jax.Array, boxes: jax.Array, owners: jax.Array) -> jax.Array:
    """Gather + resize face crops ON DEVICE from the HBM-resident frame
    tensor: [T,H,W,3] uint8 + [N,4] px boxes + [N] owner ids -> float crops
    [N, CROP_SIZE, CROP_SIZE, 3] in 0..1. Replicates cv2's half-pixel
    mapping (dst o -> src (o+0.5)/scale - 0.5): scale = crop/(extent),
    translation = -origin*scale."""
    imgs = jnp.take(frames_dev, owners, axis=0).astype(jnp.float32)

    def one(img, box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        sy = CROP_SIZE / jnp.maximum(y2 - y1, 1.0)
        sx = CROP_SIZE / jnp.maximum(x2 - x1, 1.0)
        return jax.image.scale_and_translate(
            img, (CROP_SIZE, CROP_SIZE, 3), (0, 1),
            jnp.stack([sy, sx]), jnp.stack([-y1 * sy, -x1 * sx]),
            method="linear", antialias=False,
        )

    return jax.vmap(one)(imgs, boxes) / 255.0


@partial(jax.jit, static_argnames=("width", "compute_dtype"))
def landmarks_from_frames(params, frames_dev, boxes, owners, width: int = 64,
                          compute_dtype=jnp.bfloat16) -> jax.Array:
    """Fused device program: crop from the frame tensor + hourglass forward.
    No crop bytes ever cross the host link."""
    x = _device_crops(frames_dev, boxes, owners)
    cast_params = jax.tree.map(lambda p: p.astype(compute_dtype), params)
    hm = LandmarkHourglass(width=width).apply(cast_params, x.astype(compute_dtype))
    return decode_heatmaps(hm.astype(jnp.float32))


@partial(jax.jit, static_argnames=("width",))
def pose_from_frames(params, frames_dev, boxes, owners, width: int = 32) -> jax.Array:
    """Fused device program: crop + 6D pose head."""
    x = _device_crops(frames_dev, boxes, owners)
    d6 = PoseHead(width=width).apply(params, x)
    return euler_from_matrix_deg(rotation_6d_to_matrix(d6))


@partial(jax.jit, static_argnames=("width", "pose_width", "compute_dtype"))
def landmarks_pose_from_frames(lmk_params, pose_params, frames_dev, boxes,
                               owners, frame_w, frame_h, pad_frac,
                               width: int = 64, pose_width: int = 32,
                               compute_dtype=jnp.bfloat16):
    """ONE device program: crop gather + hourglass landmarks + per-detection
    6D pose — the pose crop box derived ON DEVICE from the landmark coords.

    Eliminates the landmark-fetch -> host-track -> pose-dispatch round trip
    the V4 node otherwise pays per chunk (reference runs FAN then SixDRepNet
    as two separate model calls per sampled frame, v4:131-135).  The box
    math replicates the host tracker exactly (``_tracking.landmark_box`` +
    V4's pad/clip, both int-truncation): frame-space points in float32 with
    the same expression order, so min/max/trunc agree bit-for-bit.  Two residual
    divergence sources remain, each able to shift a crop edge by 1 px on
    integer-boundary inputs: the pad product ``(x_max - x_min) * pad_frac``
    (host float64, device float32) and possible XLA FMA contraction of the
    ``x1 + c * (x2 - x1)`` expressions (single rounding vs numpy's two) —
    paired-eval guarded.
    """
    coords = landmarks_from_frames.__wrapped__(
        lmk_params, frames_dev, boxes, owners, width=width,
        compute_dtype=compute_dtype)                       # [N, 68, 2] in [0,1]
    x1, y1 = boxes[:, 0], boxes[:, 1]
    x2, y2 = boxes[:, 2], boxes[:, 3]
    px = x1[:, None] + coords[:, :, 0] * (x2 - x1)[:, None]   # float32, same
    py = y1[:, None] + coords[:, :, 1] * (y2 - y1)[:, None]   # expr as host
    bx1, bx2 = jnp.trunc(jnp.min(px, axis=1)), jnp.trunc(jnp.max(px, axis=1))
    by1, by2 = jnp.trunc(jnp.min(py, axis=1)), jnp.trunc(jnp.max(py, axis=1))
    pad_w = jnp.trunc((bx2 - bx1) * pad_frac)
    pad_h = jnp.trunc((by2 - by1) * pad_frac)
    qx1 = jnp.maximum(0.0, bx1 - pad_w)
    qy1 = jnp.maximum(0.0, by1 - pad_h)
    qx2 = jnp.minimum(jnp.float32(frame_w), bx2 + pad_w)
    qy2 = jnp.minimum(jnp.float32(frame_h), by2 + pad_h)
    pose_boxes = jnp.stack([qx1, qy1, qx2, qy2], axis=1)
    pc = _device_crops(frames_dev, pose_boxes, owners)
    d6 = PoseHead(width=pose_width).apply(pose_params, pc)
    pose = euler_from_matrix_deg(rotation_6d_to_matrix(d6))
    return coords, pose


@partial(jax.jit, static_argnames=("det_width", "det_max_out", "k_slots",
                                   "width", "pose_width", "compute_dtype"))
def detlm_pose_from_frames(det_params, lmk_params, pose_params, frames_dev,
                           frame_w, frame_h, det_threshold, pad_frac,
                           det_width: int = 32, det_max_out: int = 32,
                           k_slots: int = 2, width: int = 64,
                           pose_width: int = 32,
                           compute_dtype=jnp.bfloat16):
    """CHAINED detector -> crop -> landmarks -> pose: one device program,
    one host fetch (opt-in, ``FVD_TPU_FUSED_DETLM=1``).

    The un-chained path fetches the detector output to the host to build
    crop boxes before dispatching the landmark program — a full round trip
    between two dispatches, per coalesced group.  Here the host gate
    (``FANLandmarks._collect_detections``: confidence >= threshold, int
    truncation, clip to frame, >= 4 px) is replicated on device over the
    top ``k_slots`` NMS outputs per frame (NMS is score-sorted), and the
    landmark/pose forwards consume the resulting boxes directly.  Slots
    beyond ``k_slots`` valid detections per frame are dropped — the only
    semantic difference from the un-chained path (irrelevant for the
    single-face tracker pipeline; the cap is the price of static shapes).

    Returns ``(det_boxes [T, K, 4] f32 int-valued, scores [T, K],
    valid [T, K] bool, coords [T*K, 68, 2], poses [T*K, 3])`` — row
    ``i * K + k`` of coords/poses belongs to slot ``k`` of frame ``i``.
    """
    from fvd_tpu.models import face_ssd

    boxes_n, scores = face_ssd.detect_batch_jit.__wrapped__(
        det_params, frames_dev, width=det_width, max_out=det_max_out,
        compute_dtype=compute_dtype)
    T = frames_dev.shape[0]
    kb = boxes_n[:, :k_slots, :]                       # [T, K, 4] normalized
    ks = scores[:, :k_slots]                           # [T, K]
    w32, h32 = jnp.float32(frame_w), jnp.float32(frame_h)
    # the host gate's exact arithmetic: px floats -> int trunc -> clip
    x1 = jnp.maximum(0.0, jnp.trunc(kb[..., 0] * w32))
    y1 = jnp.maximum(0.0, jnp.trunc(kb[..., 1] * h32))
    x2 = jnp.minimum(w32, jnp.trunc(kb[..., 2] * w32))
    y2 = jnp.minimum(h32, jnp.trunc(kb[..., 3] * h32))
    valid = ((ks > 0.0) & (ks >= det_threshold)
             & (x2 - x1 >= 4) & (y2 - y1 >= 4))
    det_boxes = jnp.stack([x1, y1, x2, y2], axis=-1)   # [T, K, 4]
    flat_boxes = det_boxes.reshape(T * k_slots, 4)
    flat_owners = jnp.repeat(jnp.arange(T, dtype=jnp.int32), k_slots)
    coords, poses = landmarks_pose_from_frames.__wrapped__(
        lmk_params, pose_params, frames_dev, flat_boxes, flat_owners,
        frame_w, frame_h, pad_frac, width=width, pose_width=pose_width,
        compute_dtype=compute_dtype)
    return det_boxes, ks, valid, coords, poses


def _pad_bucket(n: int) -> int:
    """Static shape bucket (next power of two, >= 8) so varying face counts
    don't recompile the fused programs."""
    b = 8
    while b < n:
        b *= 2
    return b


def _marshal_boxes(boxes, owners):
    """(boxes, owners) lists -> bucket-padded f32/i32 arrays + real count.
    Pad rows are the [0, 0, CROP_SIZE, CROP_SIZE] sentinel of owner 0 —
    valid inputs whose outputs are sliced off.  ONE implementation shared
    by every fused program entry so the pad contract can't drift."""
    n = len(boxes)
    pad = _pad_bucket(n)
    boxes_arr = np.zeros((pad, 4), np.float32)
    boxes_arr[:n] = np.asarray(boxes, np.float32)
    boxes_arr[n:] = [0, 0, CROP_SIZE, CROP_SIZE]
    owners_arr = np.zeros(pad, np.int32)
    owners_arr[:n] = owners
    return jnp.asarray(boxes_arr), jnp.asarray(owners_arr), n


# ---------------------------------------------------------------------------
# Provider wrapper: detector-guided landmarks over full frames
# ---------------------------------------------------------------------------
class FANLandmarks:
    """LandmarkProvider: compose a face detector with the landmark/pose nets.

    The reference's face_alignment bundles its own SFD detector; here the
    detector is injected (any FaceDetectorProvider) and crops for ALL frames
    are batched into single forwards.
    """

    model_name = "fvd_tpu_hourglass"
    #: the inner detector forward can consume an HBM-resident frame tensor
    accepts_device_frames = True

    def __init__(self, face_detector, landmark_params=None, pose_params=None,
                 width: int = 64, pose_width: int = 32,
                 detector_threshold: float = 0.5):
        self.face_detector = face_detector
        self.landmark_params = landmark_params or init_landmark_params(
            jax.random.PRNGKey(1), width)
        self.pose_params = pose_params or init_pose_params(
            jax.random.PRNGKey(2), pose_width)
        self.width = width
        self.pose_width = pose_width
        self.detector_threshold = detector_threshold

    def _collect_detections(self, detections, frame_w: int, frame_h: int):
        """Apply the confidence / clip / min-size gate — the ONE
        implementation of the detection filter shared by the legacy and
        fused paths (their parity tests assume identical gating)."""
        owners, boxes = [], []
        for i, dets in enumerate(detections):
            for d in dets:
                if d.confidence < self.detector_threshold:
                    continue
                x1, y1 = max(0, int(d.x1)), max(0, int(d.y1))
                x2, y2 = min(frame_w, int(d.x2)), min(frame_h, int(d.y2))
                if x2 - x1 < 4 or y2 - y1 < 4:
                    continue
                owners.append(i)
                boxes.append((x1, y1, x2, y2))
        return owners, boxes

    def landmarks_batch(self, frames: np.ndarray,
                        device_frames=None) -> List[List[np.ndarray]]:
        """``device_frames``: HBM-resident copy of ``frames`` — the detector
        forward consumes it directly, skipping a second host->HBM upload of
        the full frame batch (crops stay host-side where the frames already
        live)."""
        import cv2

        detections = self.face_detector.detect_batch(
            frames if device_frames is None else device_frames)
        h, w = frames.shape[1:3]
        owners, boxes = self._collect_detections(detections, w, h)
        out: List[List[np.ndarray]] = [[] for _ in range(len(frames))]
        if not boxes:
            return out
        if device_frames is not None:
            # crops gathered on device from the HBM-resident tensor: zero
            # crop bytes over the host link
            boxes_arr, owners_arr, n = _marshal_boxes(boxes, owners)
            coords = np.asarray(
                landmarks_from_frames(self.landmark_params, device_frames,
                                      boxes_arr, owners_arr, width=self.width)
            )[:n]
        else:
            from fvd_tpu.parallel.inference import shard_for_inference

            crops = [
                cv2.resize(frame[y1:y2, x1:x2], (CROP_SIZE, CROP_SIZE))
                for (x1, y1, x2, y2), i in zip(boxes, owners)
                for frame in (frames[i],)
            ]
            coords = np.asarray(
                landmarks_forward(self.landmark_params,
                                  shard_for_inference(np.stack(crops)),
                                  width=self.width)
            )
        for (x1, y1, x2, y2), owner, c in zip(boxes, owners, coords):
            pts = np.stack(
                [x1 + c[:, 0] * (x2 - x1), y1 + c[:, 1] * (y2 - y1)], axis=1
            )
            out[owner].append(pts)
        return out

    def landmarks_pose_batch(self, frames: np.ndarray, device_frames=None,
                             pose_pad: float = 0.0):
        """Fused landmarks + per-detection pose in ONE device program
        (``landmarks_pose_from_frames``): returns ``(lm_lists, pose_lists)``
        where ``pose_lists[i][j]`` is the (pitch, yaw, roll) the pose head
        yields for detection ``j`` of frame ``i`` using the V4 tracker's
        crop-box rule (padded landmark bbox).  Requires the HBM-resident
        frame tensor; without it falls back to landmarks only
        (``pose_lists`` is None and the caller uses the two-dispatch path).
        """
        if device_frames is None:
            return self.landmarks_batch(frames), None
        h, w = frames.shape[1:3]
        if (os.environ.get("FVD_TPU_FUSED_DETLM")
                and hasattr(self.face_detector, "params")):
            return self._landmarks_pose_chained(frames, device_frames,
                                                pose_pad, w, h)
        detections = self.face_detector.detect_batch(device_frames)
        owners, boxes = self._collect_detections(detections, w, h)
        out_lm: List[List[np.ndarray]] = [[] for _ in range(len(frames))]
        out_pose: List[List[np.ndarray]] = [[] for _ in range(len(frames))]
        if not boxes:
            return out_lm, out_pose
        boxes_arr, owners_arr, n = _marshal_boxes(boxes, owners)
        coords, poses = jax.device_get(landmarks_pose_from_frames(
            self.landmark_params, self.pose_params, device_frames,
            boxes_arr, owners_arr,
            float(w), float(h), float(pose_pad),
            width=self.width, pose_width=self.pose_width))
        coords = coords[:n]
        poses = poses[:n]
        for (x1, y1, x2, y2), owner, c, p in zip(boxes, owners, coords, poses):
            pts = np.stack(
                [x1 + c[:, 0] * (x2 - x1), y1 + c[:, 1] * (y2 - y1)], axis=1
            )
            out_lm[owner].append(pts)
            out_pose[owner].append(p)
        return out_lm, out_pose

    #: detections per frame the chained det->lm->pose program carries
    #: (static slot count; see detlm_pose_from_frames)
    chained_k_slots = 2

    def _landmarks_pose_chained(self, frames, device_frames, pose_pad, w, h):
        """Opt-in single-fetch path (FVD_TPU_FUSED_DETLM=1): detector,
        slot gate, crops, landmarks and pose all in one chained program —
        no host round trip between the detector and landmark dispatches.
        Caps detections at ``chained_k_slots`` per frame."""
        det = self.face_detector
        K = self.chained_k_slots
        det_boxes, scores, valid, coords, poses = jax.device_get(
            detlm_pose_from_frames(
                det.params, self.landmark_params, self.pose_params,
                device_frames, float(w), float(h),
                float(self.detector_threshold), float(pose_pad),
                det_width=det.width, det_max_out=det.max_out, k_slots=K,
                width=self.width, pose_width=self.pose_width))
        T = len(frames)
        out_lm: List[List[np.ndarray]] = [[] for _ in range(T)]
        out_pose: List[List[np.ndarray]] = [[] for _ in range(T)]
        for i in range(T):
            for k in range(K):
                if not valid[i, k]:
                    continue
                x1, y1, x2, y2 = det_boxes[i, k]
                c = coords[i * K + k]
                pts = np.stack(
                    [x1 + c[:, 0] * (x2 - x1), y1 + c[:, 1] * (y2 - y1)],
                    axis=1)
                out_lm[i].append(pts)
                out_pose[i].append(poses[i * K + k])
        return out_lm, out_pose

    def pose_batch(self, crops: np.ndarray) -> np.ndarray:
        if len(crops) == 0:
            return np.zeros((0, 3))
        from fvd_tpu.parallel.inference import shard_for_inference

        return np.asarray(
            pose_forward(self.pose_params, shard_for_inference(np.asarray(crops)),
                         width=self.pose_width)
        )

    def pose_boxes_batch(self, device_frames, boxes, owners) -> np.ndarray:
        """Pose for ``boxes`` (px) of ``owners`` rows of the device frame
        tensor — crop + forward fused on device."""
        if len(boxes) == 0:
            return np.zeros((0, 3))
        boxes_arr, owners_arr, n = _marshal_boxes(boxes, owners)
        return np.asarray(
            pose_from_frames(self.pose_params, device_frames,
                             boxes_arr, owners_arr, width=self.pose_width)
        )[:n]


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------
def landmark_loss(params, crops, target_coords, width: int = 64):
    """L2 on soft-argmax coordinates (crops float [B,128,128,3] 0..1,
    targets [B, 68, 2] in [0,1])."""
    hm = LandmarkHourglass(width=width).apply(params, crops)
    coords = decode_heatmaps(hm)
    return jnp.mean(jnp.sum((coords - target_coords) ** 2, axis=-1))


def pose_loss(params, crops, target_R, width: int = 32):
    """Geodesic-ish loss: frobenius distance between rotation matrices."""
    d6 = PoseHead(width=width).apply(params, crops)
    R = rotation_6d_to_matrix(d6)
    return jnp.mean(jnp.sum((R - target_R) ** 2, axis=(-1, -2)))


def pose_consistency_loss(params, crops_a, crops_b, target_R,
                          width: int = 32, lam: float = 1.0):
    """Supervised loss on both branches of a same-face/same-rotation pair
    (branch A clean, branch B accessory-perturbed;
    synthetic_pose.pose_batch_paired) plus ``lam`` times the frobenius
    divergence between the two predicted rotations.  Accessories change
    appearance but not geometry, so the A/B divergence IS the
    accessory-induced error the per-factor diagnostic pins — regularizing
    it directly targets pose's binding held-out factor."""
    Ra = rotation_6d_to_matrix(PoseHead(width=width).apply(params, crops_a))
    Rb = rotation_6d_to_matrix(PoseHead(width=width).apply(params, crops_b))
    sup = (jnp.mean(jnp.sum((Ra - target_R) ** 2, axis=(-1, -2))) +
           jnp.mean(jnp.sum((Rb - target_R) ** 2, axis=(-1, -2)))) * 0.5
    cons = jnp.mean(jnp.sum((Ra - Rb) ** 2, axis=(-1, -2)))
    return sup + lam * cons


def make_landmark_train_step(width: int = 64, lr: float = 1e-3):
    import optax

    tx = optax.adam(lr)

    @jax.jit
    def step(params, opt_state, crops, targets):
        loss, grads = jax.value_and_grad(landmark_loss)(params, crops, targets, width=width)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step, tx.init
