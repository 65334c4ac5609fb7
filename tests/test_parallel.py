"""Sharded-kernel tests on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fvd_tpu.ops import lipsync
from fvd_tpu.parallel.mesh import make_mesh
from fvd_tpu.parallel import pipeline as pp


def _signals(n=1800, fps=30.0, seed=0):
    rng = np.random.RandomState(seed)
    t = np.linspace(0, n / fps, n)
    mouth = np.clip(0.5 * (1 + np.sin(2 * np.pi * 2 * t)) + 0.1 * rng.rand(n), 0, 1)
    return mouth.astype(np.float32), np.roll(mouth, 3).astype(np.float32)


def test_make_mesh_shapes():
    mesh = make_mesh(n_data=4, n_time=2)
    assert mesh.shape == {"data": 4, "time": 2}
    mesh = make_mesh(n_time=8)
    assert mesh.shape == {"data": 1, "time": 8}
    with pytest.raises(ValueError):
        make_mesh(n_data=16, n_time=1)


@pytest.mark.parametrize("n_time", [2, 4, 8])
def test_time_sharded_lipsync_matches_single_device(n_time):
    mouth, audio = _signals()
    mesh = make_mesh(n_data=1, n_time=n_time)
    fn = pp.make_time_sharded_lipsync(mesh, len(mouth), 30.0)
    sp = float(fn(jnp.asarray(mouth), jnp.asarray(audio)))
    ref = float(lipsync.lip_sync_score_xla(jnp.asarray(mouth), jnp.asarray(audio), 30.0).score)
    assert sp == pytest.approx(ref, abs=2e-5)


def test_time_sharded_lipsync_silence_is_zero():
    mesh = make_mesh(n_data=1, n_time=4)
    mouth, _ = _signals()
    fn = pp.make_time_sharded_lipsync(mesh, len(mouth), 30.0)
    assert float(fn(jnp.asarray(mouth), jnp.zeros(len(mouth), jnp.float32))) == 0.0


def test_time_sharding_constraints_validated():
    mesh = make_mesh(n_data=1, n_time=8)
    with pytest.raises(ValueError):
        pp.make_time_sharded_lipsync(mesh, 1801, 30.0)  # not divisible
    with pytest.raises(ValueError):
        pp.make_time_sharded_lipsync(mesh, 800, 30.0)   # chunk < window+lag


def test_dp_lr_train_step_matches_single_device():
    rng = np.random.RandomState(0)
    feats = rng.rand(16, 9).astype(np.float32)
    labels = (rng.rand(16) > 0.5).astype(np.float32)
    w0 = rng.randn(9).astype(np.float32) * 0.1
    b0 = np.float32(0.2)

    mesh = make_mesh(n_data=8, n_time=1)
    step = pp.make_dp_lr_train_step(mesh, lr=0.005)
    w, b, probs, loss = step(jnp.asarray(feats), jnp.asarray(labels),
                             jnp.asarray(w0), jnp.asarray(b0))

    p = 1 / (1 + np.exp(-(feats @ w0 + b0)))
    gw = feats.T @ (p - labels) / 16
    gb = (p - labels).mean()
    np.testing.assert_allclose(np.asarray(w), w0 - 0.005 * gw, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b), b0 - 0.005 * gb, atol=1e-6)
    np.testing.assert_allclose(np.asarray(probs), p, atol=1e-6)
    assert np.isfinite(float(loss))


def test_multichip_train_step_runs_and_learns():
    mesh = make_mesh(n_data=4, n_time=2)
    fps = 10.0
    chunk = 75
    n = chunk * 2
    batch = 8
    rng = np.random.RandomState(0)
    t = np.linspace(0, n / fps, n)
    base = (0.5 * (1 + np.sin(2 * np.pi * 1.0 * t))).astype(np.float32)
    mouth = np.stack([np.roll(base, 3 * i) for i in range(batch)])
    audio = np.stack([np.roll(base, 3 * i + 1) for i in range(batch)])
    other = rng.rand(batch, 8).astype(np.float32)
    labels = (rng.rand(batch) > 0.5).astype(np.float32)

    step = pp.make_multichip_train_step(mesh, batch, n, fps)
    w = jnp.zeros(9, jnp.float32)
    b = jnp.asarray(0.0, jnp.float32)
    losses = []
    for _ in range(5):
        w, b, probs, loss = step(
            jnp.asarray(mouth), jnp.asarray(audio), jnp.asarray(other),
            jnp.asarray(labels), w, b,
        )
        losses.append(float(loss))
    assert probs.shape == (batch,)
    assert losses[-1] < losses[0]  # gradient steps reduce BCE


def test_graft_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    prob, lip = [float(x) for x in out]
    assert 0.0 <= prob <= 1.0
    g.dryrun_multichip(8)


# ---------------------------------------------------------------------------
# Data-parallel sharded inference (parallel/inference.py)
# ---------------------------------------------------------------------------
def test_sharded_detector_matches_single_device():
    """SSD forward with the batch dim sharded over the 8-device mesh must
    produce the single-device results (items are independent)."""
    from fvd_tpu.models.face_ssd import SSDFaceDetector
    from fvd_tpu.parallel.inference import set_inference_mesh

    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (16, 48, 64, 3)).astype(np.uint8)
    det = SSDFaceDetector(width=8)

    base = det.detect_batch(frames)
    prev = set_inference_mesh(make_mesh(n_data=8, n_time=1))
    try:
        sharded = det.detect_batch(frames)
    finally:
        set_inference_mesh(prev)

    assert len(base) == len(sharded) == 16
    for b_dets, s_dets in zip(base, sharded):
        assert len(b_dets) == len(s_dets)
        for b, s in zip(b_dets, s_dets):
            np.testing.assert_allclose(
                [b.x1, b.y1, b.x2, b.y2, b.confidence],
                [s.x1, s.y1, s.x2, s.y2, s.confidence],
                rtol=1e-5, atol=1e-4,
            )


def test_shard_for_inference_falls_back_when_indivisible():
    from fvd_tpu.parallel.inference import (
        set_inference_mesh,
        shard_for_inference,
    )

    x = jnp.ones((6, 4))  # 6 % 8 != 0
    prev = set_inference_mesh(make_mesh(n_data=8, n_time=1))
    try:
        out = shard_for_inference(x)
        assert out is x  # replicated fallback, no resharding
        y = jnp.ones((16, 4))
        sharded = shard_for_inference(y)
        assert sharded.sharding.is_fully_replicated is False
    finally:
        set_inference_mesh(prev)


def test_shard_for_inference_noop_without_mesh():
    from fvd_tpu.parallel.inference import get_inference_mesh, shard_for_inference

    assert get_inference_mesh() is None
    x = jnp.ones((8, 4))
    assert shard_for_inference(x) is x


# ---------------------------------------------------------------------------
# Tensor parallelism (optional path; SURVEY §2.3 "optional pjit sharding")
# ---------------------------------------------------------------------------
def test_tensor_parallel_text_tower_matches_replicated():
    """Megatron-style TP param shardings: same outputs as the replicated
    forward up to reduction order, with heads/MLP genuinely sharded."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from fvd_tpu.models.encoders import TextTower
    from fvd_tpu.models.transformer import ByteTokenizer
    from fvd_tpu.parallel.tensor import (
        shard_params_tp,
        tp_shardings,
        validate_tp_divisibility,
    )

    model = TextTower(dim=64, depth=2, out_dim=32)  # heads=2, mlp=256
    tok = ByteTokenizer()
    ids = np.stack([tok.encode(t, 32) for t in
                    ["the river rose", "taxes will fall", "a face appears",
                     "nothing happened today"]])
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32), jnp.int32))
    ref = np.asarray(jax.jit(model.apply)(params, ids))

    validate_tp_divisibility(heads=2, mlp_hidden=256, tp=2)
    mesh = Mesh(np.array(jax.devices()[:2]), ("model",))
    shardings = tp_shardings(params, mesh)
    specs = [s.spec for s in jax.tree_util.tree_leaves(shardings)]
    n_sharded = sum(1 for s in specs if any(a is not None for a in s))
    # q/k/v/out kernels + q/k/v biases + 2 MLP kernels + 1 MLP bias per block
    assert n_sharded == 2 * 10, n_sharded

    p_tp = shard_params_tp(params, mesh)
    out_sharding = NamedSharding(mesh, P())
    tp_out = np.asarray(
        jax.jit(model.apply, out_shardings=out_sharding)(p_tp, ids))
    np.testing.assert_allclose(tp_out, ref, rtol=1e-5, atol=1e-5)


def test_tensor_parallel_divisibility_guard():
    from fvd_tpu.parallel.tensor import validate_tp_divisibility

    with pytest.raises(ValueError):
        validate_tp_divisibility(heads=6, mlp_hidden=768, tp=4)
