"""Pipeline-parallel (GPipe) layer-stack forward: parallel/stages.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fvd_tpu.parallel.stages import pipeline_forward, stack_layer_params


def _mlp_layer(params, x):
    w, b = params
    return x + jnp.tanh(x @ w + b)  # residual keeps activation shape


def _init_layers(rng, s, d):
    layers = []
    for _ in range(s):
        layers.append((jnp.asarray(rng.randn(d, d) * 0.3, jnp.float32),
                       jnp.asarray(rng.randn(d) * 0.1, jnp.float32)))
    return layers


@pytest.mark.parametrize("s,m", [(4, 6), (8, 3), (2, 1)])
def test_pipeline_forward_matches_sequential(s, m):
    if len(jax.devices()) < s:
        pytest.skip(f"needs {s} devices")
    rng = np.random.RandomState(0)
    d, b = 16, 4
    layers = _init_layers(rng, s, d)
    xs = jnp.asarray(rng.randn(m, b, d), jnp.float32)

    ref = xs
    for p in layers:
        ref = jax.vmap(lambda x, p=p: _mlp_layer(p, x))(ref)

    mesh = Mesh(np.array(jax.devices()[:s]), ("stage",))
    out = pipeline_forward(mesh, _mlp_layer, stack_layer_params(layers), xs)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_grad_matches_sequential():
    """jax.grad flows through the stage ring (ppermute transposes to the
    reverse permute), so the pp stack trains — gradients equal the
    sequential stack's."""
    s, m, d, b = 4, 6, 4, 8
    if len(jax.devices()) < s:
        pytest.skip(f"needs {s} devices")
    rng = np.random.RandomState(2)
    layers = _init_layers(rng, s, d)
    stacked = stack_layer_params(layers)
    xs = jnp.asarray(rng.randn(m, b, d), jnp.float32)
    tgt = jnp.asarray(rng.randn(m, b, d), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:s]), ("stage",))

    def loss_pp(p):
        return jnp.mean((pipeline_forward(mesh, _mlp_layer, p, xs) - tgt) ** 2)

    def loss_seq(ls):
        y = xs
        for p in ls:
            y = jax.vmap(lambda x, p=p: _mlp_layer(p, x))(y)
        return jnp.mean((y - tgt) ** 2)

    g_pp = jax.grad(loss_pp)(stacked)
    g_seq = stack_layer_params(jax.grad(loss_seq)(layers))
    for a, c in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-5)


def test_asr_encoder_pp_matches_replicated():
    """The real-model pp path: the ASR encoder's MHABlock stack one-block-
    per-device equals the plain replicated encoder forward."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from fvd_tpu.models.asr import N_MELS, AsrModel
    from fvd_tpu.parallel.stages import asr_encoder_pp

    dim, depth, b, t = 64, 4, 4, 32
    model = AsrModel(dim=dim, depth=depth)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, t, N_MELS), jnp.float32),
                        jnp.zeros((1, 8), jnp.int32))
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(b, t, N_MELS), jnp.float32)

    ref = model.apply(params, mel, method=AsrModel.encode)
    mesh = Mesh(np.array(jax.devices()[:depth]), ("stage",))
    out = asr_encoder_pp(params, mel, mesh, dim=dim, depth=depth)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_forward_is_jittable():
    s, m, d, b = 4, 5, 8, 2
    if len(jax.devices()) < s:
        pytest.skip(f"needs {s} devices")
    rng = np.random.RandomState(1)
    layers = _init_layers(rng, s, d)
    stacked = stack_layer_params(layers)
    xs = jnp.asarray(rng.randn(m, b, d), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:s]), ("stage",))

    fn = jax.jit(lambda p, x: pipeline_forward(mesh, _mlp_layer, p, x))
    out1 = fn(stacked, xs)
    out2 = pipeline_forward(mesh, _mlp_layer, stacked, xs)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-6, atol=1e-6)
