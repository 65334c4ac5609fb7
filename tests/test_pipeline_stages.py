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
