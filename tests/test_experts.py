"""Expert-parallel MoE (parallel/experts.py): sharded == dense, trains."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fvd_tpu.parallel.experts import (init_moe_params, moe_forward,
                                      moe_forward_dense)


def _mesh(ep):
    if len(jax.devices()) < ep:
        pytest.skip(f"needs {ep} devices")
    return Mesh(np.array(jax.devices()[:ep]), ("expert",))


@pytest.mark.parametrize("ep,e,b,d", [(4, 4, 32, 16), (8, 8, 16, 8), (2, 4, 24, 8)])
def test_moe_sharded_matches_dense(ep, e, b, d):
    mesh = _mesh(ep)
    params = init_moe_params(jax.random.PRNGKey(0), e, d, 4 * d)
    x = jnp.asarray(np.random.RandomState(0).randn(b, d), jnp.float32)
    ref = moe_forward_dense(params, x)
    out = moe_forward(mesh, params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_moe_capacity_drops_overflow():
    """With capacity_factor tiny, later tokens routed to a full expert
    contribute zero (the caller's residual carries them)."""
    mesh = _mesh(2)
    e, b, d = 2, 16, 8
    params = init_moe_params(jax.random.PRNGKey(1), e, d, 16)
    # identical tokens all route to one expert; capacity 1 keeps only the first
    x = jnp.ones((b, d), jnp.float32)
    out = moe_forward(mesh, params, x, capacity_factor=1.0 / 8)
    rows = np.asarray(out)
    nonzero = np.abs(rows).sum(axis=-1) > 1e-9
    assert nonzero.sum() <= max(1, int(np.ceil(b / e / 8)))


def test_moe_grads_flow_sharded():
    mesh = _mesh(4)
    e, b, d = 4, 32, 8
    params = init_moe_params(jax.random.PRNGKey(2), e, d, 16)
    x = jnp.asarray(np.random.RandomState(1).randn(b, d), jnp.float32)
    tgt = jnp.asarray(np.random.RandomState(2).randn(b, d), jnp.float32)

    def loss_sh(p):
        return jnp.mean((moe_forward(mesh, p, x) - tgt) ** 2)

    def loss_dn(p):
        return jnp.mean((moe_forward_dense(p, x) - tgt) ** 2)

    g_sh = jax.grad(loss_sh)(params)
    g_dn = jax.grad(loss_dn)(params)
    for a, c in zip(jax.tree.leaves(g_sh), jax.tree.leaves(g_dn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)
