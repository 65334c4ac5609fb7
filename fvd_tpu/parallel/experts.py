"""Expert parallelism (GShard-style top-1 MoE) over an ``expert`` mesh axis.

The fourth sharding mode of the parallel layer (DP/SP in ``pipeline.py``,
TP in ``tensor.py``, PP in ``stages.py``): a mixture-of-experts FFN whose
expert weights live one-expert-per-device and whose tokens are routed with
capacity-bounded dispatch/combine matrices.  The routing math (gate
softmax, top-1 assignment, per-expert queue positions) is tiny and runs
replicated; the expert MLPs — where the weights and FLOPs are — run under
``shard_map`` with everything sharded on the ``expert`` axis, so XLA moves
each expert's token slab to its device (the all-to-all of the GShard
paper, inserted as resharding collectives).

The shipped pipeline has no MoE layer (nothing in the reference does
either); this module is the EP scaling path for the transformer FFN
families, with equality-to-dense verified in tests/test_experts.py.
Overflow tokens beyond an expert's capacity contribute zero (the standard
top-1 drop policy) — callers keep a residual connection so dropped tokens
pass through.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def init_moe_params(key, n_experts: int, d_model: int, d_hidden: int):
    """Gate + stacked expert-MLP weights ([E, ...] leading expert axis)."""
    kg, k1, k2 = jax.random.split(key, 3)
    s1 = 1.0 / math.sqrt(d_model)
    s2 = 1.0 / math.sqrt(d_hidden)
    return {
        "gate": jax.random.normal(kg, (d_model, n_experts)) * s1,
        "w1": jax.random.normal(k1, (n_experts, d_model, d_hidden)) * s1,
        "b1": jnp.zeros((n_experts, d_hidden)),
        "w2": jax.random.normal(k2, (n_experts, d_hidden, d_model)) * s2,
        "b2": jnp.zeros((n_experts, d_model)),
    }


def _routing(x, gate_w, n_experts: int, capacity: int):
    """-> (dispatch [B, E, C] 0/1, combine [B, E, C] gate-weighted).

    Top-1 GShard routing: each token goes to its argmax expert if that
    expert's queue (in token order) has room, else it is dropped (zero
    contribution; the caller's residual carries it through)."""
    logits = x @ gate_w                              # [B, E]
    probs = jax.nn.softmax(logits, axis=-1)
    top = jnp.argmax(probs, axis=-1)                 # [B]
    p_top = jnp.take_along_axis(probs, top[:, None], axis=-1)[:, 0]
    onehot = jax.nn.one_hot(top, n_experts, dtype=x.dtype)          # [B, E]
    pos = jnp.cumsum(onehot, axis=0) - onehot                        # queue slot
    keep = onehot * (pos < capacity)
    slot = jax.nn.one_hot(pos.astype(jnp.int32), capacity, dtype=x.dtype)
    dispatch = keep[:, :, None] * slot                               # [B, E, C]
    combine = dispatch * p_top[:, None, None]
    return dispatch, combine


def moe_forward(mesh: Mesh, params, x, capacity_factor: float = 1.25,
                axis: str = "expert"):
    """Token batch ``x [B, D]`` through the expert-parallel MoE FFN.

    Expert weights and the per-expert token slabs are sharded over
    ``mesh[axis]`` (E must divide by the axis size); returns ``[B, D]``
    replicated. Equal to :func:`moe_forward_dense` up to reduction order.
    """
    n_experts = params["gate"].shape[-1]
    ep = mesh.shape[axis]
    assert n_experts % ep == 0, f"{n_experts} experts not divisible by ep={ep}"
    B = x.shape[0]
    capacity = max(1, int(math.ceil(B / n_experts * capacity_factor)))

    dispatch, combine = _routing(x, params["gate"], n_experts, capacity)
    ex_in = jnp.einsum("bd,bec->ecd", x, dispatch)   # [E, C, D]

    def experts_fn(w1, b1, w2, b2, xin):
        # local slabs: [E/ep, ...]; vmap the MLP over the local experts
        def one(w1i, b1i, w2i, b2i, xi):
            h = jax.nn.gelu(xi @ w1i + b1i)
            return h @ w2i + b2i

        return jax.vmap(one)(w1, b1, w2, b2, xin)

    ex_out = shard_map(
        experts_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )(params["w1"], params["b1"], params["w2"], params["b2"], ex_in)

    return jnp.einsum("ecd,bec->bd", ex_out, combine)


def moe_forward_dense(params, x, capacity_factor: float = 1.25):
    """Single-device reference with identical routing (the equality oracle)."""
    n_experts = params["gate"].shape[-1]
    B = x.shape[0]
    capacity = max(1, int(math.ceil(B / n_experts * capacity_factor)))
    dispatch, combine = _routing(x, params["gate"], n_experts, capacity)
    ex_in = jnp.einsum("bd,bec->ecd", x, dispatch)

    def one(w1i, b1i, w2i, b2i, xi):
        h = jax.nn.gelu(xi @ w1i + b1i)
        return h @ w2i + b2i

    ex_out = jax.vmap(one)(params["w1"], params["b1"], params["w2"],
                           params["b2"], ex_in)
    return jnp.einsum("ecd,bec->bd", ex_out, combine)
