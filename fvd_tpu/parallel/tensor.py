"""Tensor-parallel (TP) sharding for the transformer models.

The reference has no TP (SURVEY §2.3: "not needed at these model sizes;
optional pjit sharding of CNN channels").  This module provides the
optional path the TPU-native way: Megatron-style weight shardings
expressed as `NamedSharding` annotations on the flax param tree, with
GSPMD inserting the collectives — no hand-written all-reduces.

Per transformer block over mesh axis ``model``:

* attention q/k/v kernels ``[D, heads, head_dim]`` shard the *heads* axis;
  the out-projection kernel ``[heads, head_dim, D]`` shards heads on its
  input side, so each device attends with its local heads and the output
  projection's contraction produces the psum (GSPMD inserts exactly one
  all-reduce here, the Megatron pattern);
* MLP up-projection ``[D, 4D]`` shards the hidden axis, down-projection
  ``[4D, D]`` contracts it — again one all-reduce per block;
* embeddings, layer norms, biases of row-sharded layers and all other
  leaves stay replicated.

Activations stay replicated throughout, so a TP forward is bit-compatible
in shape with the single-device forward and numerically equal up to
reduction order.  Works on any model built from
:class:`fvd_tpu.models.transformer.MHABlock` (TextTower, ClipModel text
tower, AsrEncoder/AsrDecoder).

Requires ``heads % tp == 0`` and ``mlp_hidden % tp == 0`` (dim 192 models
have 6 heads / 768 hidden -> tp in {2, 3, 6}).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def _leaf_spec(path: tuple, leaf, model_axis: str) -> P:
    """PartitionSpec for one flax param leaf, keyed on its tree path."""
    keys = [getattr(k, "key", str(k)) for k in path]
    joined = "/".join(str(k) for k in keys)
    name = keys[-1] if keys else ""
    ndim = getattr(leaf, "ndim", 0)

    if "MultiHeadDotProductAttention" in joined:
        proj = keys[-2] if len(keys) >= 2 else ""
        if proj in ("query", "key", "value"):
            if name == "kernel" and ndim == 3:   # [D, heads, head_dim]
                return P(None, model_axis, None)
            if name == "bias" and ndim == 2:     # [heads, head_dim]
                return P(model_axis, None)
        if proj == "out":
            if name == "kernel" and ndim == 3:   # [heads, head_dim, D]
                return P(model_axis, None, None)
            return P()                            # out bias: replicated
    # MHABlock MLP: Dense_0 is the up-projection, Dense_1 the down-projection
    if "MHABlock" in joined and "Dense_0" in keys:
        if name == "kernel" and ndim == 2:       # [D, mlp_hidden]
            return P(None, model_axis)
        if name == "bias" and ndim == 1:         # [mlp_hidden]
            return P(model_axis)
    if "MHABlock" in joined and "Dense_1" in keys:
        if name == "kernel" and ndim == 2:       # [mlp_hidden, D]
            return P(model_axis, None)
        return P()                                # down bias: replicated
    return P()                                    # embeds, norms, heads, etc.


def tp_shardings(params: Any, mesh, model_axis: str = "model"):
    """NamedSharding tree mirroring ``params`` with Megatron TP specs."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _leaf_spec(path, leaf, model_axis)),
        params,
    )


def shard_params_tp(params: Any, mesh, model_axis: str = "model"):
    """Place ``params`` on ``mesh`` with TP shardings (one transfer per
    leaf; replicated leaves are broadcast).  The returned tree drops into
    any jitted apply — GSPMD partitions the forward around the sharded
    weights and inserts the per-block all-reduces."""
    return jax.device_put(params, tp_shardings(params, mesh, model_axis))


def validate_tp_divisibility(heads: int, mlp_hidden: int, tp: int) -> None:
    if heads % tp or mlp_hidden % tp:
        raise ValueError(
            f"tensor-parallel degree {tp} must divide heads={heads} "
            f"and mlp_hidden={mlp_hidden}")
