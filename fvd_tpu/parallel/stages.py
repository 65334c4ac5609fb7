"""Pipeline parallelism (GPipe-style) over a homogeneous layer stack.

The third sharding mode of the parallel layer (with DP/SP in
``parallel/pipeline.py`` and TP in ``parallel/tensor.py``): each device of
a ``stage`` mesh axis holds ONE layer's weights; microbatches stream
through the ring with a ``ppermute`` activation hand-off per step.  A stack
of S layers over M microbatches completes in ``M + S - 1`` steps (the
classic fill/drain bubble) while only ``1/S`` of the weights live on each
chip — the memory-scaling regime for transformer stacks (e.g. the ASR
encoder's residual blocks, ``models/asr.py``) when a single chip cannot
hold the model.

TPU-idiomatic construction: the schedule is a ``lax.scan`` (one compiled
program, no per-step dispatch), the hand-off is ``lax.ppermute`` on the ICI
ring, and weights are placed via ``shard_map`` specs — XLA sees static
shapes throughout.

No reference analog (the reference is a single-host torch pipeline); this
implements the task's pp obligation over the framework's own layer stacks.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_forward(
    mesh: Mesh,
    layer_apply: Callable,
    stacked_params,
    microbatches: jax.Array,
    axis: str = "stage",
):
    """Run ``microbatches`` through ``S`` layers, one layer per device.

    Args:
      mesh: 1-D mesh whose ``axis`` has S devices.
      layer_apply: ``(params_i, x) -> y`` for ONE layer; every layer must
        share the activation shape (residual-block convention).
      stacked_params: pytree whose leaves are stacked ``[S, ...]`` — leaf
        ``[i]`` is layer i's weights.  Sharded one-layer-per-device.
      microbatches: ``[M, B, D]`` — M microbatches enter stage 0 in order.

    Returns ``[M, B, D]``: the stack's output per microbatch, equal to
    sequentially applying layers 0..S-1 (up to reduction-order epsilon).
    """
    S = mesh.shape[axis]
    M = microbatches.shape[0]
    steps = M + S - 1
    fwd = [(i, (i + 1) % S) for i in range(S)]  # stage i -> i+1 ring

    def stage_fn(params_local, xs):
        # params_local: [1, ...] (this device's layer); xs: [M, B, D]
        # replicated input stream — only stage 0 reads it.
        params_i = jax.tree.map(lambda a: a[0], params_local)
        s = lax.axis_index(axis)
        zero = jnp.zeros_like(xs[0])

        def step(carry, t):
            act = carry
            # stage 0 ingests microbatch t (a clamped gather keeps the
            # shape static; the mask kills out-of-range fill/drain slots)
            mb = lax.dynamic_index_in_dim(xs, jnp.clip(t, 0, M - 1),
                                          keepdims=False)
            x_in = jnp.where(s == 0, mb, act)
            y = layer_apply(params_i, x_in)
            # the LAST stage's result at step t is microbatch t-(S-1),
            # recorded before the hand-off
            out_idx = t - (S - 1)
            emit = jnp.where(
                jnp.logical_and(s == S - 1,
                                jnp.logical_and(out_idx >= 0, out_idx < M)),
                1.0, 0.0).astype(y.dtype)
            # hand off along the ring for the next step
            act_next = lax.ppermute(y, axis, fwd)
            return act_next, (y * emit, out_idx)

        _, (ys, idxs) = lax.scan(step, zero, jnp.arange(steps))
        # scatter the last stage's emissions into microbatch order; other
        # stages contributed zeros, the cross-stage psum collects stage S-1
        out = jnp.zeros_like(xs)
        out = out.at[jnp.clip(idxs, 0, M - 1)].add(ys)
        return lax.psum(out, axis)

    fn = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(stacked_params, microbatches)


def stack_layer_params(params_list):
    """[params_0, ..., params_{S-1}] (same treedef) -> stacked pytree with
    leading layer axis, the placement format :func:`pipeline_forward`
    shards one-layer-per-device."""
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *params_list)


def asr_encoder_pp(model_params, mel, mesh, dim: int = 192, depth: int = 4,
                   heads: int = 0, microbatches: int | None = None,
                   axis: str = "stage"):
    """The ASR encoder (``models/asr.py AsrEncoder``) with its transformer
    block stack pipeline-parallel over ``mesh[axis]``.

    The conv subsampling frontend, positions and final LayerNorm are cheap
    and run replicated; the ``depth`` MHABlocks — where the weights and
    FLOPs live — run one-block-per-device via :func:`pipeline_forward`.
    Output equals ``AsrEncoder.apply`` (tests/test_pipeline_stages.py).

    ``mel``: [B, T, 80]; the batch is split into ``microbatches`` groups
    (default: the stage count) to fill the pipeline.
    """
    import flax.linen as nn

    from fvd_tpu.models.transformer import MHABlock, sincos_positions

    enc = model_params["params"]["encoder"]
    heads = heads or max(1, dim // 32)
    S = mesh.shape[axis]
    assert depth == S, f"one block per stage: depth={depth} vs stage={S}"

    x = nn.Conv(dim, (3,), padding="SAME").apply({"params": enc["Conv_0"]}, mel)
    x = nn.gelu(x)
    x = nn.Conv(dim, (3,), strides=(2,), padding="SAME").apply(
        {"params": enc["Conv_1"]}, x)
    x = nn.gelu(x)
    x = x + jnp.asarray(sincos_positions(x.shape[1], dim))

    M = microbatches or S
    B = x.shape[0]
    assert B % M == 0, f"batch {B} not divisible into {M} microbatches"
    xs = x.reshape(M, B // M, *x.shape[1:])

    block = MHABlock(dim, heads)
    stacked = stack_layer_params([enc[f"MHABlock_{i}"] for i in range(depth)])
    ys = pipeline_forward(
        mesh, lambda p, a: block.apply({"params": p}, a), stacked, xs,
        axis=axis)
    y = ys.reshape(B, *ys.shape[2:])
    return nn.LayerNorm().apply({"params": enc["LayerNorm_0"]}, y)
