"""Cross-video coalesced OneEuro smoothing dispatches (V3 / V4 / streaming).

The per-chunk smoothing scans (``ops/filters.py one_euro_scan_chunk`` /
``v4_smooth_chunk``) are tiny device programs — a handful of KB in, out —
but behind a degraded tunnel each per-video dispatch+fetch round trip costs
a full RTT, and V3+V4 together issue two per chunk per video.  These
wrappers funnel them through the cross-video program coalescer
(``providers/coalesce.py run_program``): concurrent videos' smoothing
chunks run as ONE vmapped dispatch with ONE result fetch.

Chunks pad to a power-of-two time bucket with ``valid=False`` rows — the
scan's invalid-row semantics keep the carry unchanged and emit NaN, so the
padded rows are sliced off and the carry handed to the next chunk is
identical to the unpadded scan's.  vmap of the scan is elementwise (no
cross-row reductions), so the batched outputs match the single-video
dispatch to float32 ulp (~1e-7; XLA fuses the vmapped program slightly
differently — tested at 1e-5).

When the program coalescer is inactive (single-video CLI runs, tests) the
wrappers call the plain jitted scans — same code path as before.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from fvd_tpu.models.landmarks_fan import _pad_bucket as _bucket
from fvd_tpu.ops.filters import one_euro_scan_chunk, v4_smooth_chunk


# compiled vmapped programs, one per static-parameter set
_batch_fns: Dict[Tuple, Any] = {}


def _v4_batch_fn(statics: Tuple[float, float, float, float]):
    key = ("v4",) + statics
    if key not in _batch_fns:
        lm_mc, lm_b, p_mc, p_b = statics
        inner = partial(v4_smooth_chunk.__wrapped__, lm_min_cutoff=lm_mc,
                        lm_beta=lm_b, pose_min_cutoff=p_mc, pose_beta=p_b)
        _batch_fns[key] = jax.jit(jax.vmap(inner))
    return _batch_fns[key]


def _oe_batch_fn(statics: Tuple[float, float, float]):
    key = ("oe",) + statics
    if key not in _batch_fns:
        mc, beta, dc = statics
        inner = partial(one_euro_scan_chunk.__wrapped__, min_cutoff=mc,
                        beta=beta, d_cutoff=dc)
        _batch_fns[key] = jax.jit(jax.vmap(inner))
    return _batch_fns[key]


def _stack_payloads(payloads: List[Tuple]) -> List[Any]:
    """Stack column-wise: each payload is a tuple of pytrees (carries are
    tuples of scalars/arrays, signals are plain arrays)."""
    cols = list(zip(*payloads))
    return [jax.tree.map(lambda *leaves: jnp.asarray(np.stack(leaves)), *col)
            for col in cols]


def _split_rows(out_tree, n: int) -> List[Any]:
    out_np = jax.device_get(out_tree)  # ONE fetch for the whole group
    return [jax.tree.map(lambda x: x[i], out_np) for i in range(n)]


def _pad_tail(arr: np.ndarray, pad: int) -> np.ndarray:
    if pad == 0:
        return np.asarray(arr)
    widths = [(0, pad)] + [(0, 0)] * (np.ndim(arr) - 1)
    return np.pad(np.asarray(arr), widths)


def _carry_np(carry):
    return jax.tree.map(np.asarray, carry)


def one_euro_scan_chunk_co(carry, times, values, valid, *,
                           min_cutoff: float = 1.0, beta: float = 0.0,
                           d_cutoff: float = 1.0):
    """Coalesced drop-in for :func:`one_euro_scan_chunk` (V3's per-chunk
    landmark smoothing)."""
    from fvd_tpu.providers.coalesce import (program_coalescing_active,
                                            run_program)

    if not program_coalescing_active():
        return one_euro_scan_chunk(carry, times, values, valid,
                                   min_cutoff=min_cutoff, beta=beta,
                                   d_cutoff=d_cutoff)
    T = int(len(times))
    Tb = _bucket(T)
    pad = Tb - T
    statics = (float(min_cutoff), float(beta), float(d_cutoff))
    payload = (_carry_np(carry), _pad_tail(times, pad),
               _pad_tail(values, pad),
               _pad_tail(np.asarray(valid, bool), pad))
    value_shape = tuple(np.shape(values)[1:])

    def _run_batch(payloads):
        args = _stack_payloads(payloads)
        out = _oe_batch_fn(statics)(*args)
        return _split_rows(out, len(payloads))

    sm, new_carry = run_program(
        "oe_smooth", (Tb, value_shape) + statics, payload, _run_batch)
    return sm[:T], new_carry


def v4_smooth_chunk_co(lm_carry, pose_carry, times, lm_track, lm_valid,
                       pose_track, pose_valid, *,
                       lm_min_cutoff: float = 0.5, lm_beta: float = 0.1,
                       pose_min_cutoff: float = 0.1, pose_beta: float = 0.1):
    """Coalesced drop-in for :func:`v4_smooth_chunk` (V4's fused landmark
    OneEuro + EAR + pose OneEuro chunk)."""
    from fvd_tpu.providers.coalesce import (program_coalescing_active,
                                            run_program)

    if not program_coalescing_active():
        return v4_smooth_chunk(lm_carry, pose_carry, times, lm_track,
                               lm_valid, pose_track, pose_valid,
                               lm_min_cutoff=lm_min_cutoff, lm_beta=lm_beta,
                               pose_min_cutoff=pose_min_cutoff,
                               pose_beta=pose_beta)
    T = int(len(times))
    Tb = _bucket(T)
    pad = Tb - T
    statics = (float(lm_min_cutoff), float(lm_beta),
               float(pose_min_cutoff), float(pose_beta))
    payload = (_carry_np(lm_carry), _carry_np(pose_carry),
               _pad_tail(times, pad), _pad_tail(lm_track, pad),
               _pad_tail(np.asarray(lm_valid, bool), pad),
               _pad_tail(pose_track, pad),
               _pad_tail(np.asarray(pose_valid, bool), pad))
    lm_shape = tuple(np.shape(lm_track)[1:])

    def _run_batch(payloads):
        args = _stack_payloads(payloads)
        out = _v4_batch_fn(statics)(*args)
        return _split_rows(out, len(payloads))

    sm_lm, ears, sm_pose, new_lm_carry, new_pose_carry = run_program(
        "v4_smooth", (Tb, lm_shape) + statics, payload, _run_batch)
    return (sm_lm[:T], ears[:T], sm_pose[:T], new_lm_carry, new_pose_carry)
