"""Data-parallel sharded inference for batched model forwards.

The reference runs every model on one device (SURVEY §2.3: per-node
``torch.cuda.is_available()`` checks, no distributed layer).  Here any
batched forward whose items are independent — detector frames, landmark /
pose crops, OCR images — can shard its leading batch dimension over the
``data`` axis of a :class:`jax.sharding.Mesh`: under jit, XLA partitions
the convolution backbones across devices and the per-item results come
back with no cross-device math (the items never interact).

Usage: ``set_inference_mesh(make_mesh(n_data=8))`` once; providers place
their batch inputs with :func:`shard_for_inference` and jitted programs
SPMD automatically.  With no mesh configured (or a 1-device mesh) this is
a no-op, so the single-chip path never pays a resharding copy.

The cross-video coalescing buckets (256 / 512 — `providers/coalesce.py`)
are multiples of any power-of-two mesh, so coalesced batches always divide
evenly; uneven ad-hoc batches fall back to replicated placement.
"""

from __future__ import annotations

import threading
from typing import Optional

_lock = threading.Lock()
_inference_mesh = None


def set_inference_mesh(mesh) -> Optional[object]:
    """Install the mesh used for sharded batched inference; returns the
    previous one (``None`` disables)."""
    global _inference_mesh
    with _lock:
        prev = _inference_mesh
        _inference_mesh = mesh
    return prev


def get_inference_mesh():
    return _inference_mesh


def shard_for_inference(x):
    """Place batched array ``x`` (host numpy or device array) with its
    leading dim sharded over the mesh's ``data`` axis.

    Pass host arrays directly — ``device_put`` then shards straight from
    host memory (one transfer), instead of committing to one device first
    and resharding.  No mesh / 1-device mesh / non-divisible batch ->
    returned unchanged (replicated single-device execution, bit-identical
    results; jit accepts numpy operands).
    """
    mesh = _inference_mesh
    if mesh is None or mesh.size <= 1:
        return x
    n = int(x.shape[0])
    n_data = mesh.shape.get("data", 1)
    if n_data <= 1 or n % n_data != 0:
        return x
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    spec = PartitionSpec("data", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))
