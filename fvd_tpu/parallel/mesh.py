"""Device mesh construction.

The reference has no distributed layer (SURVEY §2.3: single process, one
optional CUDA GPU).  The TPU framework scales with a 2-D
``jax.sharding.Mesh``:

* ``data``  — videos / frame batches (DP; the batch harness's per-video loop
  becomes a sharded batch);
* ``time``  — the sample axis of per-video signal tracks (SP; used by the
  lip-sync kernel with halo exchange — the only op with temporal overlap,
  SURVEY §2.3).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_data: Optional[int] = None,
    n_time: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    data_axis: str = "data",
    time_axis: str = "time",
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    total = len(devices)
    if n_data is None:
        if total % n_time != 0:
            raise ValueError(f"{total} devices not divisible by time={n_time}")
        n_data = total // n_time
    need = n_data * n_time
    if need > total:
        raise ValueError(f"mesh {n_data}x{n_time} needs {need} devices, have {total}")
    grid = np.array(devices[:need]).reshape(n_data, n_time)
    return Mesh(grid, (data_axis, time_axis))
