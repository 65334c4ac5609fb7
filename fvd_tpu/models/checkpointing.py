"""Training-state checkpointing (orbax).

The reference's only checkpoints are ``lr_weights.json`` and the feature
cache (SURVEY §5).  Model training here gets production-grade checkpoints:
params + optimizer state + step, async-safe, with retention — via orbax
(the standard JAX checkpointing library).  npz export
(fvd_tpu.models.*.save_params) remains the interchange format for
inference providers.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple


def save_train_state(path: str, step: int, params: Any, opt_state: Any) -> None:
    """Write a composite checkpoint at ``path/<step>``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True)
    ) as mgr:
        mgr.save(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(params),
                opt_state=ocp.args.StandardSave(opt_state),
            ),
        )
        mgr.wait_until_finished()


def load_train_state(
    path: str, params_template: Any, opt_state_template: Any
) -> Optional[Tuple[int, Any, Any]]:
    """Restore the latest (step, params, opt_state) or None if absent."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step()
        if step is None:
            return None
        restored = mgr.restore(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(params_template),
                opt_state=ocp.args.StandardRestore(opt_state_template),
            ),
        )
    return step, restored["params"], restored["opt_state"]
