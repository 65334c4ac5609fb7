"""Orbax train-state checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fvd_tpu.models import checkpointing


def test_save_load_roundtrip(tmp_path):
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.asarray(1.5)}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    # take one step so opt_state is non-trivial
    grads = jax.tree.map(jnp.ones_like, params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)

    ckpt = str(tmp_path / "ckpt")
    checkpointing.save_train_state(ckpt, step=7, params=params, opt_state=opt_state)

    restored = checkpointing.load_train_state(ckpt, params, opt_state)
    assert restored is not None
    step, r_params, r_opt = restored
    assert step == 7
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(r_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(r_opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_missing_returns_none(tmp_path):
    assert checkpointing.load_train_state(str(tmp_path / "nope"), {}, {}) is None


def test_retention_keeps_latest(tmp_path):
    params = {"w": jnp.zeros(3)}
    opt = {"m": jnp.zeros(3)}
    ckpt = str(tmp_path / "ckpt")
    for step in range(5):
        checkpointing.save_train_state(
            ckpt, step=step,
            params={"w": jnp.full(3, float(step))}, opt_state=opt,
        )
    restored = checkpointing.load_train_state(ckpt, params, opt)
    step, r_params, _ = restored
    assert step == 4
    np.testing.assert_array_equal(np.asarray(r_params["w"]), np.full(3, 4.0))
