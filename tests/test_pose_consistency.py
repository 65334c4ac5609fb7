"""Pose consistency lever (round-5): same-face/same-rotation pairs and the
prediction-divergence loss that targets the accessories held-out factor."""

import jax
import jax.numpy as jnp
import numpy as np

from fvd_tpu.models import landmarks_fan
from fvd_tpu.models.synthetic_pose import pose_batch_paired


def test_paired_batch_shares_rotation_differs_in_appearance():
    rng = np.random.RandomState(3)
    ca, cb, Rs = pose_batch_paired(rng, 6, photometric=True, shaded=True)
    assert ca.shape == cb.shape == (6, 128, 128, 3)
    assert Rs.shape == (6, 3, 3)
    # valid rotations (orthonormal, det +1)
    for R in Rs:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
        assert np.linalg.det(R) > 0.99
    # branch B really is a perturbation of branch A, not a re-render: the
    # two crops share most pixels but never all of them
    diff = np.abs(ca - cb).mean(axis=(1, 2, 3))
    assert (diff > 0).all()
    assert (diff < 0.5).all()


def test_consistency_loss_penalizes_divergence():
    rng = np.random.RandomState(1)
    ca, cb, Rs = pose_batch_paired(rng, 4)
    params = landmarks_fan.init_pose_params(jax.random.PRNGKey(0), width=8)
    base = landmarks_fan.pose_consistency_loss(
        params, jnp.asarray(ca), jnp.asarray(cb), jnp.asarray(Rs), width=8,
        lam=0.0)
    with_cons = landmarks_fan.pose_consistency_loss(
        params, jnp.asarray(ca), jnp.asarray(cb), jnp.asarray(Rs), width=8,
        lam=1.0)
    # lam=0 reduces to the mean supervised loss over both branches; the
    # divergence term only ever adds
    assert float(with_cons) >= float(base)
    # identical branches -> divergence term is exactly zero
    same = landmarks_fan.pose_consistency_loss(
        params, jnp.asarray(ca), jnp.asarray(ca), jnp.asarray(Rs), width=8,
        lam=1.0)
    sup_only = landmarks_fan.pose_consistency_loss(
        params, jnp.asarray(ca), jnp.asarray(ca), jnp.asarray(Rs), width=8,
        lam=0.0)
    np.testing.assert_allclose(float(same), float(sup_only), rtol=1e-6)
