"""Tests for the batched 4x4 inverse and two-block Schur marginalization.

The marginalization cases mirror the reference unit tests in
crates/magics/src/factorgraph/factor/marginalise_factor_distance.rs:129-278.
"""

import numpy as np
import jax.numpy as jnp

from magics_tpu.core.linalg import inv4, inv4_rowscaled, marginalize_two_block


def test_inv4_matches_numpy():
    rng = np.random.default_rng(0)
    m = rng.normal(size=(32, 4, 4))
    m = m @ np.swapaxes(m, -1, -2) + 0.5 * np.eye(4)  # SPD
    inv, det = inv4(jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(inv), np.linalg.inv(m), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(det), np.linalg.det(m), rtol=1e-9)


def test_inv4_rowscaled_handles_huge_priors():
    m = np.eye(4) * 1e30
    inv, det = inv4_rowscaled(jnp.asarray(m, dtype=jnp.float32))
    assert np.all(np.isfinite(np.asarray(inv)))
    np.testing.assert_allclose(np.asarray(inv), np.eye(4) * 1e-30, rtol=1e-6)
    assert float(det) != 0.0


def test_marginalize_two_block_vs_dense():
    """Compare against a dense Schur complement done the reference's way."""
    rng = np.random.default_rng(1)
    J = rng.normal(size=(4, 8))
    lam_f = J.T @ np.diag([2.0, 1.0, 3.0, 0.5]) @ J + 0.1 * np.eye(8)
    eta_f = rng.normal(size=(8,))

    # reference: marg_idx = 0 (message to block a = dims 0..4)
    lam_aa = lam_f[:4, :4]
    lam_ab = lam_f[:4, 4:]
    lam_ba = lam_f[4:, :4]
    lam_bb = lam_f[4:, 4:]
    eta_a, eta_b = eta_f[:4], eta_f[4:]

    expected_eta = eta_a - lam_ab @ np.linalg.inv(lam_bb) @ eta_b
    expected_lam = lam_aa - lam_ab @ np.linalg.inv(lam_bb) @ lam_ba

    got_eta, got_lam, valid = marginalize_two_block(
        jnp.asarray(eta_a), jnp.asarray(eta_b),
        jnp.asarray(lam_aa), jnp.asarray(lam_ab),
        jnp.asarray(lam_ba), jnp.asarray(lam_bb),
    )
    assert bool(valid)
    np.testing.assert_allclose(np.asarray(got_eta), expected_eta, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(got_lam), expected_lam, rtol=1e-9)


def test_marginalize_singular_gives_empty():
    """Singular Lam_bb -> empty (all-zero) message, as the reference returns
    Message::empty() (marginalise_factor_distance.rs:74-81)."""
    eta = jnp.zeros(4)
    lam_bb = jnp.zeros((4, 4))  # singular
    got_eta, got_lam, valid = marginalize_two_block(
        eta, eta, jnp.eye(4), jnp.zeros((4, 4)), jnp.zeros((4, 4)), lam_bb
    )
    assert not bool(valid)
    assert np.all(np.asarray(got_eta) == 0)
    assert np.all(np.asarray(got_lam) == 0)
