"""Batched variable belief update (GBP step 1).

Reference: `VariableNode::update_belief_and_create_factor_responses`
(crates/magics/src/factorgraph/variable.rs:251-342): belief = prior + sum of
inbox messages; covariance via 4x4 inversion guarded by a "precision not
(numerically) zero" check; the mean only moves when the inversion result is
finite. Responses to each connected factor are the cavity messages
belief - incoming_message (empty incoming -> full belief, which equals
belief - 0 under the all-zero empty-message convention).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from magics_tpu.core.linalg import belief_covariance, mv


class BeliefUpdate(NamedTuple):
    eta: jax.Array    # [R, V, 4]
    lam: jax.Array    # [R, V, 4, 4]
    mean: jax.Array   # [R, V, 4]
    valid: jax.Array  # [R, V] — covariance finite this pass


def sum_messages(
    *,
    prior_mean: jax.Array,     # [R, V, 4]
    prior_sigma: jax.Array,    # [R, V]
    dyn_f2v_eta: jax.Array,    # [R, V-1, 2, 4]
    dyn_f2v_lam: jax.Array,    # [R, V-1, 2, 4, 4]
    obs_f2v_eta: jax.Array,    # [R, V-2, 4]
    obs_f2v_lam: jax.Array,    # [R, V-2, 4, 4]
    trk_f2v_eta: jax.Array,    # [R, V-2, 4]
    trk_f2v_lam: jax.Array,    # [R, V-2, 4, 4]
    ext_inbox: jax.Array,      # [R, K, V-1, 4] compact rank-1 (gx, gy, t, s)
) -> tuple[jax.Array, jax.Array]:
    """Aggregate prior + all factor->variable messages per variable."""
    R, V = prior_mean.shape[:2]

    eye = jnp.eye(4, dtype=prior_mean.dtype)
    eta = prior_sigma[..., None] * prior_mean
    lam = prior_sigma[..., None, None] * eye

    def pad_front(x):  # [R, V-1, ...] -> [R, V, ...] aligning to vars 1..V-1
        pad = [(0, 0)] * x.ndim
        pad[1] = (1, 0)
        return jnp.pad(x, pad)

    def pad_back(x):  # [R, V-1, ...] -> [R, V, ...] aligning to vars 0..V-2
        pad = [(0, 0)] * x.ndim
        pad[1] = (0, 1)
        return jnp.pad(x, pad)

    def pad_both(x):  # [R, V-2, ...] -> [R, V, ...] aligning to vars 1..V-2
        pad = [(0, 0)] * x.ndim
        pad[1] = (1, 1)
        return jnp.pad(x, pad)

    # dynamic factor e connects (var e, var e+1); slot 0 -> var e, slot 1 -> var e+1
    eta = eta + pad_back(dyn_f2v_eta[:, :, 0]) + pad_front(dyn_f2v_eta[:, :, 1])
    lam = lam + pad_back(dyn_f2v_lam[:, :, 0]) + pad_front(dyn_f2v_lam[:, :, 1])

    if obs_f2v_eta.shape[1] > 0:
        eta = eta + pad_both(obs_f2v_eta) + pad_both(trk_f2v_eta)
        lam = lam + pad_both(obs_f2v_lam) + pad_both(trk_f2v_lam)

    # external inter-robot factors: slot i covers var i+1; messages arrive in
    # compact rank-1 form and are expanded during the sum
    # (factors.rank1_sum — only the 2x2 position block is nonzero)
    from magics_tpu.graph.factors import rank1_sum

    ext_eta, ext_lam = rank1_sum(ext_inbox, axis=1)
    eta = eta + pad_front(ext_eta)
    lam = lam + pad_front(ext_lam)
    return eta, lam


def update_beliefs(
    eta: jax.Array, lam: jax.Array, old_mean: jax.Array
) -> BeliefUpdate:
    """Invert precision and update means where valid (variable.rs:276-297)."""
    # "precision not zero": any element of the precision matrix > 1e-6
    precision_not_zero = jnp.any(lam > 1e-6, axis=(-2, -1))
    cov, inv_ok = belief_covariance(lam)
    valid = precision_not_zero & inv_ok
    mean = jnp.where(
        valid[..., None], mv(cov, eta), old_mean
    )
    return BeliefUpdate(eta=eta, lam=lam, mean=mean, valid=valid)
