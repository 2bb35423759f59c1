"""The fused inter-robot Pallas kernel (kernels/ir_slot.py) matches the XLA
message math (graph/factors.interrobot_rank1_messages) bitwise-to-roundoff,
on a state with live neighbour slots, mixed seeding, and skip conditions."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from magics_tpu.graph import factors as F
from magics_tpu.graph import tick as T
from magics_tpu.kernels.ir_slot import interrobot_messages_pallas
from magics_tpu.sim.builder import build_scenario, circle_formation


def _evolved_state(dtype, n=6):
    specs = circle_formation(12, circle_radius=15.0, target_speed=8.0)
    params, state, sdf = build_scenario(
        specs, target_speed=8.0, planning_horizon=1.5, comms_radius=25.0,
        internal=3, external=2, n_slots=4, dtype=dtype, seed=11,
    )
    step = jax.jit(T.step, static_argnums=2)
    for _ in range(n):
        state = step(state, sdf, params)
    assert int(jnp.sum(state.nbr_mask)) > 0, "need live neighbour slots"
    # partially unseed some slots to exercise the empty-cavity guard
    seeded = np.asarray(state.ir_int_seeded).copy()
    seeded[::3, :, ::2] = False
    import dataclasses

    state = dataclasses.replace(state, ir_int_seeded=jnp.asarray(seeded))
    return params, state


def _xla_messages(state, params):
    R, K = state.nbr_idx.shape
    V = state.prior_mean.shape[1]
    V1 = V - 1
    f = state.prior_mean.dtype
    seeded = state.ir_int_seeded
    s3 = seeded[..., None]
    x_int = jnp.where(s3, state.snap_mu[:, None, 1:, :], 0.0)
    cav_eta = jnp.where(s3, state.snap_eta[:, None, 1:, :], 0.0)
    cav_lam = jnp.where(s3[..., None], state.snap_lam[:, None, 1:, :, :], 0.0)
    safety = jnp.broadcast_to(
        (params.safety_distance_multiplier * state.radius)[:, None, None],
        (R, K, V1),
    )
    tiny = jnp.asarray(1e-6, f) * (
        jnp.arange(R, dtype=f)[:, None, None] * (K * V1)
        + jnp.arange(K, dtype=f)[None, :, None] * V1
        + jnp.arange(V1, dtype=f)[None, None, :]
        + 1.0
    )
    return F.interrobot_rank1_messages(
        x_int, state.ir_v2f_ext_pos, cav_eta, cav_lam, safety, tiny,
        params.sigma_factor_interrobot, dtype=f,
    )


def test_ir_kernel_matches_xla_f64():
    params, state = _evolved_state(jnp.float64)
    ref = np.asarray(jax.jit(_xla_messages, static_argnums=1)(state, params))
    got = np.asarray(
        interrobot_messages_pallas(state, params, r_tile=4, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


def test_ir_kernel_matches_xla_f32():
    params, state = _evolved_state(jnp.float32)
    ref = np.asarray(jax.jit(_xla_messages, static_argnums=1)(state, params))
    got = np.asarray(
        interrobot_messages_pallas(state, params, r_tile=4, interpret=True)
    )
    # identical guard decisions; float32 roundoff on the values
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(got == 0.0, ref == 0.0)
