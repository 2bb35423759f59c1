"""Fused Pallas slot kernel (kernels/gbp_slot.py) vs the XLA reference path.

Runs the kernel in interpreter mode on the CPU backend. Within a single slot
the two implementations must agree to float32 roundoff; across many ticks
they stay qualitatively equivalent (knife-edge empty-message/validity
thresholds can land differently for last-bit-different inputs — the same
bounded chaos documented in tests/test_parity.py).
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from magics_tpu.core.constants import TRACKING_SKIP_FIRST_N_FACTOR_ITERS
from magics_tpu.graph import factors as F
from magics_tpu.graph import tick as T
from magics_tpu.kernels import hot as HOT
from magics_tpu.kernels.gbp_slot import SlotParams, internal_slot
from magics_tpu.sim.builder import build_scenario, circle_formation


def _scenario(n_robots=6, internal=6, external=3):
    specs = circle_formation(n_robots, circle_radius=25.0, target_speed=10.0)
    return build_scenario(
        specs, target_speed=10.0, planning_horizon=3.0, hz=10.0,
        comms_radius=60.0, internal=internal, external=external, n_slots=4,
        world=(100.0, 100.0), dtype=jnp.float32,
    )


def _pre_gbp(state, params):
    state = T.activate_due_spawns(state)
    state = T.check_waypoints(state, params)
    state = T.update_connectivity(state, params)
    state = T.update_prior_horizon(state, params)
    state = T.update_prior_current(state, params)
    return state


@pytest.mark.slow
def test_single_slot_matches_xla():
    params, state, sdf = _scenario()
    st = _pre_gbp(state, params)

    with jax.default_matmul_precision("highest"):
        sx = T.internal_factor_pass(st, sdf, params)
        sx = T.internal_variable_pass(sx, params)

        r_tile = 8
        f = jnp.float32
        world = (params.world_width, params.world_height)
        hot = HOT.to_hot(st, params, r_tile)
        rp = hot["belief_eta"].shape[-1]
        gate_r = st.active & (st.mission_active | st.completed)
        tgate_r = gate_r & (st.iter_count_factor >= TRACKING_SKIP_FIRST_N_FACTOR_ITERS)
        mu_n = jnp.moveaxis(hot["obs_v2f_mu"], 0, -1)
        h0, hx, hy = F.obstacle_taps(mu_n, sdf, world, dtype=f)
        ext_sum = HOT._ext_sum_hot(st, rp)
        sp = SlotParams(
            n_vars=params.n_vars, max_waypoints=params.max_waypoints,
            sigma_dynamics=params.sigma_factor_dynamics,
            sigma_obstacle=params.sigma_factor_obstacle,
            sigma_tracking=params.sigma_factor_tracking,
            obstacle_delta=F.obstacle_delta(params.sdf_shape, world),
            switch_padding=params.tracking_switch_padding,
            attraction_distance=params.tracking_attraction_distance,
            rtol=1e-4,
        )
        outs = internal_slot(
            {
                **hot,
                "gate": HOT._pad_r(gate_r.astype(f)[None, :], rp),
                "tgate": HOT._pad_r(tgate_r.astype(f)[None, :], rp),
                "obs_h0": h0, "obs_hx": hx, "obs_hy": hy,
                "ext_sum_eta": ext_sum[0], "ext_sum_lam": ext_sum[1],
            },
            sp, r_tile=r_tile, interpret=True,
        )
    merged = HOT.merge_state(
        st, {**hot, **outs}, st.iter_count_factor + gate_r.astype(jnp.int32)
    )

    for field, rtol in [
        ("belief_mean", 1e-2),
        ("dyn_f2v_eta", 1e-3),
        ("dyn_f2v_lam", 1e-3),
        ("obs_f2v_eta", 1e-3),
        ("trk_f2v_eta", 1e-3),
        ("obs_v2f_mu", 1e-2),
        ("trk_record", 0),
    ]:
        a = np.asarray(getattr(sx, field)).astype(np.float64)
        b = np.asarray(getattr(merged, field)).astype(np.float64)
        scale = max(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() <= max(rtol, 1e-6) * scale, (
            field, np.abs(a - b).max(), scale
        )


@pytest.mark.slow
def test_multi_tick_trajectories_agree():
    """20 ticks of a 4-robot crossing: both paths drive the same trajectories
    (interpreter-mode Pallas is ~2.5 s/tick, so the window is kept short; the
    single-slot test above pins the exact math).

    The spawn circle is deliberately made asymmetric (staggered radii): in a
    perfectly symmetric crossing all robots meet the center simultaneously
    and the avoidance side is a knife-edge symmetry break that roundoff can
    flip to a mirrored-but-equivalent solution.
    """
    specs = circle_formation(4, circle_radius=22.0, target_speed=10.0)
    for i, s in enumerate(specs):
        shift = 1.0 + 0.15 * i
        s.start[:2] *= shift
        s.waypoints[0, :2] *= shift
    params, state, sdf = build_scenario(
        specs, target_speed=10.0, planning_horizon=3.0, hz=10.0,
        comms_radius=60.0, internal=6, external=3, n_slots=4,
        world=(100.0, 100.0), dtype=jnp.float32,
    )
    pp = dataclasses.replace(
        params, use_pallas=True, pallas_interpret=True, pallas_r_tile=8
    )
    step = jax.jit(T.step, static_argnums=2)
    sx, sp_ = state, state
    for _ in range(20):
        sx = step(sx, sdf, params)
        sp_ = step(sp_, sdf, pp)
    px, ppos = np.asarray(sx.pos), np.asarray(sp_.pos)
    assert np.isfinite(ppos).all()
    # robots actually moved off the spawn circle
    assert np.abs(ppos - np.asarray(state.pos)).max() > 1.0
    # knife-edge validity thresholds amplify roundoff once inter-robot
    # factors engage (see module doc) — meter-level agreement is the
    # regression bar here; exact math is pinned by the single-slot test
    assert np.abs(px - ppos).max() < 2.0, np.abs(px - ppos).max()
