"""Utility to run the dense tick and the numpy oracle side by side."""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from magics_tpu.core.schedule import ScheduleKind, schedule_booleans
from magics_tpu.core.timesteps import get_variable_timesteps
from magics_tpu.graph.state import GbpParams, init_state
from magics_tpu.graph import tick as T
from tests.oracle import OracleSim


def build_pair(
    *,
    starts,
    waypoint_lists,
    radii,
    speed=15.0,
    horizon_s=5.0,
    comms_radius=60.0,
    hz=10.0,
    internal=10,
    external=2,
    kind=ScheduleKind.INTERLEAVE_EVENLY,
    sigmas=None,
    sdf_np=None,
    world=(100.0, 100.0),
    factors=("dynamic", "obstacle", "tracking", "interrobot"),
    n_slots=4,
    despawn=True,
):
    sigmas = sigmas or dict(dynamics=1.0, interrobot=0.005, obstacle=0.005, tracking=0.1)
    ts = get_variable_timesteps(int(speed * horizon_s), 3)
    V = len(ts)
    R = len(starts)
    sched = schedule_booleans(kind, internal, external)
    if sdf_np is None:
        sdf_np = np.ones((8, 8))
    Wmax = max(len(w) for w in waypoint_lists)

    params = GbpParams(
        n_vars=V,
        n_slots=n_slots,
        max_waypoints=Wmax,
        schedule=tuple(sched),
        target_speed=speed,
        planning_horizon_seconds=horizon_s,
        comms_radius=comms_radius,
        comms_failure_rate=0.0,
        hz=hz,
        world_width=world[0],
        world_height=world[1],
        sdf_shape=sdf_np.shape,
        variable_timesteps=tuple(ts),
        dtype=jnp.float64,
        sigma_factor_dynamics=sigmas["dynamics"],
        sigma_factor_interrobot=sigmas["interrobot"],
        sigma_factor_obstacle=sigmas["obstacle"],
        sigma_factor_tracking=sigmas["tracking"],
        dynamic_enabled="dynamic" in factors,
        interrobot_enabled="interrobot" in factors,
        obstacle_enabled="obstacle" in factors,
        tracking_enabled="tracking" in factors,
        despawn_on_final_waypoint=despawn,
    )

    wps = np.zeros((R, Wmax, 4))
    n_wps = np.zeros(R, dtype=np.int32)
    for r, wl in enumerate(waypoint_lists):
        wps[r, : len(wl)] = wl
        n_wps[r] = len(wl)

    radii = np.asarray(radii, dtype=np.float64)
    state = init_state(
        params,
        n_robots=R,
        start_states=np.asarray(starts),
        waypoints=wps,
        n_waypoints=n_wps,
        radii=radii,
        spawn_ticks=np.zeros(R, dtype=np.int32),
        variable_timesteps=np.array(ts),
        wp_check_var=np.full(R, V - 1, dtype=np.int32),
        wp_check_dist2=radii**2,
        fin_check_var=np.zeros(R, dtype=np.int32),
        fin_check_dist2=radii**2,
    )
    sdf = jnp.asarray(sdf_np, dtype=jnp.float64)

    oracle = OracleSim(
        starts=np.asarray(starts),
        waypoint_lists=waypoint_lists,
        radii=radii,
        variable_timesteps=ts,
        schedule=sched,
        sdf=sdf_np,
        world=world,
        target_speed=speed,
        planning_horizon=horizon_s,
        comms_radius=comms_radius,
        sigmas=sigmas,
        hz=hz,
        despawn_on_final=despawn,
        factors=factors,
        n_slots=n_slots,
    )
    return params, state, sdf, oracle


def compare_tick(state, oracle, atol=1e-8, rtol=1e-6, label=""):
    """Return max belief-mean discrepancy over active robots."""
    worst = 0.0
    dense_mean = np.asarray(state.belief_mean)
    oracle_mean = oracle.belief_means()
    for r in range(oracle.R):
        if not oracle.active[r]:
            continue
        d = np.max(np.abs(dense_mean[r] - oracle_mean[r]))
        worst = max(worst, d)
    return worst
