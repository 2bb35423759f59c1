"""End-to-end smoke tests of the dense tick on tiny scenarios."""

import numpy as np
import jax
import jax.numpy as jnp

from magics_tpu.core.schedule import ScheduleKind, schedule_booleans
from magics_tpu.core.timesteps import get_variable_timesteps
from magics_tpu.graph.state import GbpParams, init_state
from magics_tpu.graph import tick as T


def make_two_robot_scenario(dtype=jnp.float64, failure_rate=0.0):
    """Two robots on offset lanes passing each other."""
    speed = 10.0
    ts = get_variable_timesteps(int(speed * 3.0), 3)
    V = len(ts)
    params = GbpParams(
        n_vars=V,
        n_slots=4,
        max_waypoints=4,
        schedule=tuple(schedule_booleans(ScheduleKind.INTERLEAVE_EVENLY, 10, 2)),
        target_speed=speed,
        planning_horizon_seconds=3.0,
        comms_radius=50.0,
        comms_failure_rate=failure_rate,
        hz=10.0,
        world_width=100.0,
        world_height=100.0,
        sdf_shape=(8, 8),
        variable_timesteps=tuple(ts),
        dtype=dtype,
        sigma_factor_dynamics=1.0,
        sigma_factor_interrobot=0.005,
        sigma_factor_obstacle=0.005,
        sigma_factor_tracking=0.1,
    )

    R = 2
    starts = np.array(
        [[-40.0, 2.0, speed, 0.0], [40.0, -2.0, -speed, 0.0]], dtype=np.float64
    )
    wps = np.zeros((R, 4, 4))
    wps[0, 0] = starts[0]
    wps[0, 1] = [40.0, 2.0, speed, 0.0]
    wps[1, 0] = starts[1]
    wps[1, 1] = [-40.0, -2.0, -speed, 0.0]
    n_wps = np.array([2, 2], dtype=np.int32)

    radii = np.array([2.0, 2.0])
    r2 = radii * radii
    state = init_state(
        params,
        n_robots=R,
        start_states=starts,
        waypoints=wps,
        n_waypoints=n_wps,
        radii=radii,
        spawn_ticks=np.zeros(R, dtype=np.int32),
        variable_timesteps=np.array(ts),
        wp_check_var=np.full(R, V - 1, dtype=np.int32),  # horizon
        wp_check_dist2=r2,
        fin_check_var=np.zeros(R, dtype=np.int32),        # current
        fin_check_dist2=r2,
        seed=0,
    )
    sdf = jnp.ones(params.sdf_shape, dtype=dtype)  # all free space
    return params, state, sdf


def test_two_robots_converge_without_nans():
    params, state, sdf = make_two_robot_scenario()
    step = jax.jit(T.step, static_argnums=2)
    connected = False
    for _ in range(30):
        state = step(state, sdf, params)
        connected |= bool(jnp.any(state.nbr_mask))

    assert np.all(np.isfinite(np.asarray(state.pos)))
    assert np.all(np.isfinite(np.asarray(state.belief_mean)))
    # robots should have moved towards their goals (positive x progress for 0)
    assert float(state.pos[0, 0]) > -38.0
    assert float(state.pos[1, 0]) < 38.0
    assert connected


def test_robots_avoid_each_other():
    """With inter-robot factors on, the two robots should not collide."""
    params, state, sdf = make_two_robot_scenario()
    step = jax.jit(T.step, static_argnums=2)
    min_dist = np.inf
    for _ in range(90):
        state = step(state, sdf, params)
        d = float(jnp.linalg.norm(state.pos[0] - state.pos[1]))
        if bool(state.active[0]) and bool(state.active[1]):
            min_dist = min(min_dist, d)
    # safety distance = 2.2 * 2.0 = 4.4; robots physically collide below 4.0
    assert min_dist > 4.0, f"robots got too close: {min_dist}"
    assert int(state.rr_collisions) == 0


def test_robots_reach_goals_and_despawn():
    params, state, sdf = make_two_robot_scenario()
    step = jax.jit(T.step, static_argnums=2)
    for _ in range(100):
        state = step(state, sdf, params)
        if bool(jnp.all(state.completed)):
            break
    assert bool(jnp.all(state.completed)), (
        f"not completed after 100 ticks; pos={np.asarray(state.pos)}"
    )
    assert np.all(np.asarray(state.finished_at) > 0)
