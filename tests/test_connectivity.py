"""Inter-robot connection lifecycle at realistic density.

The reference connects EVERY newly in-range pair, uncapped
(create_interrobot_factors, robot.rs:1441-1586; set-difference
robot.rs:1386-1439). The dense fixed-K slot tables must therefore be exact
whenever K >= the in-range degree, and degrade to a *symmetric* nearest-K
truncation (counted in nbr_overflow) beyond that — never to the lowest-id
clique collapse these tests were written against.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from magics_tpu.graph import tick as T
from magics_tpu.sim.builder import RobotSpec, build_scenario, circle_formation

# jitted everywhere: besides speed, eager per-op dispatch of the full tick
# trips a flaky heap corruption in this image's XLA:CPU eager executor
# (jaxlib 0.9.0; lower/compile path is clean — see docs/ARCHITECTURE.md)
_step = jax.jit(T.step, static_argnums=2)


def _conn_matrix(state):
    """Dense boolean connection matrix from the slot tables."""
    m = np.asarray(state.nbr_mask)
    idx = np.asarray(state.nbr_idx)
    R = m.shape[0]
    conn = np.zeros((R, R), dtype=bool)
    for r in range(R):
        for k in range(m.shape[1]):
            if m[r, k]:
                conn[r, idx[r, k]] = True
    return conn


def _in_range_matrix(pos, radius):
    d2 = np.sum((pos[:, None, :] - pos[None, :, :]) ** 2, axis=-1)
    out = d2 <= radius * radius
    np.fill_diagonal(out, False)
    return out


def _step_circle(R, K, comms_radius, circle_radius=24.5, use_grid=False):
    # circle_radius stays off the comms boundary: at exactly
    # 2 * circle_radius == comms_radius the antipodal pair's d2 <= r2 test
    # is float-roundoff dependent (both here and in the reference)
    specs = circle_formation(R, circle_radius, 15.0)
    over = dict(grid_cell_size=15.0, grid_capacity=64) if use_grid else {}
    params, state, sdf = build_scenario(
        specs, target_speed=15.0, hz=10.0, comms_radius=comms_radius,
        internal=1, external=1, n_slots=K, dtype=jnp.float64, **over,
    )
    return params, _step(state, sdf, params)


@pytest.mark.parametrize("use_grid", [False, True])
def test_circle30_every_pair_connected(use_grid):
    """The Circle-Experiment density (30 robots, comms 50): with K >= 29
    every robot must carry 29 inter-robot connections — the reference's
    uncapped semantics (robot.rs:1441-1586)."""
    params, st = _step_circle(30, 29, 50.0, use_grid=use_grid)
    deg = np.asarray(jnp.sum(st.nbr_mask, axis=1))
    assert (deg == 29).all(), deg
    conn = _conn_matrix(st)
    assert (conn == conn.T).all()
    assert int(np.asarray(st.nbr_overflow)) == 0
    # reciprocal-slot cache covers every live slot
    assert (np.asarray(st.nbr_has_back) == np.asarray(st.nbr_mask)).all()


@pytest.mark.parametrize("use_grid", [False, True])
def test_degree_equals_in_range_when_capacity_suffices(use_grid):
    """Random cluster, K >= max in-range degree: per-robot degree ==
    in-range count exactly, masks symmetric, zero overflow."""
    rng = np.random.default_rng(5)
    R = 40
    pos = rng.uniform(-30, 30, size=(R, 2))
    specs = [
        RobotSpec(
            start=np.concatenate([p, [1.0, 0.0]]),
            waypoints=np.stack([
                np.concatenate([p, [1.0, 0.0]]),
                np.concatenate([p + [200.0, 0.0], [1.0, 0.0]]),
            ]),
        )
        for p in pos
    ]
    comms = 25.0
    in_range = _in_range_matrix(pos, comms)
    max_deg = int(in_range.sum(axis=1).max())
    assert max_deg > 8  # the regime that used to collapse
    over = dict(grid_cell_size=12.5, grid_capacity=64) if use_grid else {}
    params, state, sdf = build_scenario(
        specs, target_speed=1.0, hz=10.0, comms_radius=comms,
        internal=1, external=1, n_slots=max_deg, dtype=jnp.float64, **over,
    )
    st = _step(state, sdf, params)
    conn = _conn_matrix(st)
    want = _in_range_matrix(np.asarray(st.pos), comms)
    np.testing.assert_array_equal(conn, want)
    assert int(np.asarray(st.nbr_overflow)) == 0


@pytest.mark.parametrize("use_grid", [False, True])
def test_truncation_is_symmetric_nearest_k(use_grid):
    """K below the in-range degree (swarm truncation mode): the surviving
    graph must be the mutual nearest-K — symmetric, near-full slot usage —
    and the dropped pairs must be counted. The pre-fix ascending-id fill
    left only the K+1 lowest-id robots connected (degree 0 for the rest)."""
    K = 16
    params, st = _step_circle(30, K, 50.0, use_grid=use_grid)
    deg = np.asarray(jnp.sum(st.nbr_mask, axis=1))
    # circle symmetry: mutual nearest-16 is exactly the 8 neighbours each side
    assert (deg == K).all(), deg
    conn = _conn_matrix(st)
    assert (conn == conn.T).all()
    # nearest-K: each robot's partners are exactly its K nearest peers
    pos = np.asarray(st.pos)
    d2 = np.sum((pos[:, None] - pos[None, :]) ** 2, axis=-1)
    np.fill_diagonal(d2, np.inf)
    for r in range(30):
        nearest = set(np.argsort(d2[r], kind="stable")[:K].tolist())
        assert set(np.nonzero(conn[r])[0].tolist()) == nearest
    assert int(np.asarray(st.nbr_overflow)) == 30 * (29 - K)


def test_truncation_random_cluster_healthy_degree():
    """Random dense cluster with K=8 and ~25 in range: mutual nearest-K is
    not exactly K per robot, but must stay near capacity — not the ~0.3
    mean degree of the lowest-id clique collapse."""
    rng = np.random.default_rng(11)
    R = 64
    K = 8
    pos = rng.uniform(-14, 14, size=(R, 2))
    specs = [
        RobotSpec(
            start=np.concatenate([p, [1.0, 0.0]]),
            waypoints=np.stack([
                np.concatenate([p, [1.0, 0.0]]),
                np.concatenate([p + [200.0, 0.0], [1.0, 0.0]]),
            ]),
        )
        for p in pos
    ]
    comms = 15.0
    in_range = _in_range_matrix(pos, comms)
    assert in_range.sum(axis=1).min() > K  # truncation active for everyone
    params, state, sdf = build_scenario(
        specs, target_speed=1.0, hz=10.0, comms_radius=comms,
        internal=1, external=1, n_slots=K, dtype=jnp.float64,
    )
    st = _step(state, sdf, params)
    conn = _conn_matrix(st)
    assert (conn == conn.T).all()
    deg = conn.sum(axis=1)
    assert deg.mean() >= 0.6 * K, deg.mean()
    assert deg.min() >= 1
    assert int(np.asarray(st.nbr_overflow)) > 0


@pytest.mark.slow
def test_simulator_auto_sizes_slots():
    """Simulator default K covers every possible pair at experiment scale."""
    import pathlib

    from magics_tpu.config.loader import load_scenario
    from magics_tpu.sim.simulator import Simulator

    ref = pathlib.Path("/root/reference/config/scenarios/Circle Experiment")
    if not ref.exists():
        pytest.skip("reference scenarios unavailable")
    sim = Simulator(load_scenario(ref))
    R = len(sim.specs)
    assert sim.n_slots == R - 1
    state = sim.state
    from functools import partial

    runner = jax.jit(partial(T.run_ticks, n=3), static_argnums=2)(
        state, sim.sdf, sim.params, env_dist=sim.env_dist
    )
    deg = np.asarray(jnp.sum(runner.nbr_mask, axis=1))
    active = np.asarray(runner.active)
    # every active robot in this scenario is within comms radius 50 of all
    # others (circle radius <= 25) -> full degree
    assert (deg[active] == R - 1).all(), deg
    assert int(np.asarray(runner.nbr_overflow)) == 0
