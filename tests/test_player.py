"""Belief visualisation log + HTML playback viewer."""

import json

import numpy as np
import jax

from magics_tpu.graph import tick as T
from magics_tpu.sim.builder import build_scenario, circle_formation
from magics_tpu.viz.player import build_player


def _run(n_ticks, **over):
    specs = circle_formation(4, circle_radius=20.0, target_speed=8.0)
    params, state, sdf = build_scenario(
        specs, target_speed=8.0, planning_horizon=2.0, internal=4, external=2,
        n_slots=2, log_every=1, log_capacity=16, **over,
    )
    step = jax.jit(T.step, static_argnums=2)
    for _ in range(n_ticks):
        state = step(state, sdf, params)
    return params, state


def test_viz_log_records_means_and_covs():
    params, state = _run(6, viz_log_capacity=8)
    head = int(np.asarray(state.log_head))
    assert head == 6
    mean = np.asarray(state.viz_mean)[:head]  # [6, R, V, 2]
    cov = np.asarray(state.viz_cov)[:head]
    assert np.isfinite(mean).all()
    assert np.isfinite(cov).all()
    # the logged mean of the current variable matches the belief mean path:
    last = mean[-1, :, 0, :]
    np.testing.assert_allclose(
        last, np.asarray(state.belief_mean)[:, 0, :2], rtol=0, atol=1e-6
    )
    # marginal covariance must have positive diagonal where the precision is
    # finite (pinned endpoints have sigma 1e30 -> tiny but positive variance)
    assert (cov[..., 0] > 0).all()
    assert (cov[..., 2] > 0).all()


def test_viz_log_disabled_by_default():
    params, state = _run(2)
    assert state.viz_mean.shape[0] == 0


def test_build_player_embeds_export():
    export = {
        "scenario": "Unit Test",
        "makespan": 2.0,
        "delta_t": 0.1,
        "sample_interval": 0.1,
        "world_size": [40.0, 40.0],
        "prng_seed": 0,
        "config": {"robot": {"communication": {"radius": 10.0}}},
        "robots": {
            "0": {
                "radius": 1.0,
                "positions_start": 0.0,
                "positions": [[0.0, 0.0], [1.0, 0.0]],
                "velocities": [],
                "collisions": {"robots": 0, "environment": 0},
                "messages": {
                    "sent": {"internal": 1, "external": 2},
                    "received": {"internal": 3, "external": 4},
                },
                "mission": {
                    "waypoints": [[0.0, 0.0], [5.0, 0.0]],
                    "started_at": 0.0,
                    "finished_at": 0.0,
                    "duration": 2.0,
                },
                "planning_strategy": "only-local",
                "color": "",
            }
        },
        "obstacles": {"0": {"type": "Circle", "center": [3.0, 3.0], "radius": 1.0}},
        "collisions": {"robots": [], "environment": []},
        "goal_areas": {},
        "viz": {
            "t0": 0.0,
            "dt": 0.1,
            "mean": [[[[0.0, 0.0], [1.0, 0.0]]]],
            "cov": [[[[0.1, 0.0, 0.1], [0.2, 0.0, 0.2]]]],
        },
    }
    html = build_player(export)
    assert html.startswith("<!doctype html>")
    assert "Unit Test" in html
    # every visualiser layer of the reference maps to a toggle
    for layer in (
        "waypoints", "tracers", "communication graph", "communication radius",
        "predicted trajectories", "uncertainty ellipses", "obstacles",
        "collision flashes", "goal areas",
    ):
        assert layer in html, layer
    # the export must be embedded as valid JSON
    start = html.index("const DATA = ") + len("const DATA = ")
    end = html.index(";\n", start)
    assert json.loads(html[start:end]) == export
