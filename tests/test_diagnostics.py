"""Diagnostics time-series recorder (diagnostic/robot.rs parity)."""

import jax

from magics_tpu.graph import tick as T
from magics_tpu.io.diagnostics import DiagnosticsRecorder
from magics_tpu.sim.builder import build_scenario, circle_formation


def test_recorder_counts():
    specs = circle_formation(4, circle_radius=20.0, target_speed=8.0)
    params, state, sdf = build_scenario(
        specs, target_speed=8.0, planning_horizon=2.0, internal=4, external=2,
        n_slots=2, comms_radius=60.0,
    )
    rec = DiagnosticsRecorder(n_vars=params.n_vars)
    step = jax.jit(T.step, static_argnums=2)
    for k in range(4):
        state = step(state, sdf, params)
        rec.sample(state, params, (k + 1) / params.hz)

    d = rec.as_dict()
    V = params.n_vars
    assert d["robots"] == [4, 4, 4, 4]
    assert d["variables"][-1] == 4 * V
    # dyn (V-1) + obs (V-2) + trk (V-2) per robot, plus one inter-robot
    # factor per active neighbour slot
    internal_factors = 4 * ((V - 1) + (V - 2) + (V - 2))
    assert d["factors"][-1] == internal_factors + d["external_factors"][-1]
    assert d["external_factors"][-1] > 0  # comms radius covers the circle
    # message counters are cumulative and non-decreasing
    ms = d["messages"]["sent"]["internal"]
    assert ms[0] > 0 and all(a <= b for a, b in zip(ms, ms[1:]))
    assert d["collisions"]["robots"][-1] == 0
