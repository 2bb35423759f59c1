"""Behavioral contracts of the shipped experiment scenarios.

The round-3 review showed that 'builds + finite' assertions let a
connectivity-collapse defect survive a green suite: these tests assert the
experiments' implicit contracts (the conditions the reference's experiment
scripts rely on, scripts/run-circle-expertiment.fish:22-45) so that breaking
the inter-robot lifecycle or the production-dtype numerics turns the suite
red:

* Circle Experiment: every active robot carries full inter-robot
  connectivity (degree R-1, comms radius 50 covers the shrinking circle),
  all 30 robots complete well inside the experiment budget, collisions stay
  bounded, and no neighbour-slot overflow occurs.
* Junction Experiment: goal areas record robot arrivals.

These run the REAL scenario configs at the production float32 dtype on CPU.
"""

from __future__ import annotations

import numpy as np
import pytest

from magics_tpu.config.loader import load_scenario
from magics_tpu.sim.simulator import Simulator

REF_SCENARIOS = "/root/reference/config/scenarios"


@pytest.mark.slow
def test_circle_experiment_completes_with_full_connectivity():
    sim = Simulator(
        load_scenario(f"{REF_SCENARIOS}/Circle Experiment"), max_sim_time=80.0
    )
    R = len(sim.specs)
    assert R == 30
    # auto-sized slot capacity covers every possible pair
    assert sim.params.n_slots == R - 1

    # mid-flight connectivity check: run past the spawn delay, then assert
    # the connection set EQUALS the in-range set (the reference connects all
    # in-range pairs, robot.rs:1441-1586 — on the spawn circle of radius 50
    # the 50 m comms radius reaches ~10 neighbours; full degree develops as
    # the circle contracts)
    sim.run(max_ticks=15)
    act = np.asarray(sim.state.active)
    assert act.sum() == R
    pos = np.asarray(sim.state.pos)
    d2 = np.sum((pos[:, None] - pos[None, :]) ** 2, axis=-1)
    comms = sim.cfg.robot.communication.radius
    in_range = (d2 <= comms * comms) & ~np.eye(R, dtype=bool)
    mask = np.asarray(sim.state.nbr_mask)
    idx = np.asarray(sim.state.nbr_idx)
    conn = np.zeros((R, R), dtype=bool)
    conn[np.repeat(np.arange(R), mask.shape[1])[mask.ravel()], idx[mask]] = True
    # connectivity updates from start-of-tick positions while this check
    # reads end-of-tick positions; robots close at up to 2*speed, so pairs
    # within one tick of the boundary may lag one tick — exclude that band
    # (also covers the exact-chord-50 spawn-geometry knife edge)
    band = 2.0 * sim.cfg.robot.target_speed * sim.dt + 1e-2
    off_edge = np.abs(np.sqrt(d2) - comms) > band
    np.testing.assert_array_equal(conn[off_edge], in_range[off_edge])
    assert int(conn[0].sum()) >= 8  # geometry sanity: ~10 peers at spawn

    # run to completion
    result = sim.run()
    assert result["completed"] == R, result
    assert result["makespan"] < 60.0, result  # reference-scale makespan
    assert result["nbr_overflow"] == 0, result
    # the crush may brush a few pairs; a collision explosion means the
    # inter-robot factors are not doing their job
    assert result["rr_collisions"] <= 10, result
    assert result["re_collisions"] == 0, result


@pytest.mark.slow
def test_junction_experiment_goal_areas_record_arrivals():
    sim = Simulator(
        load_scenario(f"{REF_SCENARIOS}/Junction Experiment"), max_sim_time=20.0
    )
    assert sim.state.ga_aabb.shape[0] == 2  # the two junction goal areas
    sim.run()
    hist = np.asarray(sim.state.ga_history)
    # robots flowed through the junction and at least one goal area
    # recorded first-reach timestamps
    assert (hist >= 0).any(), hist
    assert int(np.asarray(sim.state.nbr_overflow)) == 0


@pytest.mark.slow
def test_comms_failure_experiment_completes_at_zero_failure():
    """Communications Failure Experiment contract (round-4 verdict job #1):
    at failure-rate 0.0 every robot must finish the obstacle-cluttered circle
    crossing — the reference's harness relies on scenario completion
    (exit-application-on-scenario-finished, its notebook reports mean
    makespan ~165 s and ~7 rr-collision events at f=0.0, v0=15;
    analyse-comms-failure.ipynb). The round-4 non-completion was a
    half-scale-RegularPolygon SDF bug (gbp_environment lib.rs:298-301):
    obstacles rendered 2x too large and jammed the corridors."""
    sc = load_scenario(f"{REF_SCENARIOS}/Communications Failure Experiment")
    sc.config.robot.communication.failure_rate = 0.0
    sim = Simulator(sc, seed=0, max_sim_time=600.0, viz_log=False)
    R = len(sim.specs)
    assert R == 21
    result = sim.run()
    assert result["completed"] == R, result
    assert result["makespan"] < 500.0, result
    # reference-scale collision count (~7 events at f=0.0; an explosion means
    # obstacle/inter-robot avoidance is broken in the cluttered regime)
    assert result["rr_collisions"] <= 60, result
    assert result["nbr_overflow"] == 0, result


@pytest.mark.slow
def test_schedules_experiment_every_schedule_completes():
    """Schedules Experiment contract: the 30-robot clear-circle crossing
    completes under each schedule kind at the experiment's 50i budget —
    exercising core/schedule.py end-to-end (run-schedules-experiment.fish
    sweeps all five kinds x external 5..25)."""
    from magics_tpu.core.schedule import ScheduleKind

    for kind in ("soon-as-possible", "late-as-possible"):
        sc = load_scenario(f"{REF_SCENARIOS}/Schedules Experiment")
        sc.config.gbp.iteration_schedule.schedule = ScheduleKind(kind)
        sc.config.gbp.iteration_schedule.external = 10
        sim = Simulator(sc, seed=0, max_sim_time=120.0, viz_log=False)
        R = len(sim.specs)
        result = sim.run()
        assert result["completed"] == R, (kind, result)
        assert result["rr_collisions"] <= 10, (kind, result)


@pytest.mark.slow
def test_iteration_amount_experiment_low_budget_completes():
    """Iteration Amount Experiment contract: the 25-robot crossing still
    completes at a low fibonacci budget (8i + 8e — the harness sweeps
    1..34 x 1..34, run-iteration-amount-experiment.fish)."""
    sc = load_scenario(f"{REF_SCENARIOS}/Iteration Amount Experiment")
    sc.config.gbp.iteration_schedule.internal = 8
    sc.config.gbp.iteration_schedule.external = 8
    sim = Simulator(sc, seed=0, max_sim_time=150.0, viz_log=False)
    R = len(sim.specs)
    assert R == 25
    result = sim.run()
    assert result["completed"] == R, result


@pytest.mark.slow
def test_environment_obstacles_experiment_completes_cleanly():
    """Environment Obstacles Experiment contract: 5 robots cross the
    cluttered circle without environment collisions (the experiment's
    metric, run-environment-obstacles-experiment.fish sweeps 5..50)."""
    sim = Simulator(
        load_scenario(f"{REF_SCENARIOS}/Environment Obstacles Experiment"),
        seed=0, max_sim_time=300.0, viz_log=False,
    )
    R = len(sim.specs)
    assert R == 5
    result = sim.run()
    assert result["completed"] == R, result
    assert result["re_collisions"] == 0, result


@pytest.mark.slow
def test_varying_network_connectivity_sparse_radius_completes():
    """Varying Network Connectivity contract: the cluttered crossing
    completes even at the sparsest swept comms radius (20 m of the
    reference's 20/40/60/80, run-varying-network-connectivity-....fish)."""
    sc = load_scenario(
        f"{REF_SCENARIOS}/Varying Network Connectivity Experiment"
    )
    sc.config.robot.communication.radius = 20.0
    sim = Simulator(sc, seed=0, max_sim_time=600.0, viz_log=False)
    R = len(sim.specs)
    result = sim.run()
    # sparse comms degrades coordination; the contract is substantial
    # completion without a jam (reference outliers filtered at 1000 s)
    assert result["completed"] >= R - 2, result


@pytest.mark.slow
def test_junction_twoway_flows_and_despawns():
    """Junction Twoway contract: infinite spawners stream robots through
    the two-way junction; robots reach their final waypoint and despawn
    (capacity recycling), goal areas record arrivals."""
    sim = Simulator(
        load_scenario(f"{REF_SCENARIOS}/Junction Twoway"),
        seed=0, max_sim_time=60.0, viz_log=False,
    )
    result = sim.run()
    assert result["completed"] >= 4, result
    assert result["nbr_overflow"] == 0, result


@pytest.mark.slow
def test_solo_gp_rrtstar_mission_completes():
    """Solo GP contract: the rrt-star planning strategy at experiment
    scale — the robot plans through the Solo GP environment in flight and
    completes its route (robot.rs:562-812 mission flow)."""
    sim = Simulator(
        load_scenario(f"{REF_SCENARIOS}/Solo GP"),
        seed=0, max_sim_time=300.0, viz_log=False,
    )
    R = len(sim.specs)
    assert R == 1
    result = sim.run()
    assert result["completed"] == R, result
    assert result["re_collisions"] == 0, result


@pytest.mark.slow
def test_collaborative_gp_missions_complete():
    """Collaborative GP contract: ten rrt-star robots spawn on staggered
    timers, plan in flight, and complete their routes."""
    sim = Simulator(
        load_scenario(f"{REF_SCENARIOS}/Collaborative GP"),
        seed=0, max_sim_time=400.0, viz_log=False,
    )
    result = sim.run()
    R = len(sim.specs)
    assert result["completed"] >= R - 1, result
