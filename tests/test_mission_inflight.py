"""In-flight asynchronous global planning (the reference mission state
machine, robot.rs:562-812): robots spawn Idle, plans arrive asynchronously
and are applied mid-run (reset_variables + tracking-path swap +
tracking-factor timeout, factorgraph.rs:1541-1585), route segments replan
one after another, and a failed first plan retries.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from magics_tpu.graph import tick as T
from magics_tpu.planner.mission import MissionManager
from magics_tpu.sim.builder import RobotSpec, build_scenario


class StubPlanner:
    """Deterministic planner: straight 3-point segments; optionally fails
    the first `fail_first` calls (PathfindingError retry path)."""

    def __init__(self, fail_first: int = 0):
        self.calls = 0
        self.fail_first = fail_first

    def plan(self, start, goal, seed=0):
        self.calls += 1
        if self.calls <= self.fail_first:
            return None
        mid = (np.asarray(start) + np.asarray(goal)) / 2.0
        return np.stack([np.asarray(start, float), mid, np.asarray(goal, float)])


def _build(taskpoints, fail_first=0):
    start = np.concatenate([taskpoints[0], [10.0, 0.0]])
    chain = [np.concatenate([p, [10.0, 0.0]]) for p in taskpoints]
    spec = RobotSpec(
        start=start,
        waypoints=np.stack(chain),
        radius=1.5,
        planning_strategy="rrt-star",
        inflight=True,
        taskpoints=np.asarray(taskpoints, float),
        fin_check_var=0,
        wp_check_var=-1,
    )
    params, state, sdf = build_scenario(
        [spec], target_speed=10.0, planning_horizon=3.0, hz=10.0,
        comms_radius=50.0, internal=10, external=2, n_slots=1,
        dtype=jnp.float64, despawn_on_final_waypoint=False,
        waypoint_capacity=8,
    )
    planner = StubPlanner(fail_first)
    mission = MissionManager(params, lambda: planner, seed=3)
    mission.add_robot(0, np.asarray(taskpoints, float))
    return params, state, sdf, mission, planner


def _drive(params, state, sdf, mission, n_ticks, poll_every=2):
    step = jax.jit(T.step, static_argnums=2)
    trace = []
    for t in range(n_ticks):
        state = step(state, sdf, params)
        if (t + 1) % poll_every == 0:
            state = mission.poll(state, t + 1)
        trace.append(
            (
                bool(np.asarray(state.mission_active)[0]),
                bool(np.asarray(state.plan_pending)[0]),
            )
        )
    return state, trace


@pytest.mark.slow
def test_robot_idles_until_plan_arrives_then_completes_two_segments():
    taskpoints = np.array([[-20.0, 0.0], [0.0, 0.0], [20.0, 0.0]])
    params, state, sdf, mission, planner = _build(taskpoints)

    # spawn tick 0: the robot activates Idle — present but not iterating
    step = jax.jit(T.step, static_argnums=2)
    state = step(state, sdf, params)
    assert bool(np.asarray(state.active)[0])
    assert not bool(np.asarray(state.mission_active)[0])  # Idle
    assert bool(np.asarray(state.plan_pending)[0])
    p0 = np.asarray(state.pos)[0].copy()

    state, trace = _drive(params, state, sdf, mission, 400)
    # the plan arrived and turned the mission Active at some point
    assert any(ma for ma, _ in trace)
    assert bool(np.asarray(state.completed)[0])
    # both segments were planned (segment-wise in-flight replanning)
    assert planner.calls == 2
    # the applied tracking path is the stub's 3-point segment
    assert int(np.asarray(state.trk_path_len)[0]) == 3
    # the robot traversed to the final taskpoint
    final = np.asarray(state.pos)[0]
    assert np.linalg.norm(final - taskpoints[-1]) < 3.0, final
    assert not mission.active


def test_failed_first_plan_retries_and_completes():
    taskpoints = np.array([[-15.0, 0.0], [15.0, 0.0]])
    params, state, sdf, mission, planner = _build(taskpoints, fail_first=1)
    state, _ = _drive(params, state, sdf, mission, 300)
    assert planner.calls == 2  # one failure + one successful retry
    assert bool(np.asarray(state.completed)[0])
    assert not mission.active


def test_apply_plans_resets_variables_and_times_out_tracking():
    taskpoints = np.array([[-20.0, 0.0], [20.0, 0.0]])
    params, state, sdf, mission, planner = _build(taskpoints)
    step = jax.jit(T.step, static_argnums=2)
    for t in range(4):
        state = step(state, sdf, params)
    state = mission.poll(state, 4)
    # reset_variables: lerp start -> next at ratios i/n with velocity
    # speed * dir (robot.rs:739-765); endpoint priors pinned
    bm = np.asarray(state.belief_mean)[0]
    assert np.allclose(bm[0, :2], taskpoints[0], atol=1e-6)
    assert (np.diff(bm[:, 0]) >= -1e-9).all()  # monotone towards the goal
    assert np.allclose(bm[:, 2], 10.0, atol=1e-6)  # speed * dir_hat
    assert (np.asarray(state.trk_timeout)[0] == 10).all()
    assert (np.asarray(state.trk_record)[0] == 0).all()
    # factor inboxes emptied
    assert np.abs(np.asarray(state.dyn_v2f_eta)[0]).max() == 0.0
    assert not bool(np.asarray(state.plan_pending)[0])
    assert bool(np.asarray(state.mission_active)[0])
