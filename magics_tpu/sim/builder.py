"""Programmatic scenario construction (the spawner's dense-state half).

Mirrors what `spawn_formation` + `RobotBundle::new` produce in the reference
(crates/magics/src/planner/spawner.rs:415-658, robot.rs:1130-1356), but as a
one-shot builder: all robots of a run are pre-planned with spawn ticks and the
dense state is allocated once at capacity.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax.numpy as jnp

from magics_tpu.core.schedule import ScheduleKind, schedule_booleans
from magics_tpu.core.timesteps import get_variable_timesteps
from magics_tpu.graph.state import GbpParams, SimState, init_state


@dataclasses.dataclass
class RobotSpec:
    """One robot to spawn: initial pose and its waypoint state-vectors."""

    start: np.ndarray          # [4] = [x, y, vx, vy]
    waypoints: np.ndarray      # [W, 4] including the start pose as row 0
    radius: float = 1.0
    spawn_tick: int = 0
    # waypoint-reached checks (gbp_config formation.rs:162-208):
    # var index that must intersect (0 = current, -1 = horizon)
    wp_check_var: int = -1
    fin_check_var: int = 0
    wp_check_dist: float | None = None   # None -> robot radius
    fin_check_dist: float | None = None
    # "only-local" | "rrt-star" (gbp_config formation.rs:46-52); with
    # rrt-star the waypoint list contains either the pre-planned global path
    # or (in-flight mode) the straight taskpoint chain used as a fallback
    planning_strategy: str = "only-local"
    # in-flight planning (robot.rs:562-812): the robot spawns Idle and the
    # MissionManager plans route segments asynchronously during the run;
    # `taskpoints` [T, 2] are the route endpoints to plan between
    inflight: bool = False
    taskpoints: np.ndarray | None = None


def circle_formation(
    n_robots: int,
    circle_radius: float,
    target_speed: float,
    robot_radius: float = 2.0,
    center: tuple[float, float] = (0.0, 0.0),
) -> list[RobotSpec]:
    """The gbpplanner circle scenario: robots equally spaced on a circle, each
    crossing to the antipodal point (formation.rs:289-291, as_positions with
    ProjectionStrategy::Cross)."""
    specs = []
    for i in range(n_robots):
        ang = 2.0 * np.pi * i / n_robots
        p0 = np.array([center[0] + circle_radius * np.cos(ang),
                       center[1] + circle_radius * np.sin(ang)])
        p1 = np.array([center[0] + circle_radius * np.cos(ang + np.pi),
                       center[1] + circle_radius * np.sin(ang + np.pi)])
        d = p1 - p0
        v = d / np.linalg.norm(d) * target_speed
        start = np.concatenate([p0, v])
        wp = np.stack([start, np.concatenate([p1, v])])
        specs.append(RobotSpec(start=start, waypoints=wp, radius=robot_radius))
    return specs


def build_scenario(
    specs: Sequence[RobotSpec],
    *,
    target_speed: float,
    planning_horizon: float = 5.0,
    hz: float = 10.0,
    comms_radius: float = 20.0,
    comms_failure_rate: float = 0.0,
    internal: int = 10,
    external: int = 10,
    schedule: ScheduleKind = ScheduleKind.CENTERED,
    lookahead_multiple: int = 3,
    n_slots: int = 8,
    capacity: int | None = None,
    waypoint_capacity: int | None = None,
    sdf: np.ndarray | None = None,
    world: tuple[float, float] = (100.0, 100.0),
    dtype=jnp.float32,
    seed: int = 0,
    goal_areas: np.ndarray | None = None,
    **param_overrides,
) -> tuple[GbpParams, SimState, jnp.ndarray]:
    """Build (params, state, sdf) for a run."""
    ts = get_variable_timesteps(int(target_speed * planning_horizon), lookahead_multiple)
    V = len(ts)
    R = capacity or len(specs)
    assert R >= len(specs)
    if sdf is None:
        sdf = np.ones((8, 8))
    Wmax = max(len(s.waypoints) for s in specs)
    if any(s.inflight for s in specs):
        # reserve room for in-flight planned paths (mission.apply_plans
        # resamples longer paths down to this capacity)
        Wmax = max(Wmax, waypoint_capacity or 64)
    elif waypoint_capacity:
        Wmax = max(Wmax, waypoint_capacity)

    param_overrides.setdefault(
        "max_robot_radius", float(max(s.radius for s in specs))
    )
    params = GbpParams(
        n_vars=V,
        n_slots=n_slots,
        max_waypoints=Wmax,
        schedule=tuple(schedule_booleans(schedule, internal, external)),
        target_speed=target_speed,
        planning_horizon_seconds=planning_horizon,
        comms_radius=comms_radius,
        comms_failure_rate=comms_failure_rate,
        hz=hz,
        world_width=world[0],
        world_height=world[1],
        sdf_shape=tuple(sdf.shape),
        variable_timesteps=tuple(ts),
        dtype=dtype,
        **param_overrides,
    )

    starts = np.zeros((R, 4))
    wps = np.zeros((R, Wmax, 4))
    n_wps = np.zeros(R, dtype=np.int32)
    radii = np.ones(R)
    spawn = np.full(R, -1, dtype=np.int32)
    wp_var = np.full(R, V - 1, dtype=np.int32)
    fin_var = np.zeros(R, dtype=np.int32)
    wp_d2 = np.ones(R)
    fin_d2 = np.ones(R)
    for i, s in enumerate(specs):
        starts[i] = s.start
        wps[i, : len(s.waypoints)] = s.waypoints
        n_wps[i] = len(s.waypoints)
        radii[i] = s.radius
        spawn[i] = s.spawn_tick
        wp_var[i] = (V - 1) if s.wp_check_var == -1 else s.wp_check_var
        fin_var[i] = (V - 1) if s.fin_check_var == -1 else s.fin_check_var
        wp_d2[i] = (s.wp_check_dist if s.wp_check_dist is not None else s.radius) ** 2
        fin_d2[i] = (s.fin_check_dist if s.fin_check_dist is not None else s.radius) ** 2

    pending = np.zeros(R, dtype=bool)
    for i, s in enumerate(specs):
        pending[i] = s.inflight

    state = init_state(
        params,
        n_robots=R,
        start_states=starts,
        waypoints=wps,
        n_waypoints=n_wps,
        radii=radii,
        spawn_ticks=spawn,
        variable_timesteps=np.array(ts),
        wp_check_var=wp_var,
        wp_check_dist2=wp_d2,
        fin_check_var=fin_var,
        fin_check_dist2=fin_d2,
        seed=seed,
        goal_areas=goal_areas,
        plan_pending=pending,
    )
    return params, state, jnp.asarray(sdf, dtype=dtype)
