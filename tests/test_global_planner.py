"""RRT* global planner: native C++ kernel and numpy fallback.

Mirrors the reference's planner contract (crates/gbp_global_planner): plan
start -> goal through free space, keeping `collision_radius` clearance, with
shortcut smoothing; return None when no path exists.
"""

import numpy as np
import pytest

from magics_tpu.config.schema import RrtSection
from magics_tpu.env.sdf import distance_transform
from magics_tpu.planner.global_planner import GlobalPlanner


def _wall_world():
    """64x64 grid, 100x100 m world: a vertical wall with one gap."""
    obstacle = np.zeros((64, 64), dtype=bool)
    obstacle[:, 30:34] = True
    obstacle[28:36, 30:34] = False  # gap in the middle
    dist = distance_transform(obstacle, 100.0 / 64)
    return dist, (100.0, 100.0)


RRT = RrtSection(
    max_iterations=50_000,
    step_size=5.0,
    collision_radius=2.0,
    neighbourhood_radius=8.0,
    smoothing_enabled=True,
    smoothing_max_iterations=200,
    smoothing_step_size=0.5,
)


@pytest.mark.parametrize("fallback", [False, True])
def test_plans_through_gap(fallback):
    dist, world = _wall_world()
    gp = GlobalPlanner(dist, world, RRT, force_fallback=fallback)
    if not fallback and gp._native is None:
        pytest.skip("native planner unavailable")
    path = gp.plan((-30.0, -30.0), (30.0, 30.0), seed=7)
    assert path is not None
    assert np.allclose(path[0], [-30.0, -30.0], atol=1e-4)
    assert np.allclose(path[-1], [30.0, 30.0], atol=1e-4)
    # every returned point keeps the collision clearance
    assert bool(np.all(gp._feasible(path)))
    # the path must cross the wall through the gap (|y| < ~8 at the wall)
    xs = path[:, 0]
    for a, b in zip(path, path[1:]):
        if (a[0] < -3) != (b[0] < -3):  # segment crossing the wall band
            t = (-3 - a[0]) / (b[0] - a[0] + 1e-12)
            y_cross = a[1] + t * (b[1] - a[1])
            assert abs(y_cross) < 10.0, y_cross
    assert xs.min() >= -50 and xs.max() <= 50


def test_no_path_when_blocked():
    obstacle = np.zeros((64, 64), dtype=bool)
    obstacle[:, 30:34] = True  # full wall, no gap
    dist = distance_transform(obstacle, 100.0 / 64)
    rrt = RrtSection(max_iterations=3000, step_size=5.0, collision_radius=2.0,
                     neighbourhood_radius=8.0, smoothing_enabled=False)
    gp = GlobalPlanner(dist, (100.0, 100.0), rrt)
    assert gp.plan((-30.0, 0.0), (30.0, 0.0), seed=1) is None


def test_infeasible_endpoint():
    dist, world = _wall_world()
    gp = GlobalPlanner(dist, world, RRT)
    # goal inside the wall
    assert gp.plan((-30.0, -30.0), (0.0, 30.0), seed=1) is None


def test_native_matches_fallback_quality():
    """Both implementations find comparable-length paths."""
    dist, world = _wall_world()
    gp_n = GlobalPlanner(dist, world, RRT)
    if gp_n._native is None:
        pytest.skip("native planner unavailable")
    gp_f = GlobalPlanner(dist, world, RRT, force_fallback=True)
    straight = np.linalg.norm([60.0, 60.0])
    for gp in (gp_n, gp_f):
        path = gp.plan((-30.0, -30.0), (30.0, 30.0), seed=3)
        assert path is not None
        L = np.linalg.norm(np.diff(path, axis=0), axis=1).sum()
        assert straight <= L < 2.0 * straight, L
