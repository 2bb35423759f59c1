"""Trajectory-parity RMSE harness: dense TPU tick vs the reference oracle.

BASELINE.md's north-star parity row asks for <= 1e-3 RMSE on shipped-scenario
workloads at the same horizon and iteration budget. This runs experiment-scale
slices (Circle and Junction geometries at saturating connectivity — every
in-range pair connected, K >= degree, exactly the reference's uncapped
lifecycle robot.rs:1441-1586) on both the dense path and the per-robot numpy
oracle (tests/oracle.py, a transcription of the reference algorithm), and
reports per-robot trajectory RMSE plus the divergence curve.

Lockstep interpretation (see tests/test_parity.py): the GBP system is exactly
reproduced while numerically well-conditioned; once inter-robot interactions
turn chaotic (the circle-center crush), any epsilon is amplified and only
qualitative agreement is meaningful. The harness therefore reports RMSE over
a well-conditioned window (default: the full approach phase) and the
divergence curve beyond it.

    python scripts/parity_rmse.py [--ticks N] [--json out.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

from magics_tpu.graph import tick as T
from tests.compare_util import build_pair


def circle_case(R=8, circle_radius=24.0, speed=10.0):
    starts, wpls, radii = [], [], []
    for i in range(R):
        ang = 2 * np.pi * i / R
        p0 = circle_radius * np.array([np.cos(ang), np.sin(ang)])
        p1 = -p0
        v = (p1 - p0) / np.linalg.norm(p1 - p0) * speed
        starts.append(np.concatenate([p0, v]))
        wpls.append(np.stack([np.concatenate([p0, v]), np.concatenate([p1, v])]))
        radii.append(1.5)
    return np.array(starts), wpls, radii, speed


def junction_case(R=6, speed=10.0):
    """Two crossing streams (the Junction Experiment geometry,
    config/scenarios/Junction Experiment): half the robots travel +x,
    half travel -y, meeting at the origin."""
    starts, wpls, radii = [], [], []
    for i in range(R):
        k = i // 2
        if i % 2 == 0:
            p0 = np.array([-45.0 + 0.0 * k, -4.0 * k])
            p1 = np.array([45.0, -4.0 * k])
        else:
            p0 = np.array([4.0 * k, 45.0])
            p1 = np.array([4.0 * k, -45.0])
        v = (p1 - p0) / np.linalg.norm(p1 - p0) * speed
        starts.append(np.concatenate([p0, v]))
        wpls.append(np.stack([np.concatenate([p0, v]), np.concatenate([p1, v])]))
        radii.append(1.5)
    return np.array(starts), wpls, radii, speed


def run_case(name, starts, wpls, radii, speed, n_ticks, window):
    R = len(starts)
    params, state, sdf, oracle = build_pair(
        starts=starts,
        waypoint_lists=wpls,
        radii=radii,
        speed=speed,
        horizon_s=3.0,
        comms_radius=120.0,  # saturating: every pair stays in range
        internal=10,
        external=10,
        n_slots=R - 1,       # K >= degree: exact reference connectivity
        despawn=False,
    )
    step = jax.jit(T.step, static_argnums=2)
    err = []           # per-tick max position error over robots
    sq = np.zeros(R)   # accumulated squared error inside the window
    n_in_window = 0
    for t in range(n_ticks):
        state = step(state, sdf, params)
        oracle.step()
        d = np.linalg.norm(np.asarray(state.pos) - oracle.pos, axis=1)
        err.append(float(d.max()))
        if t < window:
            sq += d * d
            n_in_window += 1
        # degree sanity: saturating connectivity on both sides
        deg = int(np.asarray(state.nbr_mask).sum(axis=1).min())
        assert deg == R - 1, f"dense degree collapsed: {deg} != {R - 1}"
        assert all(len(oracle.connected[r]) == R - 1 for r in range(R))
    rmse = np.sqrt(sq / max(n_in_window, 1))
    out = {
        "case": name,
        "robots": R,
        "ticks": n_ticks,
        "window_ticks": window,
        "rmse_per_robot_m": [round(float(x), 9) for x in rmse],
        "rmse_max_m": float(rmse.max()),
        "divergence_curve_max_m": [round(e, 9) for e in err],
    }
    print(
        f"{name}: R={R} RMSE(max over robots, first {window} ticks) = "
        f"{rmse.max():.3e} m; max divergence over {n_ticks} ticks = "
        f"{max(err):.3e} m"
    )
    return out


def main():
    n_ticks = 60
    window = 40
    out_path = None
    for i, a in enumerate(sys.argv[1:]):
        if a == "--ticks":
            n_ticks = int(sys.argv[i + 2])
        if a == "--json":
            out_path = sys.argv[i + 2]
    results = [
        run_case("circle", *circle_case(), n_ticks=n_ticks, window=window),
        run_case("junction", *junction_case(), n_ticks=n_ticks, window=window),
    ]
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)
    worst = max(r["rmse_max_m"] for r in results)
    print(f"worst-case windowed RMSE: {worst:.3e} m (target 1e-3)")
    return results


if __name__ == "__main__":
    main()
