"""Experiment-scale trajectory parity vs the reference oracle
(BASELINE.md: <= 1e-3 RMSE at the same horizon and iteration budget).

The well-conditioned regime asserts the hard RMSE target with >= 6 robots at
saturating connectivity and ACTIVE inter-robot factors; the chaotic circle
crossing asserts qualitative parity (identical completion outcome) and that
the runs re-converge after the crush. See scripts/parity_rmse.py for the
regime discussion.
"""

from __future__ import annotations

import numpy as np
import jax
import pytest

from magics_tpu.graph import tick as T
from tests.compare_util import build_pair

from scripts.parity_rmse import circle_case, lanes_case

NO_TRK = ("dynamic", "obstacle", "interrobot")


def _run(starts, wpls, radii, speed, n_ticks, factors):
    R = len(starts)
    params, state, sdf, oracle = build_pair(
        starts=starts, waypoint_lists=wpls, radii=radii, speed=speed,
        horizon_s=3.0, comms_radius=250.0, internal=10, external=10,
        n_slots=R - 1, despawn=False, factors=factors,
    )
    step = jax.jit(T.step, static_argnums=2)
    sq = np.zeros(R)
    min_deg = R
    for _ in range(n_ticks):
        state = step(state, sdf, params)
        oracle.step()
        d = np.linalg.norm(np.asarray(state.pos) - oracle.pos, axis=1)
        sq += d * d
        min_deg = min(min_deg, int(np.asarray(state.nbr_mask).sum(axis=1).min()))
    return state, oracle, np.sqrt(sq / n_ticks), min_deg


def test_lanes_rmse_well_conditioned():
    """6 robots, full connectivity (degree 5), inter-robot factors active the
    whole run: the dense path must track the oracle below the 1e-3 target."""
    state, oracle, rmse, min_deg = _run(*lanes_case(), 40, NO_TRK)
    assert min_deg == 5  # saturating connectivity held throughout
    # factors were genuinely active (messages flowing), not all skipped
    assert float(np.abs(np.asarray(state.ext_inbox)).mean()) > 1.0
    assert rmse.max() < 1e-3, rmse
    # in practice f64 lockstep is at roundoff level; catch regressions early
    assert rmse.max() < 1e-6, rmse


@pytest.mark.slow
def test_circle_crossing_qualitative_parity():
    """8-robot antipodal crossing (the Circle-Experiment geometry, tracking
    disabled per its config): the crush is chaotic so trajectories diverge,
    but the outcome must match — all robots complete in both."""
    state, oracle, rmse, min_deg = _run(*circle_case(), 60, NO_TRK)
    assert min_deg == 7
    assert int(np.asarray(state.completed).sum()) == 8
    assert sum(oracle.completed) == 8


@pytest.mark.slow
def test_cluttered_obstacle_regime_qualitative_parity():
    """The Communications-Failure-Experiment regime: antipodal crossing
    through the real `circle_cluttered` SDF at sigma-factor-obstacle 0.005,
    tracking disabled (round-4 verdict: this obstacle-factor-dominant regime
    had no oracle comparison, so the half-scale-polygon SDF defect could not
    be localised). Chaotic — assert identical qualitative outcome."""
    from scripts.parity_rmse import cluttered_case

    starts, wpls, radii, speed, sdf_np, world = cluttered_case()
    R = len(starts)
    params, state, sdf, oracle = build_pair(
        starts=starts, waypoint_lists=wpls, radii=radii, speed=speed,
        horizon_s=3.0, comms_radius=250.0, internal=10, external=10,
        n_slots=R - 1, despawn=False, factors=NO_TRK,
        sdf_np=sdf_np, world=world,
    )
    step = jax.jit(T.step, static_argnums=2)
    for t in range(160):
        state = step(state, sdf, params)
        oracle.step()
    # Chaotic from tick 0: the 45 m horizon lookahead puts future-state
    # variables into the clutter and the inter-robot crush immediately, so
    # pixel-staircase epsilons amplify to O(10 m) trajectory divergence (the
    # same holds between the Rust reference and itself under operation
    # reordering). The contract is qualitative: identical completion outcome
    # and no jam (the round-4 defect jammed BOTH counts near zero).
    # same phenomenon as the reference's own comms-failure outliers (its
    # notebook filters makespan > 1000 s): a straggler can finish a few
    # dozen ticks apart between the two, so allow +-1 at the fixed budget.
    dense_done = int(np.asarray(state.completed).sum())
    oracle_done = sum(oracle.completed)
    assert abs(dense_done - oracle_done) <= 1, (dense_done, oracle_done)
    assert min(dense_done, oracle_done) >= R - 2, (dense_done, oracle_done)
