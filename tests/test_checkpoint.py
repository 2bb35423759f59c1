"""Checkpoint/resume: a resumed run is bit-identical to an uninterrupted one."""

import dataclasses

import pytest

import numpy as np
import jax

from magics_tpu.graph import tick as T
from magics_tpu.io import checkpoint as CK
from magics_tpu.sim.builder import build_scenario, circle_formation


def test_save_load_roundtrip(tmp_path):
    specs = circle_formation(4, circle_radius=20.0, target_speed=8.0)
    params, state, sdf = build_scenario(
        specs, target_speed=8.0, planning_horizon=2.0, internal=4, external=2,
        n_slots=2,
    )
    step = jax.jit(T.step, static_argnums=2)
    for _ in range(10):
        state = step(state, sdf, params)

    p = tmp_path / "ck.npz"
    CK.save(p, state, meta={"scenario": "t"})
    restored, meta = CK.load(p)
    assert meta["scenario"] == "t"
    for f in dataclasses.fields(state):
        a = np.asarray(getattr(state, f.name))
        b = np.asarray(getattr(restored, f.name))
        assert a.dtype == b.dtype, f.name
        np.testing.assert_array_equal(a, b, err_msg=f.name)


def test_resume_is_deterministic(tmp_path):
    specs = circle_formation(4, circle_radius=20.0, target_speed=8.0)
    params, state, sdf = build_scenario(
        specs, target_speed=8.0, planning_horizon=2.0, internal=4, external=2,
        n_slots=2,
    )
    step = jax.jit(T.step, static_argnums=2)

    # uninterrupted: 30 ticks
    s_full = state
    for _ in range(30):
        s_full = step(s_full, sdf, params)

    # interrupted at 15, checkpointed, resumed
    s_half = state
    for _ in range(15):
        s_half = step(s_half, sdf, params)
    p = tmp_path / "mid.npz"
    CK.save(p, s_half)
    s_resumed, _ = CK.load(p)
    for _ in range(15):
        s_resumed = step(s_resumed, sdf, params)

    for f in dataclasses.fields(s_full):
        a = np.asarray(getattr(s_full, f.name))
        b = np.asarray(getattr(s_resumed, f.name))
        np.testing.assert_array_equal(a, b, err_msg=f.name)


def test_load_pre_partner_table_checkpoint(tmp_path):
    """Checkpoints written before rr_partner/rr_partner_overflow existed must
    still load, with compatibility defaults (ADVICE r1, io/checkpoint.py)."""
    import io as _io
    import json
    import zipfile

    specs = circle_formation(3, circle_radius=20.0, target_speed=8.0)
    params, state, sdf = build_scenario(
        specs, target_speed=8.0, planning_horizon=2.0, internal=2, external=0,
        n_slots=2,
    )
    p = tmp_path / "old.npz"
    CK.save(p, state, params=params)

    # strip the new fields to simulate an old checkpoint
    stripped = tmp_path / "stripped.npz"
    with zipfile.ZipFile(p) as zin, zipfile.ZipFile(stripped, "w") as zout:
        for name in zin.namelist():
            if name in ("rr_partner.npy", "rr_partner_overflow.npy"):
                continue
            zout.writestr(name, zin.read(name))

    restored, _ = CK.load(stripped, params=params)
    assert restored.rr_partner.shape == (state.n_robots, 0)
    assert int(restored.rr_partner_overflow) == 0


def test_grid_mode_mismatch_rejected(tmp_path):
    """Resuming a dense-mode checkpoint under grid params (or vice versa)
    must fail loudly, not corrupt hysteresis state."""
    import dataclasses as dc
    import pytest

    specs = circle_formation(3, circle_radius=20.0, target_speed=8.0)
    params, state, sdf = build_scenario(
        specs, target_speed=8.0, planning_horizon=2.0, internal=2, external=0,
        n_slots=2,
    )
    p = tmp_path / "dense.npz"
    CK.save(p, state, params=params)

    grid_params = dc.replace(params, grid_cell_size=10.0)
    with pytest.raises(ValueError, match="collision mode"):
        CK.load(p, params=grid_params)


@pytest.mark.slow
def test_simulator_reset_is_reload(tmp_path):
    """Simulator.reset == scenario hot-reload (simulation_loader.rs:687-713):
    the rebuilt state matches a fresh Simulator's initial state."""
    from magics_tpu.config.loader import load_scenario
    from magics_tpu.sim.simulator import Simulator

    sc = load_scenario("/root/reference/config/scenarios/Circle Experiment")
    sim = Simulator(sc, max_sim_time=2.0)
    initial = sim.state
    sim.run(max_ticks=5)
    assert int(np.asarray(sim.state.tick)) == 5
    sim.reset()
    for f in dataclasses.fields(initial):
        np.testing.assert_array_equal(
            np.asarray(getattr(initial, f.name)),
            np.asarray(getattr(sim.state, f.name)),
            err_msg=f.name,
        )
    assert sim.diagnostics.time == []
