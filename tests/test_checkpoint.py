"""Checkpoint/resume: a resumed run is bit-identical to an uninterrupted one."""

import dataclasses

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
