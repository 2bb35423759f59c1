"""Parity tests for the 5 GBP schedules vs the reference's table-driven tests
(crates/gbp_schedule/src/schedules/*.rs)."""

from magics_tpu.core.schedule import ScheduleKind, schedule_booleans


def seq(kind, internal, external):
    return schedule_booleans(kind, internal, external)


def test_centered():
    # centered.rs tests
    assert seq(ScheduleKind.CENTERED, 10, 5) == [
        (True, False), (True, False), (True, False),
        (True, True), (True, True), (True, True), (True, True), (True, True),
        (True, False), (True, False),
    ]
    assert seq(ScheduleKind.CENTERED, 4, 6) == [
        (False, True), (True, True), (True, True), (True, True), (True, True),
        (False, True),
    ]
    assert seq(ScheduleKind.CENTERED, 3, 3) == [(True, True)] * 3
    assert seq(ScheduleKind.CENTERED, 0, 0) == []
    assert seq(ScheduleKind.CENTERED, 0, 1) == [(False, True)]
    assert seq(ScheduleKind.CENTERED, 0, 3) == [(False, True)] * 3
    assert seq(ScheduleKind.CENTERED, 3, 0) == [(True, False)] * 3
    assert seq(ScheduleKind.CENTERED, 1, 1) == [(True, True)]
    assert seq(ScheduleKind.CENTERED, 1, 2) == [(False, True), (True, True)]


def test_soon_as_possible():
    assert seq(ScheduleKind.SOON_AS_POSSIBLE, 10, 5) == [(True, True)] * 5 + [
        (True, False)
    ] * 5
    assert seq(ScheduleKind.SOON_AS_POSSIBLE, 2, 4) == [
        (True, True), (True, True), (False, True), (False, True),
    ]


def test_late_as_possible():
    assert seq(ScheduleKind.LATE_AS_POSSIBLE, 10, 5) == [(True, False)] * 5 + [
        (True, True)
    ] * 5
    assert seq(ScheduleKind.LATE_AS_POSSIBLE, 2, 4) == [
        (False, True), (False, True), (True, True), (True, True),
    ]


def test_half_beginning_half_end():
    # n=5, max=10: half=2, rem=1 -> true at [0,1] and [7,8,9]
    internals = [i for (i, _) in seq(ScheduleKind.HALF_BEGINNING_HALF_END, 10, 10)]
    assert internals == [True] * 10
    externals = [e for (_, e) in seq(ScheduleKind.HALF_BEGINNING_HALF_END, 10, 5)]
    assert externals == [True, True, False, False, False, False, False, True, True, True]


def test_interleave_evenly():
    # max divisible: n=5, max=10 -> every other slot
    ext = [e for (_, e) in seq(ScheduleKind.INTERLEAVE_EVENLY, 10, 5)]
    assert ext == [True, False] * 5
    assert sum(ext) == 5
    # circle experiment: internal 50, external 10 -> every 5th external
    sched = seq(ScheduleKind.INTERLEAVE_EVENLY, 50, 10)
    assert len(sched) == 50
    assert all(i for (i, _) in sched)
    assert sum(e for (_, e) in sched) == 10
    assert [e for (_, e) in sched][:10] == [
        True, False, False, False, False, True, False, False, False, False,
    ]


def test_counts_always_match():
    for kind in ScheduleKind:
        for internal in range(0, 12):
            for external in range(0, 12):
                s = seq(kind, internal, external)
                assert len(s) == max(internal, external)
                assert sum(i for (i, _) in s) == internal, (kind, internal, external)
                assert sum(e for (_, e) in s) == external, (kind, internal, external)


def test_scan_schedule_matches_unrolled():
    """`scan_schedule=True` (lax.scan over identical-flag runs) must be
    bit-identical to the trace-time unroll (ADVICE r1, tick.py:iterate_gbp)."""
    import dataclasses as dc

    import jax.numpy as jnp
    import numpy as np

    from magics_tpu.graph import tick as T
    from magics_tpu.sim.builder import build_scenario, circle_formation

    specs = circle_formation(6, circle_radius=20.0, target_speed=8.0)
    params, state, sdf = build_scenario(
        specs, target_speed=8.0, planning_horizon=2.0, comms_radius=30.0,
        internal=6, external=3, n_slots=4, dtype=jnp.float64,
    )
    scan_params = dc.replace(params, scan_schedule=True)

    # Jit BOTH paths: that is the production surface, and a fully-eager run
    # differs from any compiled run at the fusion-rounding level (~1e-31
    # relative at the 1e30 endpoint-prior scale), which binary gates
    # (factor skip, waypoint-reached) amplify over a few ticks.
    import jax

    step = jax.jit(T.step, static_argnums=2)
    s_unroll, s_scan = state, state
    for _ in range(8):
        s_unroll = step(s_unroll, sdf, params)
        s_scan = step(s_scan, sdf, scan_params)

    import dataclasses

    # XLA may fuse/reassociate differently inside a scan body than in the
    # unrolled straight-line program, so float equality is numerical
    # (1e-12-level), not guaranteed bitwise; integer/boolean state must
    # still match exactly.
    for f in dataclasses.fields(s_unroll):
        a = np.asarray(getattr(s_unroll, f.name))
        b = np.asarray(getattr(s_scan, f.name))
        if a.dtype.kind in "biu":
            np.testing.assert_array_equal(a, b, err_msg=f.name)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-7, atol=1e-9, err_msg=f.name)
