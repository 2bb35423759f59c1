import sys, time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from magics_tpu.core.schedule import ScheduleKind
from magics_tpu.graph import tick as T
from magics_tpu.sim.builder import build_scenario, circle_formation

R = 1024
speed = 15.0
def mk(internal, external, **over):
    specs = circle_formation(R, circle_radius=200.0, target_speed=speed)
    return build_scenario(
        specs, target_speed=speed, planning_horizon=5.0, hz=10.0,
        comms_radius=50.0, internal=internal, external=external,
        schedule=ScheduleKind.INTERLEAVE_EVENLY, n_slots=8,
        world=(500.0, 500.0), sdf=np.ones((128,128)), dtype=jnp.float32,
        despawn_on_final_waypoint=False, **over)

def timeit(tag, internal, external, **over):
    params, state, sdf = mk(internal, external, **over)
    run = jax.jit(partial(T.run_ticks, n=20), static_argnums=2)
    state = run(state, sdf, params); _ = int(np.asarray(state.tick))
    t0 = time.perf_counter()
    for _ in range(2):
        state = run(state, sdf, params); _ = int(np.asarray(state.tick))
    dt = (time.perf_counter()-t0)/40
    print(f"{tag}: {dt*1e3:.1f} ms/tick", flush=True)

timeit("no GBP (chassis only)", 0, 0)
timeit("50 internal XLA", 50, 0)
timeit("10 external only", 1, 10)   # ~1 internal to keep schedule sane
timeit("50i+10e XLA", 50, 10)
