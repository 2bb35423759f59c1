import sys, time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from magics_tpu.core.schedule import ScheduleKind
from magics_tpu.graph import tick as T
from magics_tpu.sim.builder import build_scenario, circle_formation

tag = sys.argv[1]
R = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
over = {}
if "grid" in tag: over.update(grid_cell_size=25.0, grid_capacity=32)
if "pallas" in tag: over.update(use_pallas=True)
speed = 15.0
specs = circle_formation(R, circle_radius=200.0, target_speed=speed)
params, state, sdf = build_scenario(
    specs, target_speed=speed, planning_horizon=5.0, hz=10.0,
    comms_radius=50.0, internal=50, external=10,
    schedule=ScheduleKind.INTERLEAVE_EVENLY, n_slots=8,
    world=(500.0, 500.0), sdf=np.ones((128,128)), dtype=jnp.float32,
    despawn_on_final_waypoint=False, **over)
n_ticks = 20
run = jax.jit(partial(T.run_ticks, n=n_ticks), static_argnums=2)
tc = time.perf_counter()
state = run(state, sdf, params); _ = int(np.asarray(state.tick))
print(f"compile+first: {time.perf_counter()-tc:.1f}s", flush=True)
state = run(state, sdf, params); _ = int(np.asarray(state.tick))
t0 = time.perf_counter()
for _ in range(3):
    state = run(state, sdf, params)
    _ = int(np.asarray(state.tick))
dt = time.perf_counter() - t0
print(f"{tag} R={R}: {3*n_ticks/dt:.2f} ticks/s (x{3*n_ticks/dt/10:.3f} real-time)")
