"""Microbenchmark of the fused internal GBP slot in isolation.

Times a chain of N dependent internal slots (outputs feeding inputs, like the
real schedule) for several r_tile values, plus the XLA obstacle-tap gather, to
localise where the per-slot time goes. Usage:

    python bench/profile_slot.py [R] [N] [--tiles=128,256,512]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    R = int(args[0]) if args else 1024
    N = int(args[1]) if len(args) > 1 else 50
    tiles = [128, 256, 512]
    for a in sys.argv[1:]:
        if a.startswith("--tiles="):
            tiles = [int(x) for x in a.split("=", 1)[1].split(",")]

    from magics_tpu.graph import factors as F
    from magics_tpu.kernels.gbp_slot import SlotParams, internal_slot
    from magics_tpu.kernels.hot import to_hot
    from magics_tpu.sim.builder import build_scenario, circle_formation

    speed = 15.0
    specs = circle_formation(R, circle_radius=200.0, target_speed=speed)
    params, state, sdf = build_scenario(
        specs, target_speed=speed, planning_horizon=5.0, hz=10.0,
        comms_radius=50.0, internal=1, external=0, n_slots=8,
        world=(500.0, 500.0), sdf=np.ones((128, 128)), dtype=jnp.float32,
    )
    V = params.n_vars
    world = (params.world_width, params.world_height)

    sp = SlotParams(
        n_vars=V,
        max_waypoints=params.max_waypoints,
        sigma_dynamics=params.sigma_factor_dynamics,
        sigma_obstacle=params.sigma_factor_obstacle,
        sigma_tracking=params.sigma_factor_tracking,
        obstacle_delta=F.obstacle_delta(params.sdf_shape, world),
        switch_padding=params.tracking_switch_padding,
        attraction_distance=params.tracking_attraction_distance,
    )

    def bench(name, fn, *inputs):
        g = jax.jit(fn)
        out = g(*inputs)
        jax.block_until_ready(out)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])[..., :1]
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = g(*inputs)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0])[..., :1]
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:34s} {dt * 1e3 / N:8.3f} ms/slot  ({dt * 1e3:7.1f} ms total)")

    for r_tile in tiles:
        rp = -(-R // r_tile) * r_tile
        hot = to_hot(state, params, r_tile)
        f = jnp.float32
        gate = jnp.ones((1, rp), f)
        ext_eta = jnp.zeros((4, V, rp), f)
        ext_lam = jnp.zeros((4, 4, V, rp), f)

        def chain(hot, _rt=r_tile):
            h = dict(hot)
            for _ in range(N):
                mu_n = jnp.moveaxis(h["obs_v2f_mu"], 0, -1)
                h0, hx, hy = F.obstacle_taps(mu_n, sdf, world, dtype=f)
                outs = internal_slot(
                    {**h, "gate": gate, "tgate": gate,
                     "obs_h0": h0, "obs_hx": hx, "obs_hy": hy,
                     "ext_sum_eta": ext_eta, "ext_sum_lam": ext_lam},
                    sp, r_tile=_rt,
                )
                h = {**h, **outs}
            return h["belief_mean"]

        def chain_notaps(hot, _rt=r_tile):
            h = dict(hot)
            z = jnp.zeros((V - 2, rp), f)
            for _ in range(N):
                outs = internal_slot(
                    {**h, "gate": gate, "tgate": gate,
                     "obs_h0": z, "obs_hx": z, "obs_hy": z,
                     "ext_sum_eta": ext_eta, "ext_sum_lam": ext_lam},
                    sp, r_tile=_rt,
                )
                h = {**h, **outs}
            return h["belief_mean"]

        bench(f"slot chain r_tile={r_tile}", chain, hot)
        bench(f"slot chain r_tile={r_tile} no-taps", chain_notaps, hot)


if __name__ == "__main__":
    main()
