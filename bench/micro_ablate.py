"""Ablate individual tick systems by monkeypatching them to identity.

step() resolves its helpers through module globals at call time, so replacing
e.g. tick.external_factor_pass with a no-op removes exactly that system from
the compiled program. The time delta vs baseline localises the cost of each
system in the *fused* program (component micro-benchmarks mislead: XLA fuses
and CSEs across systems). Usage:

    python bench/micro_ablate.py [R] [--variants a,b,...]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

from profile_tick import build


def _identity(state, *a, **k):
    return state


# NOTE: under use_pallas=True the internal passes and the external VARIABLE
# pass are inlined in kernels/hot.py (variable_slot + inline delivery) — only
# external_factor_pass still routes through the tick-module globals, so the
# no_ext_var variant is forced onto the use_pallas=False build below (its
# delta is relative to a use_pallas=False baseline, printed separately).
ABLATIONS = {
    "baseline": [],
    "no_ext_factor": ["external_factor_pass"],
    "no_ext_var": ["external_variable_pass"],
    "no_collisions": ["update_collisions", "update_collisions_grid"],
    "no_counts_log": ["update_message_counts", "log_positions"],
    "no_priors": ["update_prior_horizon", "update_prior_current"],
    "no_waypoints_goals": ["check_waypoints", "update_goal_areas"],
    "no_connectivity": ["update_connectivity", "update_connectivity_grid"],
}


def main():
    from magics_tpu.graph import tick as T
    from magics_tpu.kernels import hot as H

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    R = int(args[0]) if args else 1024
    sel = None
    for a in sys.argv[1:]:
        if a.startswith("--variants="):
            sel = a.split("=", 1)[1].split(",")

    params, state0, sdf = build(R, use_pallas=True)
    params_nopallas, _, _ = build(R, use_pallas=False)
    nopallas_variants = {"no_ext_var", "baseline_nopallas"}
    all_ablations = {"baseline": [], "baseline_nopallas": []}
    all_ablations.update(ABLATIONS)
    saved = {}
    results = {}
    for name, victims in all_ablations.items():
        if sel and name not in sel:
            continue
        p = params_nopallas if name in nopallas_variants else params
        for v in victims:
            saved[v] = getattr(T, v)
            setattr(T, v, _identity)
        try:
            run = jax.jit(partial(T.run_ticks, n=20), static_argnums=2)
            state = run(state0, sdf, p)
            _ = int(np.asarray(state.tick))
            state = run(state, sdf, p)
            _ = int(np.asarray(state.tick))
            t0 = time.perf_counter()
            for _ in range(3):
                state = run(state, sdf, p)
                _ = int(np.asarray(state.tick))
            dt = time.perf_counter() - t0
            ms = dt / 60 * 1e3
            results[name] = ms
            base = results.get(
                "baseline_nopallas" if name in nopallas_variants else "baseline"
            )
            delta = (
                f"  (saves {base - ms:+.2f} ms)"
                if base and not name.startswith("baseline")
                else ""
            )
            print(f"{name:22s} {ms:8.2f} ms/tick{delta}", flush=True)
        finally:
            for v, fn in saved.items():
                setattr(T, v, fn)
            saved.clear()


if __name__ == "__main__":
    main()
