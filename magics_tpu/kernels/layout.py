"""Layout pinning for TPU gathers.

XLA's layout assignment propagates the Pallas slot kernels' robot-minor
("hot") layout preference through the whole tick program, including onto the
inter-robot message tables. A gather whose operand/result carry that layout
writes one element per lane-position — measured 22 ms for a 78 MB delivery
gather at R=10240, K=24 versus 0.09 ms for the identical gather with default
row-major layouts (bench notes, docs/ARCHITECTURE.md §8).

`optimization_barrier` does not influence layout assignment, and JAX exposes
no per-op layout control — but Mosaic custom calls DO fix their operands and
results to default layouts. `layout_pin` is therefore an identity copy
through a trivial Pallas kernel: everything flowing through it is forced
row-major, severing the hot-layout propagation chain exactly at the gather.
The copy costs ~0.2 ms at 78 MB; the pinned gather runs ~9x faster, and the
explicit transposes XLA inserts at the pin boundary are fast bulk
"data formatting" ops instead of scalarised gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def layout_pin(x: jax.Array, row_tile: int = 512) -> jax.Array:
    """Identity with default (row-major) layout forced on input and output.

    No-op on CPU (the interpreter path would just slow tests down, and the
    XLA:CPU backend has no layout pathology to fix).
    """
    if jax.default_backend() == "cpu":
        return x
    n = x.shape[0]
    flat = x.reshape(n, -1)
    m = flat.shape[1]
    pad = (-n) % row_tile
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        _copy_kernel,
        grid=((n + pad) // row_tile,),
        in_specs=[pl.BlockSpec((row_tile, m), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((row_tile, m), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n + pad, m), x.dtype),
    )(flat)
    return out[:n].reshape(x.shape)
