"""Checkpoint / resume of the dense simulation state.

The reference has no real checkpointing — its nearest equivalents are
scenario hot-reload (simulation_loader.rs:687-713) and the JSON export
snapshot (export.rs). With the whole simulation as one pytree of dense
arrays, checkpointing is a single npz write; `save` captures every SimState
leaf plus the tick/PRNG, `load` restores it bit-exactly, so a resumed run
continues deterministically.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from magics_tpu.graph.state import SimState

_FORMAT_VERSION = 1


def save(path: str | Path, state: SimState, *, meta: dict | None = None) -> None:
    """Write the full SimState (and optional JSON-able metadata) to npz."""
    arrays = {
        f.name: np.asarray(getattr(state, f.name))
        for f in dataclasses.fields(state)
    }
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"version": _FORMAT_VERSION, **(meta or {})}).encode(),
        dtype=np.uint8,
    )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as fh:
        np.savez_compressed(fh, **arrays)


def load(path: str | Path) -> tuple[SimState, dict]:
    """Read (state, meta) back. Arrays are restored with their saved dtypes."""
    with np.load(Path(path)) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        if meta.get("version") != _FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version: {meta.get('version')}")
        kwargs = {
            f.name: jnp.asarray(data[f.name])
            for f in dataclasses.fields(SimState)
        }
    return SimState(**kwargs), meta
