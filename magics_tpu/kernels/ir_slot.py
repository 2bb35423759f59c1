"""Fused Pallas TPU kernel for the inter-robot (external) factor update.

`graph.factors.interrobot_rank1_messages` is mathematically tiny — per
factor: a 4x4 row-scaled inverse, two dot products, a handful of scalars —
but its XLA lowering materialises [R, K, V-1, 4, 4] intermediates (the
K-broadcast cavity, M, M^-1, the adjugate): ~170 MB each at R=16k, K=8,
V=21, turning a ~0.5 ms-of-HBM-traffic stage into the tick's hotspot
(bench/profile_tick.py ablations). This kernel computes the whole message
table in one Pallas program: the 4x4 algebra unrolls over plane lists (the
gbp_slot.py idiom) so nothing larger than a [V-1, r_tile] tile ever exists,
and the cavity planes are read once per (k, tile) from the shared snapshot
block instead of being broadcast through HBM.

Math and guards are copied verbatim from factors.interrobot_rank1_messages
(itself cited to interrobot.rs:121-161, 213-226) — the Pallas and XLA paths
are interchangeable to float roundoff (tests/test_ir_slot.py).

Layout: grid (K, R/r_tile); blocks are [V1, r_tile] planes. The snapshot
(cavity) blocks index-map ignoring k — every neighbour slot reads the same
variable snapshot, so the broadcast happens in VMEM, not HBM.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from magics_tpu.kernels.gbp_slot import _inv4_rowscaled


@dataclasses.dataclass(frozen=True)
class IrParams:
    n_slots: int       # K
    n_vars: int        # V (chain variables; factors live on V-1 positions)
    sigma: float       # sigma_factor_interrobot
    rtol: float        # negligible-message floor (matches factors.py)


def _ir_kernel(p: IrParams, *refs):
    (
        seeded_ref,   # [1, V1, Rt] 0/1
        pext_ref,     # [2, 1, V1, Rt]
        snap_mu_ref,  # [4, V1, Rt]
        snap_eta_ref, # [4, V1, Rt]
        snap_lam_ref, # [4, 4, V1, Rt]
        safety_ref,   # [1, Rt]
        gids_ref,     # [1, Rt]
        out_ref,      # [4, 1, V1, Rt]
    ) = refs

    V1 = p.n_vars - 1
    k = pl.program_id(0)
    f = out_ref.dtype

    seeded = seeded_ref[0]                       # [V1, Rt]
    px = pext_ref[0, 0]
    py = pext_ref[1, 0]
    mu = [snap_mu_ref[i] * seeded for i in range(4)]
    cav_eta = [snap_eta_ref[i] * seeded for i in range(4)]
    cav_lam = [[snap_lam_ref[i, j] * seeded for j in range(4)] for i in range(4)]
    safety = safety_ref[0][None, :]              # [1, Rt] broadcasts over V1
    gid = gids_ref[0][None, :]

    # per-factor symmetry-breaking offset (graph/tick.py external_factor_pass)
    # (compiled Pallas requires integer iota; cast after)
    i_idx = jax.lax.broadcasted_iota(jnp.int32, seeded.shape, 0).astype(f)
    tiny = jnp.asarray(1e-6, f) * (
        gid * (p.n_slots * V1) + k.astype(f) * V1 + i_idx + 1.0
    )

    dx = mu[0] - px
    dy = mu[1] - py
    dist2_raw = dx * dx + dy * dy
    skipped = dist2_raw >= safety * safety

    ox = dx + tiny
    oy = dy + tiny
    r = jnp.sqrt(ox * ox + oy * oy)
    within = r <= safety

    zero = jnp.zeros_like(r)
    h0 = jnp.where(within, 1.0 - r / safety, zero)
    safe_r = jnp.where(r > 0, r, 1.0)
    gx = jnp.where(within, -ox / (safety * safe_r), zero)
    gy = jnp.where(within, -oy / (safety * safe_r), zero)

    alpha = jnp.asarray(1.0 / (p.sigma * p.sigma), f)
    jx0 = gx * dx + gy * dy
    resid = jx0 - h0

    g4 = [gx, gy, zero, zero]
    M = [
        [alpha * g4[i] * g4[j] + cav_lam[i][j] for j in range(4)]
        for i in range(4)
    ]
    M_inv, det = _inv4_rowscaled(M)
    Mg = [sum(M_inv[i][j] * g4[j] for j in range(4)) for i in range(4)]
    q = sum(g4[i] * Mg[i] for i in range(4))
    w = sum(Mg[i] * (alpha * resid * g4[i] + cav_eta[i]) for i in range(4))

    s = alpha * (1.0 - alpha * q)
    t = alpha * (w - resid)

    gmax2 = jnp.maximum(jnp.abs(gx), jnp.abs(gy)) ** 2
    finite = jnp.isfinite(s) & jnp.isfinite(t)
    sane = jnp.abs(s) * gmax2 <= 4.0 * alpha * gmax2 + 1.0
    negligible = jnp.abs(s) * gmax2 <= p.rtol * alpha * gmax2
    valid = (jnp.abs(det) > 1e-6) & finite & sane & ~negligible & ~skipped

    ok = valid.astype(f)
    out_ref[0, 0] = gx * ok
    out_ref[1, 0] = gy * ok
    out_ref[2, 0] = t * ok
    out_ref[3, 0] = s * ok


def interrobot_slot(
    seeded: jax.Array,    # [K, V1, R] (any dtype castable to f)
    p_ext: jax.Array,     # [2, K, V1, R]
    snap_mu: jax.Array,   # [4, V1, R]  (variables 1..V-1)
    snap_eta: jax.Array,  # [4, V1, R]
    snap_lam: jax.Array,  # [4, 4, V1, R]
    safety: jax.Array,    # [1, R]
    gids: jax.Array,      # [1, R]
    p: IrParams,
    *,
    r_tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Returns the compact rank-1 message table [4, K, V1, R]."""
    K, V1, R = seeded.shape
    assert R % r_tile == 0, (R, r_tile)
    grid = (K, R // r_tile)

    def spec(arr, *, per_k: bool):
        lead = arr.shape[:-1]
        nlead = len(lead)
        if per_k:
            # one block per (k, r): size 1 along the K axis
            k_axis = nlead - 2  # [..., K, V1, R]
            block = tuple(
                1 if ax == k_axis else lead[ax] for ax in range(nlead)
            ) + (r_tile,)

            def index_map(k, r, _n=nlead, _ka=k_axis):
                return tuple(k if ax == _ka else 0 for ax in range(_n)) + (r,)
        else:
            block = lead + (r_tile,)

            def index_map(k, r, _n=nlead):
                return (0,) * _n + (r,)

        return pl.BlockSpec(block, index_map)

    f = snap_mu.dtype
    inputs = [
        seeded.astype(f), p_ext, snap_mu, snap_eta, snap_lam, safety, gids,
    ]
    in_specs = [
        spec(inputs[0], per_k=True),
        spec(inputs[1], per_k=True),
        spec(inputs[2], per_k=False),
        spec(inputs[3], per_k=False),
        spec(inputs[4], per_k=False),
        spec(inputs[5], per_k=False),
        spec(inputs[6], per_k=False),
    ]
    out_shape = jax.ShapeDtypeStruct((4, K, V1, R), f)
    out_spec = spec(jnp.zeros((4, K, V1, R), f), per_k=True)

    return pl.pallas_call(
        partial(_ir_kernel, p),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)


def interrobot_messages_pallas(
    state, params, *, r_tile: int = 128, interpret: bool = False, comm=None
) -> jax.Array:
    """Drop-in replacement for the message-math section of
    tick.external_factor_pass: returns msg [R, K, V1, 4] in normal layout.

    Transposes the inputs into plane layout (cheap: the big table p_ext is
    [R, K, V1, 2]), runs the fused kernel, and transposes the result back.
    """
    from magics_tpu.parallel.comm import LOCAL

    if comm is None:
        comm = LOCAL
    R, K = state.nbr_idx.shape
    V = state.prior_mean.shape[1]
    V1 = V - 1
    f = state.prior_mean.dtype
    rp = -(-R // r_tile) * r_tile

    def pad_r(x):
        if x.shape[-1] == rp:
            return x
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, rp - x.shape[-1])])

    seeded = pad_r(jnp.transpose(state.ir_int_seeded, (1, 2, 0)))      # [K,V1,R]
    p_ext = pad_r(jnp.transpose(state.ir_v2f_ext_pos, (3, 1, 2, 0)))  # [2,K,V1,R]
    snap_mu = pad_r(jnp.transpose(state.snap_mu[:, 1:], (2, 1, 0)))    # [4,V1,R]
    snap_eta = pad_r(jnp.transpose(state.snap_eta[:, 1:], (2, 1, 0)))
    snap_lam = pad_r(jnp.transpose(state.snap_lam[:, 1:], (2, 3, 1, 0)))
    safety = pad_r(
        (params.safety_distance_multiplier * state.radius)[None, :].astype(f)
    )
    gids = pad_r(comm.row_ids(R).astype(f)[None, :])

    p = IrParams(
        n_slots=K,
        n_vars=V,
        sigma=params.sigma_factor_interrobot,
        rtol=1e-4 if f == jnp.float32 else 1e-12,
    )
    msg_h = interrobot_slot(
        seeded, p_ext, snap_mu, snap_eta, snap_lam, safety, gids, p,
        r_tile=r_tile, interpret=interpret,
    )  # [4, K, V1, rp]
    return jnp.transpose(msg_h[..., :R], (3, 1, 2, 0))  # [R, K, V1, 4]
