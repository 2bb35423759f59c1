"""Hot-layout adapter + GBP iteration driver for the fused Pallas slot.

"Hot layout" puts the robot axis LAST (lanes) and component axes first, so
the Pallas slot kernel (kernels/gbp_slot.py) sees every scalar field as a
[V, R] tile. The dense SimState (graph/state.py) is transposed into this
layout once per tick, the iteration schedule runs with ONE Pallas launch per
internal slot (plus a handful of XLA ops for the SDF taps), and the state is
transposed back at the end.

External slots are rarer (e.g. 10 external vs 50 internal per tick in the
Circle Experiment, config.toml:49-52) and involve cross-robot gathers that do
not vectorise across lanes, so they reuse the existing XLA passes
(graph/tick.py:external_factor_pass / external_variable_pass) on the normal
layout, with belief/snapshot planes shuttled between layouts around them.
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp

from magics_tpu.core.constants import TRACKING_SKIP_FIRST_N_FACTOR_ITERS
from magics_tpu.graph import factors as F
from magics_tpu.graph.state import GbpParams, SimState
from magics_tpu.kernels.gbp_slot import SlotParams, internal_slot, variable_slot


def _pad_r(x: jax.Array, rp: int) -> jax.Array:
    """Pad the last axis (robots) to rp."""
    R = x.shape[-1]
    if R == rp:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, rp - R)]
    return jnp.pad(x, pad)


def to_hot(state: SimState, params: GbpParams, r_tile: int) -> dict:
    """Transpose the slot-kernel fields into hot layout, padded to r_tile."""
    R = state.n_robots
    rp = -(-R // r_tile) * r_tile
    f = state.prior_mean.dtype

    def t3(x):  # [R, V, 4] -> [4, V, R]
        return _pad_r(jnp.transpose(x, (2, 1, 0)), rp)

    def t4(x):  # [R, V, 4, 4] -> [4, 4, V, R]
        return _pad_r(jnp.transpose(x, (2, 3, 1, 0)), rp)

    def t3s(x):  # [R, V1, 2, 4] -> [2, 4, V1, R]
        return _pad_r(jnp.transpose(x, (2, 3, 1, 0)), rp)

    def t4s(x):  # [R, V1, 2, 4, 4] -> [2, 4, 4, V1, R]
        return _pad_r(jnp.transpose(x, (2, 3, 4, 1, 0)), rp)

    def t2(x):  # [R, V] -> [V, R]
        return _pad_r(jnp.transpose(x), rp)

    ts = jnp.asarray(params.variable_timesteps, dtype=f)
    gaps = ts[1:] - ts[:-1]  # [V-1]
    delta_t = gaps[:, None] * _pad_r(state.t0[None, :], rp)  # [V1, R]

    hot = {
        "belief_eta": t3(state.belief_eta),
        "belief_lam": t4(state.belief_lam),
        "belief_mean": t3(state.belief_mean),
        "snap_eta": t3(state.snap_eta),
        "snap_lam": t4(state.snap_lam),
        "snap_mu": t3(state.snap_mu),
        "prior_mean": t3(state.prior_mean),
        "prior_sigma": t2(state.prior_sigma),
        "delta_t": delta_t,
        "dyn_v2f_eta": t3s(state.dyn_v2f_eta),
        "dyn_v2f_lam": t4s(state.dyn_v2f_lam),
        "dyn_v2f_mu": t3s(state.dyn_v2f_mu),
        "dyn_f2v_eta": t3s(state.dyn_f2v_eta),
        "dyn_f2v_lam": t4s(state.dyn_f2v_lam),
        "obs_v2f_mu": t3(state.obs_v2f_mu),
        "obs_f2v_eta": t3(state.obs_f2v_eta),
        "obs_f2v_lam": t4(state.obs_f2v_lam),
        "trk_v2f_mu": t3(state.trk_v2f_mu),
        "trk_f2v_eta": t3(state.trk_f2v_eta),
        "trk_f2v_lam": t4(state.trk_f2v_lam),
        "trk_record": _pad_r(jnp.transpose(state.trk_record), rp),
        "trk_timeout": _pad_r(jnp.transpose(state.trk_timeout), rp),
        "trk_last_pos": t3(state.trk_last_pos),
        "trk_last_val": _pad_r(jnp.transpose(state.trk_last_val), rp),
        "path_x": _pad_r(jnp.transpose(state.trk_path[..., 0]), rp),
        "path_y": _pad_r(jnp.transpose(state.trk_path[..., 1]), rp),
        "path_len": _pad_r(state.trk_path_len[None, :], rp),
    }
    return hot


def _snap_to_state(state: SimState, hot: dict) -> SimState:
    """Copy the hot snapshot planes back into the normal layout — all the
    external FACTOR pass reads from the variables' side (the internal cavity
    and linearisation point; beliefs themselves stay hot)."""
    R = state.n_robots
    return replace(
        state,
        snap_eta=jnp.transpose(hot["snap_eta"][..., :R], (2, 1, 0)),
        snap_lam=jnp.transpose(hot["snap_lam"][..., :R], (3, 2, 0, 1)),
        snap_mu=jnp.transpose(hot["snap_mu"][..., :R], (2, 1, 0)),
    )


def merge_state(state: SimState, hot: dict, iter_count: jax.Array) -> SimState:
    """Final merge: hot planes -> normal layout fields."""
    R = state.n_robots

    def u3(x):
        return jnp.transpose(x[..., :R], (2, 1, 0))

    def u4(x):
        return jnp.transpose(x[..., :R], (3, 2, 0, 1))

    def u3s(x):  # [2, 4, V1, R] -> [R, V1, 2, 4]
        return jnp.transpose(x[..., :R], (3, 2, 0, 1))

    def u4s(x):  # [2, 4, 4, V1, R] -> [R, V1, 2, 4, 4]
        return jnp.transpose(x[..., :R], (4, 3, 0, 1, 2))

    return replace(
        state,
        belief_eta=u3(hot["belief_eta"]),
        belief_lam=u4(hot["belief_lam"]),
        belief_mean=u3(hot["belief_mean"]),
        snap_eta=u3(hot["snap_eta"]),
        snap_lam=u4(hot["snap_lam"]),
        snap_mu=u3(hot["snap_mu"]),
        dyn_v2f_eta=u3s(hot["dyn_v2f_eta"]),
        dyn_v2f_lam=u4s(hot["dyn_v2f_lam"]),
        dyn_v2f_mu=u3s(hot["dyn_v2f_mu"]),
        dyn_f2v_eta=u3s(hot["dyn_f2v_eta"]),
        dyn_f2v_lam=u4s(hot["dyn_f2v_lam"]),
        obs_v2f_mu=u3(hot["obs_v2f_mu"]),
        obs_f2v_eta=u3(hot["obs_f2v_eta"]),
        obs_f2v_lam=u4(hot["obs_f2v_lam"]),
        trk_v2f_mu=u3(hot["trk_v2f_mu"]),
        trk_f2v_eta=u3(hot["trk_f2v_eta"]),
        trk_f2v_lam=u4(hot["trk_f2v_lam"]),
        trk_record=jnp.transpose(hot["trk_record"][..., :R]),
        trk_timeout=jnp.transpose(hot["trk_timeout"][..., :R]),
        trk_last_pos=u3(hot["trk_last_pos"]),
        trk_last_val=jnp.transpose(hot["trk_last_val"][..., :R]),
        iter_count_factor=iter_count,
    )


def _ext_sum_hot(state: SimState, rp: int) -> tuple[jax.Array, jax.Array]:
    """Sum the external inboxes (compact rank-1) over slots and lift to hot
    layout, padded to cover all V variables (external factors touch vars
    1..V-1)."""
    from magics_tpu.graph.factors import rank1_sum

    eta, lam = rank1_sum(state.ext_inbox, axis=1)  # [R, V1, 4], [R, V1, 4, 4]
    eta_h = _pad_r(jnp.transpose(eta, (2, 1, 0)), rp)  # [4, V1, R]
    lam_h = _pad_r(jnp.transpose(lam, (2, 3, 1, 0)), rp)
    z3 = jnp.zeros(eta_h.shape[:1] + (1,) + eta_h.shape[2:], eta_h.dtype)
    z4 = jnp.zeros(lam_h.shape[:2] + (1,) + lam_h.shape[3:], lam_h.dtype)
    return (
        jnp.concatenate([z3, eta_h], axis=1),
        jnp.concatenate([z4, lam_h], axis=2),
    )


def iterate_gbp_hot(
    state: SimState, sdf: jax.Array, params: GbpParams, *,
    r_tile: int = 128, interpret: bool = False, comm=None,
) -> SimState:
    """`iterate_gbp_v2` on the hot layout with the fused Pallas internal slot.

    The schedule is unrolled statically: every internal slot is one Pallas
    launch (plus the SDF tap gather); external slots run the XLA passes.
    """
    from magics_tpu.graph import tick as T
    from magics_tpu.parallel.comm import LOCAL

    if comm is None:
        comm = LOCAL
    if not params.schedule:
        return state

    R = state.n_robots
    rp = -(-R // r_tile) * r_tile
    V = params.n_vars
    f = state.prior_mean.dtype

    sp = SlotParams(
        n_vars=V,
        max_waypoints=params.max_waypoints,
        sigma_dynamics=params.sigma_factor_dynamics,
        sigma_obstacle=params.sigma_factor_obstacle,
        sigma_tracking=params.sigma_factor_tracking,
        obstacle_delta=F.obstacle_delta(params.sdf_shape, (params.world_width, params.world_height)),
        switch_padding=params.tracking_switch_padding,
        attraction_distance=params.tracking_attraction_distance,
        dynamic_enabled=params.dynamic_enabled,
        obstacle_enabled=params.obstacle_enabled,
        tracking_enabled=params.tracking_enabled,
        rtol=1e-4 if f == jnp.float32 else 1e-12,
    )

    hot = to_hot(state, params, r_tile)
    st = state
    ic = state.iter_count_factor
    gate_r = st.active & (st.mission_active | st.completed)  # [R]
    gate_h = _pad_r(gate_r.astype(f)[None, :], rp)  # [1, rp]
    world = (params.world_width, params.world_height)

    ext_sum = _ext_sum_hot(st, rp)
    ext_dirty = False

    for i_flag, e_flag in params.schedule:
        if i_flag:
            if ext_dirty:
                ext_sum = _ext_sum_hot(st, rp)
                ext_dirty = False
            tgate_r = gate_r & (ic >= TRACKING_SKIP_FIRST_N_FACTOR_ITERS)
            tgate_h = _pad_r(tgate_r.astype(f)[None, :], rp)
            # SDF taps in XLA (lane-crossing gather), hot orientation [V2, R]
            mu_n = jnp.moveaxis(hot["obs_v2f_mu"], 0, -1)  # [V2, R, 4]
            h0, hx, hy = F.obstacle_taps(mu_n, sdf, world, dtype=f)
            outs = internal_slot(
                {
                    **hot,
                    "gate": gate_h,
                    "tgate": tgate_h,
                    "obs_h0": h0,
                    "obs_hx": hx,
                    "obs_hy": hy,
                    "ext_sum_eta": ext_sum[0],
                    "ext_sum_lam": ext_sum[1],
                },
                sp,
                r_tile=r_tile,
                interpret=interpret,
            )
            hot = {**hot, **outs}
            ic = ic + gate_r.astype(jnp.int32)
            # internal variable pass also seeds own inter-robot factor inboxes
            # (state.py module doc; internal_variable_pass in graph/tick.py)
            if params.interrobot_enabled:
                if params.ext_exchange != "sender":
                    # receiver-computes: mirror the PEER's seeded flag
                    # (graph/tick.py internal_variable_pass)
                    gate_all = comm.all_robots(gate_r)
                    src = jnp.clip(st.nbr_idx, 0, gate_all.shape[0] - 1)
                    st = replace(
                        st,
                        ir_int_seeded=jnp.where(
                            (gate_all[src] & st.nbr_has_back)[..., None],
                            True,
                            st.ir_int_seeded,
                        ),
                    )
                else:
                    st = replace(
                        st,
                        ir_int_seeded=jnp.where(
                            gate_r[:, None, None] & st.nbr_mask[:, :, None],
                            True,
                            st.ir_int_seeded,
                        ),
                    )
        if e_flag and params.interrobot_enabled:
            # ---- external factor pass: XLA on the compact rank-1 state ----
            st = _snap_to_state(st, hot)
            st = replace(st, iter_count_factor=ic)
            st = T.external_factor_pass(st, params, comm)
            ic = st.iter_count_factor

            # ---- external variable pass: belief update in the Pallas
            # variable-only kernel on the hot planes ----
            ext_gate_r = st.active & st.antenna & (st.mission_active | st.completed)
            ext_gate_h = _pad_r(ext_gate_r.astype(f)[None, :], rp)
            ext_sum = _ext_sum_hot(st, rp)
            ext_dirty = False
            outs = variable_slot(
                {
                    "gate": ext_gate_h,
                    "belief_eta": hot["belief_eta"],
                    "belief_lam": hot["belief_lam"],
                    "belief_mean": hot["belief_mean"],
                    "prior_mean": hot["prior_mean"],
                    "prior_sigma": hot["prior_sigma"],
                    "dyn_f2v_eta": hot["dyn_f2v_eta"],
                    "dyn_f2v_lam": hot["dyn_f2v_lam"],
                    "obs_f2v_eta": hot["obs_f2v_eta"],
                    "obs_f2v_lam": hot["obs_f2v_lam"],
                    "trk_f2v_eta": hot["trk_f2v_eta"],
                    "trk_f2v_lam": hot["trk_f2v_lam"],
                    "ext_sum_eta": ext_sum[0],
                    "ext_sum_lam": ext_sum[1],
                },
                sp,
                r_tile=r_tile,
                interpret=interpret,
            )
            hot = {**hot, **outs}

            # ---- response delivery (robot.rs:1843-1858): the factor only
            # uses the responder's belief mean position (graph/tick.py) ----
            from magics_tpu.kernels.layout import layout_pin

            if params.ext_exchange == "sender":
                bm_pos = comm.all_robots(
                    jnp.transpose(hot["belief_mean"][:2, 1:, :R], (2, 1, 0))
                )  # [R_total, V-1, 2]
            has_back = st.nbr_has_back
            gate_all = comm.all_robots(ext_gate_r)
            src = jnp.clip(st.nbr_idx, 0, gate_all.shape[0] - 1)
            deliver = (
                ext_gate_r[:, None]
                & st.nbr_mask
                & gate_all[src]
                & has_back
            )[..., None]
            if params.ext_exchange != "sender":
                # receiver-computes mirror: write OWN belief positions under
                # the (symmetric) deliver mask — no gather at all
                # (graph/tick.py external_variable_pass)
                own_pos = jnp.transpose(
                    hot["belief_mean"][:2, 1:, :R], (2, 1, 0)
                )  # [R, V-1, 2]
                st = replace(
                    st,
                    ir_v2f_ext_pos=jnp.where(
                        deliver[..., None], own_pos[:, None], st.ir_v2f_ext_pos
                    ),
                )
            else:
                # row-major pin on both sides of the gather (kernels/layout.py):
                # the hot planes otherwise push a robot-minor layout onto it and
                # the per-slot row gather scalarises
                Vm1 = bm_pos.shape[1]
                flat_pos = layout_pin(bm_pos.reshape(bm_pos.shape[0], -1))
                picked = layout_pin(flat_pos[src.reshape(-1)]).reshape(
                    src.shape + (Vm1, 2)
                )
                in_pos = jnp.where(
                    (st.nbr_mask)[..., None, None], picked, 0
                )
                st = replace(
                    st,
                    ir_v2f_ext_pos=jnp.where(
                        deliver[..., None], in_pos, st.ir_v2f_ext_pos
                    ),
                )

    return merge_state(st, hot, ic)
