"""A direct, slow, per-robot numpy implementation of the reference's GBP
algorithm, used as the parity oracle for the dense batched implementation.

This mirrors crates/magics/src/factorgraph/* semantics one-to-one:
  * per-variable dict inboxes ordered like the BTreeMap (by (graph, node) id)
  * Message = None (empty) or (eta, lam, mu)
  * FactorNode::update (factor/mod.rs:334-454) with skip -> empty messages
  * VariableNode::update_belief_and_create_factor_responses
    (variable.rs:251-342)
  * marginalise_factor_distance (Schur) with the unary shortcut
  * iterate_gbp_v2 internal/external pass structure (robot.rs:1769-1861)
  * horizon/current prior updates (robot.rs:2182-2338)

Only implements what's needed for parity testing: dynamic, obstacle,
tracking and inter-robot factors for a fixed set of robots (no spawning, no
despawn inside the compared window unless triggered).
"""

from __future__ import annotations

import numpy as np

DOFS = 4

_marg_jit = None
_cov_jit = None


def _empty():
    return None


class Msg:
    __slots__ = ("eta", "lam", "mu")

    def __init__(self, eta, lam, mu):
        self.eta = np.asarray(eta, dtype=np.float64)
        self.lam = np.asarray(lam, dtype=np.float64)
        self.mu = np.asarray(mu, dtype=np.float64)


def marginalise(eta, lam, idx):
    """marginalise_factor_distance.rs:55-127; returns Msg or None (empty).

    The 4x4 Schur step delegates to the production kernel
    (magics_tpu.core.linalg.marginalize_two_block) so that the oracle and the
    dense implementation resolve the knife-edge "is lam_bb singular?" question
    identically — the reference's pure-Rust determinant lands on one side or
    the other of exact zero depending on roundoff, and a variable that has not
    yet accumulated precision sits exactly on that edge at start-up. The
    *structure* of the algorithm (what this oracle exists to check) is
    unaffected.
    """
    import jax

    from magics_tpu.core.linalg import marginalize_two_block

    global _marg_jit
    if _marg_jit is None:
        _marg_jit = jax.jit(marginalize_two_block)

    n = eta.shape[0]
    if n == DOFS:
        return Msg(eta, lam, np.zeros(DOFS))
    sl_a = slice(idx, idx + DOFS)
    sl_b = slice(DOFS, n) if idx == 0 else slice(0, idx)
    m_eta, m_lam, valid = _marg_jit(
        eta[sl_a].copy(),
        eta[sl_b].copy(),
        lam[sl_a, sl_a].copy(),
        lam[sl_a, sl_b].copy(),
        lam[sl_b, sl_a].copy(),
        lam[sl_b, sl_b].copy(),
    )
    if not bool(valid):
        return None
    return Msg(np.asarray(m_eta), np.asarray(m_lam), np.zeros(DOFS))


class Variable:
    def __init__(self, vid, mean, sigma):
        self.vid = vid  # (robot, index) — sort key
        if not np.isfinite(sigma):
            sigma = 0.0
        self.prior_lam = np.eye(DOFS) * sigma
        self.prior_eta = self.prior_lam @ mean
        self.eta = self.prior_eta.copy()
        self.lam = self.prior_lam.copy()
        self.mean = np.asarray(mean, dtype=np.float64).copy()
        self.inbox: dict = {}  # factor id -> Msg | None

    def prepare_message(self):
        return Msg(self.eta, self.lam, self.mean)

    def change_prior(self, mean):
        self.prior_eta = self.prior_lam @ mean
        self.mean = np.asarray(mean, dtype=np.float64).copy()
        out = {}
        for fid in self.inbox:
            out[fid] = Msg(self.eta, self.lam, self.mean)
        for fid in self.inbox:
            self.inbox[fid] = None
        return out

    def update_belief(self):
        self.eta = self.prior_eta.copy()
        self.lam = self.prior_lam.copy()
        for msg in self.inbox.values():
            if msg is None:
                continue
            self.eta = self.eta + msg.eta
            self.lam = self.lam + msg.lam
        if np.any(self.lam - 1e-6 > 0.0):
            # shared inversion + validity rule (see marginalise docstring)
            import jax

            import tests.oracle as _o
            from magics_tpu.core.linalg import belief_covariance

            if _o._cov_jit is None:
                _o._cov_jit = jax.jit(belief_covariance)
            cov, ok = _o._cov_jit(self.lam)
            if bool(ok):
                self.mean = np.asarray(cov) @ self.eta
        out = {}
        for fid, msg in sorted(self.inbox.items()):
            if msg is None:
                out[fid] = self.prepare_message()
            else:
                out[fid] = Msg(self.eta - msg.eta, self.lam - msg.lam, self.mean - msg.mu)
        return out


class Factor:
    """kind in {'dynamic', 'obstacle', 'tracking', 'interrobot'}."""

    def __init__(self, kind, fid, sigma, z, **kw):
        self.kind = kind
        self.fid = fid
        self.z = np.asarray(z, dtype=np.float64)
        self.lam_m = np.eye(len(self.z)) / sigma**2
        self.inbox: dict = {}  # variable id -> Msg | None
        self.kw = kw
        if kind == "dynamic":
            dt = kw["delta_t"]
            qc_inv = sigma**-2 * np.eye(2)
            self.lam_m = np.block(
                [
                    [12.0 * dt**-3 * qc_inv, -6.0 * dt**-2 * qc_inv],
                    [-6.0 * dt**-2 * qc_inv, (4.0 / dt) * qc_inv],
                ]
            )
            e = np.eye(2)
            zz = np.zeros((2, 2))
            self.J = np.block([[e, dt * e, -e, zz], [zz, e, zz, -e]])
        if kind == "tracking":
            self.record = 0
            self.index = 1
            self.timeout = None
            self.last_pos = np.asarray(kw.get("last_pos", np.zeros(2)), dtype=np.float64)
            self.last_val = 0.0
        self.lin_point = np.zeros(DOFS * (2 if kind in ("dynamic", "interrobot") else 1))

    # -- measurement / jacobian per kind ------------------------------------

    def skip(self):
        if self.kind == "interrobot":
            x = self.lin_point
            d = x[:2] - x[4:6]
            return float(d @ d) >= self.kw["safety"] ** 2
        if self.kind == "tracking":
            if self.timeout is not None:
                if self.timeout == 0:
                    self.timeout = None
                else:
                    self.timeout -= 1
                    return True
            path = self.kw["path"]
            if path is None or len(path) < 2 or self.record >= len(path) - 1:
                return True
            return False
        return False

    def measure(self, x):
        if self.kind == "dynamic":
            return self.J @ x
        if self.kind == "obstacle":
            sdf = self.kw["sdf"]  # [H, W] floats in [0, 1]
            ww, wh = self.kw["world"]
            H, W = sdf.shape
            xf = (x[0] + ww / 2.0) * (W / ww)
            yf = (-x[1] + wh / 2.0) * (H / wh)
            xi = int(max(xf, 0.0))
            yi = int(max(yf, 0.0))
            if xf >= W or yf >= H:
                return np.array([0.0])
            xi = min(xi, W - 1)
            yi = min(yi, H - 1)
            return np.array([1.0 - sdf[yi, xi]])
        if self.kind == "interrobot":
            d = x[:2] - x[4:6] + self.kw["tiny"]
            r = np.linalg.norm(d)
            h = np.zeros(1)
            if r <= self.kw["safety"]:
                h[0] = 1.0 - r / self.kw["safety"]
            return h
        if self.kind == "tracking":
            return self._measure_tracking(x)
        raise AssertionError(self.kind)

    def _measure_tracking(self, x):
        path = self.kw["path"]
        pad = self.kw["switch_padding"]
        att = self.kw["attraction"]
        x_pos = x[:2]
        x_vel = x[2:4]
        rec = self.record
        cs, ce = path[rec], path[rec + 1]
        line = ce - cs
        # projection clamped to the SEGMENT (not the reference's infinite
        # line, tracking.rs:220-224) — the framework's deliberate phantom-
        # projection fix (see graph/factors.py); mirrored for lockstep.
        t_c = np.clip((x_pos - cs) @ line / (line @ line), 0.0, 1.0)
        proj_cur = cs + t_c * line
        d_lo = pad * 0.01
        cur_to_end = np.linalg.norm(ce - proj_cur)

        proj_prev = None
        if rec > 0:
            ps, pe = path[rec - 1], path[rec]
            pline = pe - ps
            t_p = np.clip((x_pos - ps) @ pline / (pline @ pline), 0.0, 1.0)
            pp = ps + t_p * pline
            cur_to_prev_end = np.linalg.norm(pe - proj_cur)
            prev_to_prev_end = np.linalg.norm(cs - pp)
            # blend window capped at half of EACH adjoining segment length —
            # the framework's deliberate robustness divergence from
            # tracking.rs:255-290 (see graph/factors.py tracking docstring);
            # mirrored here so oracle lockstep holds in the capped regime.
            win_prev = min(pad, 0.5 * float(np.linalg.norm(pline)))
            win_cur = min(pad, 0.5 * float(np.linalg.norm(line)))
            if (
                cur_to_prev_end < win_cur and cur_to_prev_end > d_lo
                and prev_to_prev_end > d_lo and prev_to_prev_end < win_prev
            ):
                proj_prev = pp

        if cur_to_end < pad:
            self.record = min(self.record + 1, len(path) - 2)

        if proj_prev is not None:
            mp = x_pos + (proj_cur - x_pos) + (proj_prev - x_pos)
        else:
            mp = proj_cur + line / np.linalg.norm(line) * np.linalg.norm(x_vel) / 5.0

        d_mp = np.linalg.norm(mp - x_pos)
        h = min(d_mp / att, 1.0)
        self.last_pos = mp
        self.last_val = h
        return np.array([h])

    def jacobian(self, x):
        if self.kind == "dynamic":
            return self.J
        if self.kind == "obstacle":
            # first_order_jacobian, factor/mod.rs:102-128
            ww, wh = self.kw["world"]
            H, W = self.kw["sdf"].shape
            delta = (ww / W + wh / H) / 2.0
            h0 = self.measure(x)
            J = np.zeros((1, DOFS))
            for i in range(DOFS):
                xp = x.copy()
                xp[i] += delta
                J[0, i] = (self.measure(xp) - h0)[0] / delta
            return J
        if self.kind == "interrobot":
            J = np.zeros((1, DOFS * 2))
            d = x[:2] - x[4:6] + self.kw["tiny"]
            r = np.linalg.norm(d)
            if r <= self.kw["safety"]:
                J[0, :2] = -1.0 / self.kw["safety"] / r * d
                J[0, DOFS : DOFS + 2] = 1.0 / self.kw["safety"] / r * d
            return J
        if self.kind == "tracking":
            J = np.zeros((1, DOFS))
            J[0, :2] = 1.0 / self.last_val * (x[:2] - self.last_pos)
            return J
        raise AssertionError(self.kind)

    # -- the update (factor/mod.rs:334-454) ---------------------------------

    def key_order(self):
        keys = sorted(self.inbox.keys())
        if self.kind == "interrobot" and self.kw.get("orient_internal_first"):
            own = self.fid[0]
            keys = sorted(keys, key=lambda k: (k[0] != own, k))
        return keys

    def update(self):
        keys = self.key_order()
        for i, k in enumerate(keys):
            msg = self.inbox[k]
            if msg is not None:
                self.lin_point[i * DOFS : (i + 1) * DOFS] = msg.mu
            else:
                self.lin_point[i * DOFS : (i + 1) * DOFS] = 0.0

        if self.skip():
            return {k: None for k in keys}

        h = self.measure(self.lin_point)
        J = self.jacobian(self.lin_point)
        lam_pot = J.T @ self.lam_m @ J
        residual = self.z - h
        eta_pot = J.T @ self.lam_m @ (J @ self.lin_point + residual)

        out = {}
        for m_idx, k in enumerate(keys):
            eta = eta_pot.copy()
            lam = lam_pot.copy()
            for j, kj in enumerate(keys):
                if kj == k:
                    continue
                msg = self.inbox[kj]
                if msg is None:
                    continue
                eta[j * DOFS : (j + 1) * DOFS] += msg.eta
                lam[j * DOFS : (j + 1) * DOFS, j * DOFS : (j + 1) * DOFS] += msg.lam
            out[k] = marginalise(eta, lam, m_idx * DOFS)
        return out


class OracleSim:
    """Multi-robot GBP simulation mirroring the reference system chain."""

    def __init__(
        self,
        *,
        starts,            # [R, 4]
        waypoint_lists,    # list of [W_r, 4]
        radii,
        variable_timesteps,
        schedule,          # [(internal, external)]
        sdf,               # [H, W] in [0,1]
        world,             # (w, h)
        target_speed,
        planning_horizon,
        comms_radius,
        sigmas,            # dict: dynamics, interrobot, obstacle, tracking
        safety_multiplier=2.2,
        hz=10.0,
        switch_padding=1.0,
        attraction=2.0,
        despawn_on_final=True,
        factors=("dynamic", "obstacle", "tracking", "interrobot"),
        parity_interrobot=True,
        n_slots=4,
    ):
        # parity_interrobot aligns the epsilon-level arbitrary choices
        # (inbox orientation, tiny offset numbering) with the dense
        # implementation; the reference's own choices differ only at the
        # 1e-6 div/0-guard level and are run-order dependent there too.
        self.R = len(starts)
        self.ts = list(variable_timesteps)
        self.V = len(self.ts)
        self.schedule = schedule
        self.sdf = sdf
        self.world = world
        self.speed = target_speed
        self.comms_radius = comms_radius
        self.sigmas = sigmas
        self.safety_multiplier = safety_multiplier
        self.dt = 1.0 / hz
        self.switch_padding = switch_padding
        self.attraction = attraction
        self.despawn_on_final = despawn_on_final
        self.enabled = set(factors)
        self.parity_interrobot = parity_interrobot
        self.n_slots = n_slots
        # mirror of the dense implementation's neighbour slot table, used only
        # to reproduce its slot-deterministic tiny offsets in parity mode
        self.slots = [dict() for _ in range(len(starts))]
        self.nbr_overflow = 0  # parity mode: pairs dropped for lack of a slot
        self.tick_no = 0

        self.pos = np.asarray(starts, dtype=np.float64)[:, :2].copy()
        self.radii = np.asarray(radii, dtype=np.float64)
        self.t0 = self.radii / 2.0 / target_speed
        self.active = [True] * self.R
        self.completed = [False] * self.R
        self.target_idx = [1] * self.R
        self.waypoints = [np.asarray(w, dtype=np.float64) for w in waypoint_lists]
        self.iter_count_factor = [0] * self.R
        self.connected: dict[int, set] = {r: set() for r in range(self.R)}
        self.next_factor_number = 1

        self.vars: list[list[Variable]] = []
        self.factors: list[dict] = []  # per robot: fid -> Factor
        for r in range(self.R):
            start = np.asarray(starts[r], dtype=np.float64)
            wp1 = self.waypoints[r][1]
            s2g = wp1 - start
            dist = np.linalg.norm(s2g)
            horizon = start + min(dist, target_speed * planning_horizon) * (
                s2g / dist if dist > 0 else np.zeros(4)
            )
            vs = []
            for i, t in enumerate(self.ts):
                mean = start + (horizon - start) * (t / self.ts[-1])
                sigma = 1e30 if i in (0, self.V - 1) else np.inf
                vs.append(Variable((r, i), mean, sigma))
            self.vars.append(vs)

            fs = {}
            fid_counter = [0]

            def new_fid(r=r, fid_counter=fid_counter):
                fid_counter[0] += 1
                return (r, 1000 + fid_counter[0])

            if "dynamic" in self.enabled:
                for i in range(self.V - 1):
                    dt_f = self.t0[r] * (self.ts[i + 1] - self.ts[i])
                    f = Factor("dynamic", new_fid(), sigmas["dynamics"], np.zeros(DOFS), delta_t=dt_f)
                    # add_internal_edge i+1 then i; inbox sorted by variable id
                    f.inbox[(r, i)] = None
                    f.inbox[(r, i + 1)] = None
                    vs[i].inbox[f.fid] = None
                    vs[i + 1].inbox[f.fid] = None
                    fs[f.fid] = f
            if "obstacle" in self.enabled:
                for i in range(1, self.V - 1):
                    f = Factor("obstacle", new_fid(), sigmas["obstacle"], np.zeros(1), sdf=sdf, world=world)
                    f.inbox[(r, i)] = None
                    vs[i].inbox[f.fid] = None
                    fs[f.fid] = f
            if "tracking" in self.enabled:
                path = [w[:2].copy() for w in self.waypoints[r]]
                for i in range(1, self.V - 1):
                    f = Factor(
                        "tracking", new_fid(), sigmas["tracking"], np.zeros(1),
                        path=path, switch_padding=switch_padding, attraction=attraction,
                        last_pos=vs[i].mean[:2].copy(),
                    )
                    # tracking factors receive a real initial message
                    f.inbox[(r, i)] = vs[i].prepare_message()
                    vs[i].inbox[f.fid] = None
                    fs[f.fid] = f
            self.factors.append(fs)

    # -- helpers ------------------------------------------------------------

    def _variable(self, vid):
        return self.vars[vid[0]][vid[1]]

    def _factor(self, fid):
        return self.factors[fid[0]].get(fid)

    def not_idle(self, r):
        return True  # only-local missions are Active immediately

    # -- system chain -------------------------------------------------------

    def reached_waypoint(self):
        for r in range(self.R):
            if not self.active[r] or self.completed[r]:
                continue
            if self.target_idx[r] >= len(self.waypoints[r]):
                continue
            is_last = self.target_idx[r] == len(self.waypoints[r]) - 1
            # circle-style checks: waypoint via horizon, finish via current
            var = self.vars[r][0 if is_last else self.V - 1]
            wp = self.waypoints[r][self.target_idx[r]][:2]
            d2 = np.sum((var.mean[:2] - wp) ** 2)
            if d2 < self.radii[r] ** 2:
                self.target_idx[r] += 1
                if self.target_idx[r] >= len(self.waypoints[r]):
                    self.completed[r] = True
                    if self.despawn_on_final:
                        self.active[r] = False
                        self._despawn(r)
                else:
                    for f in self.factors[r].values():
                        if f.kind == "tracking":
                            f.index = self.target_idx[r]

    def _despawn(self, r):
        # delete inter-robot factors both ways (factorgraph.rs:380-450)
        for other in list(self.connected[r]):
            self._disconnect(r, other)

    def _disconnect(self, a, b):
        self.connected[a].discard(b)
        self.connected[b].discard(a)
        self.slots[a].pop(b, None)
        self.slots[b].pop(a, None)
        for r, other in ((a, b), (b, a)):
            dead = [fid for fid, f in self.factors[r].items()
                    if f.kind == "interrobot" and f.kw["other"] == other]
            for fid in dead:
                del self.factors[r][fid]
            for v in self.vars[r]:
                v.inbox = {
                    k: m for k, m in v.inbox.items()
                    if not (k[0] == other) and k not in dead
                }
            for f in self.factors[r].values():
                f.inbox = {k: m for k, m in f.inbox.items() if k[0] != other}

    def update_neighbours_and_factors(self):
        if "interrobot" not in self.enabled:
            return
        in_range = {}
        for r in range(self.R):
            if not self.active[r]:
                in_range[r] = set()
                continue
            s = set()
            for o in range(self.R):
                if o != r and self.active[o]:
                    if np.linalg.norm(self.pos[r] - self.pos[o]) <= self.comms_radius:
                        s.add(o)
            in_range[r] = s

        # delete
        for r in range(self.R):
            for o in sorted(self.connected[r] - in_range[r]):
                self._disconnect(r, o)

        # create (robot.rs:1441-1586). The reference connects every new
        # in-range pair, uncapped. In parity mode we mirror the dense path's
        # fixed-capacity slot table exactly: new pairs are assigned to free
        # slots nearest-first (ties by ascending id — the dense top_k order),
        # pairs that find no free slot are skipped (dense counts these in
        # nbr_overflow), and a pair is only created when BOTH ends allocated
        # a slot this tick (the dense reciprocity mask, _finish_connectivity).
        assign: dict[int, dict[int, int]] = {}
        for r in range(self.R):
            if not self.active[r]:
                assign[r] = {}
                continue
            new = sorted(in_range[r] - self.connected[r])
            if self.parity_interrobot:
                new.sort(key=lambda o: (np.sum((self.pos[r] - self.pos[o]) ** 2), o))
            free = sorted(set(range(self.n_slots)) - set(self.slots[r].values()))
            a: dict[int, int] = {}
            for o in new:
                if self.parity_interrobot and not free:
                    self.nbr_overflow += 1
                    continue
                a[o] = free.pop(0) if free else 0
            assign[r] = a

        new_edges = []
        for r in range(self.R):
            for o, k_slot in assign[r].items():
                if self.parity_interrobot and r not in assign.get(o, {}):
                    continue  # peer had no free slot — reciprocity drop
                self.slots[r][o] = k_slot
                for i in range(1, self.V):
                    fid = (r, 2000 + self.next_factor_number)
                    tiny = 1e-6 * self.next_factor_number
                    self.next_factor_number += 1
                    # the reference gives inter-robot factors a 4-dim zero
                    # measurement with only component 0 ever set
                    # (interrobot.rs:165-204) — rows 1..3 of J are zero, so the
                    # 1-dim form is identical.
                    if self.parity_interrobot:
                        # mirror the dense slot-deterministic tiny offsets
                        V1 = self.V - 1
                        tiny = 1e-6 * (
                            r * self.n_slots * V1 + k_slot * V1 + (i - 1) + 1
                        )
                    f = Factor(
                        "interrobot", fid, self.sigmas["interrobot"], np.zeros(1),
                        safety=self.safety_multiplier * self.radii[r],
                        tiny=tiny, other=o, ext_index=i,
                        orient_internal_first=self.parity_interrobot,
                    )
                    f.inbox[(r, i)] = None       # internal edge: empty
                    self.vars[r][i].inbox[fid] = None
                    self.factors[r][fid] = f
                    new_edges.append((r, fid, o, i))
                self.connected[r].add(o)

        for r, fid, o, i in new_edges:
            # external edge + seed message (robot.rs:1547-1585)
            self.vars[o][i].inbox[fid] = None
            msg = self.vars[o][i].prepare_message()
            self.factors[r][fid].inbox[(o, i)] = msg

    def update_prior_horizon(self):
        internal_total = sum(1 for i, _ in self.schedule if i)
        if internal_total == 0:
            return
        pending = []
        for r in range(self.R):
            if not self.active[r] or self.completed[r]:
                continue
            if self.target_idx[r] >= len(self.waypoints[r]):
                continue
            var = self.vars[r][self.V - 1]
            wp = self.waypoints[r][self.target_idx[r]][:2]
            h2w = wp - var.mean[:2]
            dist = np.linalg.norm(h2w)
            vel = min(self.speed, dist) * (h2w / dist if dist > 0 else np.zeros(2))
            pos = var.mean[:2] + vel * self.dt
            new_mean = np.concatenate([pos, vel])
            msgs = var.change_prior(new_mean)
            for fid, m in msgs.items():
                f = self._factor(fid)
                if fid[0] == r:
                    if f is not None:
                        f.inbox[var.vid] = m
                else:
                    pending.append((fid, var.vid, m))
        for fid, vid, m in pending:
            f = self._factor(fid)
            if f is not None:
                f.inbox[vid] = m

    def update_prior_current(self):
        for r in range(self.R):
            if not self.active[r]:
                continue
            time_scale = self.dt / self.t0[r]
            v0, v1 = self.vars[r][0], self.vars[r][1]
            change = time_scale * (v1.mean - v0.mean)
            new_mean = v0.mean + change
            msgs = v0.change_prior(new_mean)
            for fid, m in msgs.items():
                f = self._factor(fid)
                if f is not None and fid[0] == r:
                    f.inbox[v0.vid] = m
            self.pos[r] = self.pos[r] + change[:2]

    def iterate_gbp(self):
        for run_internal, run_external in self.schedule:
            if run_internal:
                for r in range(self.R):
                    if not self.active[r] or not self.not_idle(r):
                        continue
                    self.internal_factor_iteration(r)
                    self.internal_variable_iteration(r)
            if run_external and "interrobot" in self.enabled:
                to_ext_vars = []
                for r in range(self.R):
                    if not self.active[r]:
                        continue
                    to_ext_vars += self.external_factor_iteration(r)
                for fid, vid, m in to_ext_vars:
                    if not self.active[vid[0]]:
                        continue
                    self._variable(vid).inbox[fid] = m
                to_ext_factors = []
                for r in range(self.R):
                    if not self.active[r]:
                        continue
                    to_ext_factors += self.external_variable_iteration(r)
                for vid, fid, m in to_ext_factors:
                    if not self.active[fid[0]]:
                        continue
                    f = self._factor(fid)
                    if f is not None:
                        f.inbox[vid] = m

    def internal_factor_iteration(self, r):
        for fid in sorted(self.factors[r].keys()):
            f = self.factors[r][fid]
            if f.kind == "interrobot":
                continue
            if f.kind == "tracking" and self.iter_count_factor[r] < 10:
                continue
            msgs = f.update()
            for vid, m in msgs.items():
                self._variable(vid).inbox[fid] = m
        self.iter_count_factor[r] += 1

    def internal_variable_iteration(self, r):
        for v in self.vars[r]:
            msgs = v.update_belief()
            for fid, m in msgs.items():
                if fid[0] != r:
                    continue
                f = self._factor(fid)
                if f is not None:
                    f.inbox[v.vid] = m

    def external_factor_iteration(self, r):
        out = []
        for fid in sorted(self.factors[r].keys()):
            f = self.factors[r][fid]
            if f.kind != "interrobot":
                continue
            msgs = f.update()
            for vid, m in msgs.items():
                if vid[0] != r:
                    out.append((fid, vid, m))
        self.iter_count_factor[r] += 1
        return out

    def external_variable_iteration(self, r):
        out = []
        for v in self.vars[r]:
            msgs = v.update_belief()
            for fid, m in msgs.items():
                if fid[0] != r:
                    out.append((v.vid, fid, m))
        return out

    def step(self):
        self.reached_waypoint()
        self.update_neighbours_and_factors()
        self.update_prior_horizon()
        self.update_prior_current()
        self.iterate_gbp()
        self.tick_no += 1

    # -- views --------------------------------------------------------------

    def belief_means(self):
        return np.stack([[v.mean for v in vs] for vs in self.vars])
