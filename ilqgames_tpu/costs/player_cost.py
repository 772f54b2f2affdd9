"""Per-player cost aggregation and full-horizon quadraticization.

Reference parity: PlayerCost (cost/player_cost.h:57-152, src/player_cost.cpp)
  * Evaluate sums state costs + control costs (constraints excluded).
  * Quadraticize accumulates state costs, control costs, and the augmented-
    Lagrangian terms of all constraints; per-player state/control
    regularization enters as a diagonal shift
    (utils/quadratic_cost_approximation.h:73-75).
  * Cost structure SUM / MAX / MIN over time: for extremal structures the
    state terms are quadraticized only at the time of the extreme cost;
    control terms always (src/ilq_solver.cpp:474-490,
    PlayerCost::QuadraticizeControlCosts).

Augmented-Lagrangian multipliers are explicit solver state (`ALState`), not
the reference's per-object vectors and global static mu
(src/constraint.cpp:60)."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as _np
from flax import struct

from ilqgames_tpu.costs.base import Constraint, Cost
from ilqgames_tpu.types import DEFAULT_MU, GameSpec, OperatingPoint, QuadraticCosts

STRUCTURE_SUM = "sum"
STRUCTURE_MAX = "max"
STRUCTURE_MIN = "min"


@dataclasses.dataclass(frozen=True, eq=False)
class PlayerCost:
    """Static description of one player's cost: atoms + constraints."""

    state_costs: Tuple[Cost, ...] = ()
    # (which player's control, cost) — almost always the player's own.
    control_costs: Tuple[Tuple[int, Cost], ...] = ()
    state_constraints: Tuple[Constraint, ...] = ()
    control_constraints: Tuple[Tuple[int, Constraint], ...] = ()
    structure: str = STRUCTURE_SUM
    state_regularization: float = 0.0
    control_regularization: float = 0.0

    @property
    def is_constrained(self) -> bool:
        return bool(self.state_constraints) or bool(self.control_constraints)

    def control_players(self) -> Tuple[int, ...]:
        """Players j whose controls appear in this player's cost."""
        js = {j for j, _ in self.control_costs}
        js |= {j for j, _ in self.control_constraints}
        return tuple(sorted(js))

    def evaluate_stage(self, t, x, us):
        """Instantaneous cost (constraints excluded) —
        PlayerCost::Evaluate (src/player_cost.cpp:129-146)."""
        total = jnp.asarray(0.0, jnp.float32)
        for c in self.state_costs:
            total = total + c.evaluate(t, x)
        for j, c in self.control_costs:
            total = total + c.evaluate(t, us[j])
        return total


@struct.dataclass
class ALState:
    """Augmented-Lagrangian multipliers: one lambda per constraint per knot,
    plus the global quadratic weight mu (shared by all constraints, matching
    the reference's static)."""

    state_lambdas: Tuple[jnp.ndarray, ...]  # per player: [n_sc_i, N]
    control_lambdas: Tuple[jnp.ndarray, ...]  # per player: [n_cc_i, N]
    mu: jnp.ndarray  # scalar

    @classmethod
    def init(cls, player_costs, spec: GameSpec, lam0: float = 0.0,
             mu0: float = DEFAULT_MU) -> "ALState":
        N = spec.num_time_steps
        return cls(
            state_lambdas=tuple(
                jnp.full((len(pc.state_constraints), N), lam0, jnp.float32)
                for pc in player_costs
            ),
            control_lambdas=tuple(
                jnp.full((len(pc.control_constraints), N), lam0, jnp.float32)
                for pc in player_costs
            ),
            mu=jnp.asarray(mu0, jnp.float32),
        )


def is_constrained(player_costs) -> bool:
    return any(pc.is_constrained for pc in player_costs)


def total_costs(player_costs, spec: GameSpec, op: OperatingPoint):
    """Per-player total costs and times of extreme cost
    (ILQSolver::TotalCosts, src/ilq_solver.cpp:220-258).

    Returns (totals [P], extreme_ks [P] int32). extreme_ks is the argmax /
    argmin stage for extremal structures (first occurrence, matching the
    reference's strict-inequality scan); 0 for additive players (unused)."""
    ts = spec.horizon_times()
    totals = []
    extreme_ks = []
    for pc in player_costs:
        vals = jax.vmap(pc.evaluate_stage)(ts, op.xs, op.us)  # [N]
        if pc.structure == STRUCTURE_SUM:
            totals.append(jnp.sum(vals))
            extreme_ks.append(jnp.asarray(0, jnp.int32))
        elif pc.structure == STRUCTURE_MAX:
            totals.append(jnp.max(vals))
            extreme_ks.append(jnp.argmax(vals).astype(jnp.int32))
        else:
            totals.append(jnp.min(vals))
            extreme_ks.append(jnp.argmin(vals).astype(jnp.int32))
    return jnp.stack(totals), jnp.stack(extreme_ks)


def stage_gradients_core(player_costs, spec: GameSpec, lam_state_k,
                         lam_ctrl_k, mu, t, x, us):
    """Gradients of every player's cost at ONE stage given that stage's
    multipliers directly: (l [P,xdim], r_own [P,umax]).

    lam_state_k / lam_ctrl_k: per-player tuples of [n_constraints_i]
    multiplier vectors for this knot. Shared by the scan-based sweep and
    the Pallas sweep kernel (which streams multipliers per knot)."""
    xd = spec.xdim
    um = spec.umax

    from ilqgames_tpu.costs.base import assemble_vector

    ls = []
    rs = []
    for i, pc in enumerate(player_costs):
        # Sparse accumulation: collect every cost's (dim, scalar) pairs
        # and assemble ONE [xd] stack per player — per-cost dense
        # assembly was the dominant op count in the Pallas sweep kernel.
        pairs = []
        dense = None
        for c in pc.state_costs:
            pp = c.gradient_pairs(t, x)
            if pp is not None:
                pairs.extend(pp)
            else:
                g = c.gradient(t, x)
                dense = g if dense is None else dense + g
        for ci, con in enumerate(pc.state_constraints):
            pp = con.gradient_al_pairs(t, x, lam_state_k[i][ci], mu)
            if pp is not None:
                pairs.extend(pp)
            else:
                g = con.gradient_al(t, x, lam_state_k[i][ci], mu)
                dense = g if dense is None else dense + g
        grad = assemble_vector(xd, pairs, x[0])
        if dense is not None:
            grad = grad + dense
        ls.append(grad)

        upairs = []
        udense = None
        for jj, c in pc.control_costs:
            if jj == i:
                pp = c.gradient_pairs(t, us[i])
                if pp is not None:
                    upairs.extend(pp)
                else:
                    g = c.gradient(t, us[i])
                    udense = g if udense is None else udense + g
        for ci, (jj, con) in enumerate(pc.control_constraints):
            if jj == i:
                pp = con.gradient_al_pairs(t, us[i], lam_ctrl_k[i][ci], mu)
                if pp is not None:
                    upairs.extend(pp)
                else:
                    g = con.gradient_al(t, us[i], lam_ctrl_k[i][ci], mu)
                    udense = g if udense is None else udense + g
        ug = assemble_vector(um, upairs, us[i, 0])
        if udense is not None:
            ug = ug + udense
        rs.append(ug)

    return jnp.stack(ls), jnp.stack(rs)


def stage_gradient_sq_tuple(player_costs, spec: GameSpec, lam_state_k,
                            lam_ctrl_k, mu, t, x, us):
    """Per-player SQUARED-gradient sums as TUPLES of P scalars
    (state_sqs, ctrl_sqs) — the merit increments
    (src/ilq_solver.cpp:400-435), computed from sparse pairs WITHOUT
    assembling dense gradient vectors. Per-dim accumulation order
    matches stage_gradients_core; dims are squared and summed in
    ascending order. Falls back to the dense path per player when a
    cost provides no sparse gradient.

    Returns tuples, not a stacked [P] array: under the sweep kernel's
    double vmap a stacked [P] output becomes a lane-minor [C, B, P]
    concatenate plus TWO cross-lane transposes per knot, which Mosaic
    lowers at ~100x the cost of the actual gradient math
    (tools/sweep_floor5*.txt). Kernel consumers sum the tuple entries
    per player instead."""
    xd = spec.xdim
    um = spec.umax

    from ilqgames_tpu.costs.base import assemble_vector

    def sq_of(pairs, dense, d, like):
        if dense is not None:
            vec = assemble_vector(d, pairs, like) + dense
            return jnp.sum(vec * vec)
        acc = {}
        for i_, v in pairs:
            acc[i_] = acc[i_] + v if i_ in acc else v
        s = jnp.zeros_like(like)
        for i_ in sorted(acc):
            s = s + acc[i_] * acc[i_]
        return s

    state_sqs = []
    ctrl_sqs = []
    for i, pc in enumerate(player_costs):
        pairs = []
        dense = None
        for c in pc.state_costs:
            pp = c.gradient_pairs(t, x)
            if pp is not None:
                pairs.extend(pp)
            else:
                g = c.gradient(t, x)
                dense = g if dense is None else dense + g
        for ci, con in enumerate(pc.state_constraints):
            pp = con.gradient_al_pairs(t, x, lam_state_k[i][ci], mu)
            if pp is not None:
                pairs.extend(pp)
            else:
                g = con.gradient_al(t, x, lam_state_k[i][ci], mu)
                dense = g if dense is None else dense + g
        state_sqs.append(sq_of(pairs, dense, xd, x[0]))

        upairs = []
        udense = None
        for jj, c in pc.control_costs:
            if jj == i:
                pp = c.gradient_pairs(t, us[i])
                if pp is not None:
                    upairs.extend(pp)
                else:
                    g = c.gradient(t, us[i])
                    udense = g if udense is None else udense + g
        for ci, (jj, con) in enumerate(pc.control_constraints):
            if jj == i:
                pp = con.gradient_al_pairs(t, us[i], lam_ctrl_k[i][ci], mu)
                if pp is not None:
                    upairs.extend(pp)
                else:
                    g = con.gradient_al(t, us[i], lam_ctrl_k[i][ci], mu)
                    udense = g if udense is None else udense + g
        ctrl_sqs.append(sq_of(upairs, udense, um, us[i, 0]))

    return tuple(state_sqs), tuple(ctrl_sqs)


def stage_gradient_sq_core(player_costs, spec: GameSpec, lam_state_k,
                           lam_ctrl_k, mu, t, x, us):
    """Stacked form of `stage_gradient_sq_tuple`: (state_sq [P],
    ctrl_sq [P]). Fine under plain XLA; inside Pallas kernels prefer
    the tuple form (see its docstring)."""
    state_sqs, ctrl_sqs = stage_gradient_sq_tuple(
        player_costs, spec, lam_state_k, lam_ctrl_k, mu, t, x, us)
    return jnp.stack(state_sqs), jnp.stack(ctrl_sqs)


def stage_quadraticize_core(player_costs, spec: GameSpec, lam_state_k,
                            lam_ctrl_k, mu, t, x, us, gate):
    """Per-knot quadraticization with direct multipliers: the per-knot
    values of `quadraticize` (PlayerCost::Quadraticize +
    src/ilq_solver.cpp:471-490), built from sparse (index, scalar) pairs
    with ONE dense assembly per player — kernel-friendly (no scatters,
    no per-cost dense accumulation; Mosaic gets no fusion/DCE).

    gate: [P] extremal state-term gates (1.0 always for SUM players,
    one-hot at the extreme knot otherwise — src/ilq_solver.cpp:483-487).
    Control terms are never gated. Returns (Q [P,xd,xd], l [P,xd],
    R [P,P,um,um], r [P,P,um])."""
    from ilqgames_tpu.costs.base import assemble_matrix, assemble_vector

    xd = spec.xdim
    um = spec.umax
    P = spec.num_players
    u_mask_np = _np.zeros((P, um), _np.float32)
    for _i, _d in enumerate(spec.udims):
        u_mask_np[_i, :_d] = 1.0

    Qs, ls, R_rows, r_rows = [], [], [], []
    for i, pc in enumerate(player_costs):
        hpairs, gpairs = [], []
        hdense = gdense = None
        for c in pc.state_costs:
            qp = c.quad_pairs(t, x)
            if qp is not None:
                hpairs.extend(qp[0])
                gpairs.extend(qp[1])
            else:
                h, g = c.quadraticize(t, x)
                hdense = h if hdense is None else hdense + h
                gdense = g if gdense is None else gdense + g
        for ci, con in enumerate(pc.state_constraints):
            qp = con.quad_al_pairs(t, x, lam_state_k[i][ci], mu)
            if qp is not None:
                hpairs.extend(qp[0])
                gpairs.extend(qp[1])
            else:
                h, g = con.quadraticize_al(t, x, lam_state_k[i][ci], mu)
                hdense = h if hdense is None else hdense + h
                gdense = g if gdense is None else gdense + g
        hess = assemble_matrix(xd, hpairs, x[0])
        grad = assemble_vector(xd, gpairs, x[0])
        if hdense is not None:
            hess = hess + hdense
            grad = grad + gdense
        # Extremal gating BEFORE regularization (quadraticize order).
        hess = hess * gate[i]
        grad = grad * gate[i]
        if pc.state_regularization != 0.0:
            reg = pc.state_regularization
            hess = hess + assemble_matrix(
                xd, [((d_, d_), jnp.full_like(x[0], reg))
                     for d_ in range(xd)], x[0])
        Qs.append(hess)
        ls.append(grad)

        Ri, ri = [], []
        cps = pc.control_players()
        for j in range(P):
            if j not in cps:
                Ri.append(assemble_matrix(um, [], us[i, 0]))
                ri.append(assemble_vector(um, [], us[i, 0]))
                continue
            hpairs, gpairs = [], []
            hdense = gdense = None
            for jj, c in pc.control_costs:
                if jj != j:
                    continue
                qp = c.quad_pairs(t, us[j])
                if qp is not None:
                    hpairs.extend(qp[0])
                    gpairs.extend(qp[1])
                else:
                    h, g = c.quadraticize(t, us[j])
                    hdense = h if hdense is None else hdense + h
                    gdense = g if gdense is None else gdense + g
            for ci, (jj, con) in enumerate(pc.control_constraints):
                if jj != j:
                    continue
                qp = con.quad_al_pairs(t, us[j], lam_ctrl_k[i][ci], mu)
                if qp is not None:
                    hpairs.extend(qp[0])
                    gpairs.extend(qp[1])
                else:
                    h, g = con.quadraticize_al(
                        t, us[j], lam_ctrl_k[i][ci], mu)
                    hdense = h if hdense is None else hdense + h
                    gdense = g if gdense is None else gdense + g
            if pc.control_regularization != 0.0:
                reg = pc.control_regularization
                hpairs.extend(
                    ((a, a), jnp.full_like(us[i, 0],
                                           reg * float(u_mask_np[j, a])))
                    for a in range(um))
            hess_u = assemble_matrix(um, hpairs, us[i, 0])
            grad_u = assemble_vector(um, gpairs, us[i, 0])
            if hdense is not None:
                hess_u = hess_u + hdense
                grad_u = grad_u + gdense
            Ri.append(hess_u)
            ri.append(grad_u)
        R_rows.append(jnp.stack(Ri))
        r_rows.append(jnp.stack(ri))

    return (jnp.stack(Qs), jnp.stack(ls),
            jnp.stack(R_rows), jnp.stack(r_rows))


def stage_quadraticize_entries(player_costs, spec: GameSpec, lam_state_k,
                               lam_ctrl_k, mu, t, x, us, gate,
                               include_state=True, include_ctrl=True):
    """`stage_quadraticize_core` as a dict of SPARSE entries with STATIC
    keys — the form the fused Pallas stage kernel stores directly into
    its output refs (ops/pallas/stage.py). Mosaic rejects the wide
    output stacks `assemble_matrix` builds inside a double-vmapped
    kernel (tpu.concatenate of vregs at mismatched vpad offsets,
    tools/tpu_stage_check_r3.log), so the kernel never assembles: each
    nonzero cell is one scalar store.

    Keys: ("Q", i, r, c), ("l", i, r), ("R", i, j, a, b), ("r", i, j, a).
    Missing cells are zero. Accumulation order (costs, then constraints,
    then regularization; gate before regularization) matches
    stage_quadraticize_core exactly, so the sums are bitwise-identical.

    Every cost/constraint must provide sparse pairs (quad_pairs /
    quad_al_pairs non-None); raises ValueError otherwise — dense
    fallbacks would reintroduce the in-kernel stacks.

    include_state / include_ctrl: True (all players), False (none), or a
    tuple of player indices — the stage kernel compiles per-part
    sub-kernels to bound Mosaic's per-compile working set (the fused
    trace OOM-killed the v5e compile helper).
    """
    um = spec.umax
    P = spec.num_players
    xd = spec.xdim
    u_mask_np = _np.zeros((P, um), _np.float32)
    for _i, _d in enumerate(spec.udims):
        u_mask_np[_i, :_d] = 1.0

    def acc_into(dacc, pairs):
        for key, v in pairs:
            dacc[key] = dacc[key] + v if key in dacc else v

    def as_sel(inc):
        if inc is True:
            return tuple(range(P))
        if inc is False:
            return ()
        return tuple(inc)

    state_sel = as_sel(include_state)
    ctrl_sel = as_sel(include_ctrl)

    out = {}
    for i, pc in enumerate(player_costs):
        if i not in state_sel:
            continue
        hacc, gacc = {}, {}
        for c in pc.state_costs:
            qp = c.quad_pairs(t, x)
            if qp is None:
                raise ValueError(
                    f"stage_quadraticize_entries: state cost {c.name!r} "
                    "has no sparse quad_pairs (required for the fused "
                    "Pallas stage kernel; use fuse_stages=False)")
            acc_into(hacc, qp[0])
            acc_into(gacc, qp[1])
        for ci, con in enumerate(pc.state_constraints):
            qp = con.quad_al_pairs(t, x, lam_state_k[i][ci], mu)
            if qp is None:
                raise ValueError(
                    f"stage_quadraticize_entries: state constraint "
                    f"{con.name!r} has no sparse quad_al_pairs")
            acc_into(hacc, qp[0])
            acc_into(gacc, qp[1])
        # Extremal gating BEFORE regularization (quadraticize order).
        for (r, c_), v in hacc.items():
            out[("Q", i, r, c_)] = v * gate[i]
        for r, v in gacc.items():
            out[("l", i, r)] = v * gate[i]
        if pc.state_regularization != 0.0:
            reg = jnp.full_like(x[0], pc.state_regularization)
            for d_ in range(xd):
                key = ("Q", i, d_, d_)
                out[key] = out[key] + reg if key in out else reg

    for i, pc in enumerate(player_costs):
        if i not in ctrl_sel:
            continue
        cps = pc.control_players()
        for j in range(P):
            if j not in cps:
                continue
            hacc, gacc = {}, {}
            for jj, c in pc.control_costs:
                if jj != j:
                    continue
                qp = c.quad_pairs(t, us[j])
                if qp is None:
                    raise ValueError(
                        f"stage_quadraticize_entries: control cost "
                        f"{c.name!r} has no sparse quad_pairs")
                acc_into(hacc, qp[0])
                acc_into(gacc, qp[1])
            for ci, (jj, con) in enumerate(pc.control_constraints):
                if jj != j:
                    continue
                qp = con.quad_al_pairs(t, us[j], lam_ctrl_k[i][ci], mu)
                if qp is None:
                    raise ValueError(
                        f"stage_quadraticize_entries: control constraint "
                        f"{con.name!r} has no sparse quad_al_pairs")
                acc_into(hacc, qp[0])
                acc_into(gacc, qp[1])
            if pc.control_regularization != 0.0:
                reg = pc.control_regularization
                acc_into(hacc, (
                    ((a, a), jnp.full_like(us[i, 0],
                                           reg * float(u_mask_np[j, a])))
                    for a in range(um)))
            for (a, b), v in hacc.items():
                out[("R", i, j, a, b)] = v
            for a, v in gacc.items():
                out[("r", i, j, a)] = v
    return out


def stage_gradients(player_costs, spec: GameSpec, al: ALState, k, t, x, us):
    """Gradients of every player's cost at ONE stage: (l [P,xdim],
    r_own [P,umax]) — the gradient components of `quadraticize` (custom
    quad_fn overrides included) without Hessians. Usable inside scans so a
    rollout can accumulate merit terms on the fly."""
    lam_state_k = tuple(lams[:, k] for lams in al.state_lambdas)
    lam_ctrl_k = tuple(lams[:, k] for lams in al.control_lambdas)
    return stage_gradients_core(
        player_costs, spec, lam_state_k, lam_ctrl_k, al.mu, t, x, us
    )


def gradients(
    player_costs,
    spec: GameSpec,
    op: OperatingPoint,
    al: ALState,
    extreme_ks: jnp.ndarray,
):
    """Full-horizon stage gradients (l [N,P,xdim], r_own [N,P,umax]) —
    vmapped stage_gradients with MAX/MIN extreme-time gating
    (src/ilq_solver.cpp:483-487). All the merit function needs
    (src/ilq_solver.cpp:400-435)."""
    N = spec.num_time_steps
    ts = spec.horizon_times()
    ks = jnp.arange(N)

    l, r_own = jax.vmap(
        lambda k, t, x, us: stage_gradients(player_costs, spec, al, k, t, x, us)
    )(ks, ts, op.xs, op.us)

    # Extremal structures: state gradients only at the extreme time.
    gate = jnp.ones((N, spec.num_players), jnp.float32)
    for i, pc in enumerate(player_costs):
        if pc.structure != STRUCTURE_SUM:
            gate = gate.at[:, i].set((ks == extreme_ks[i]).astype(jnp.float32))
    l = l * gate[:, :, None]
    return l, r_own


def quadraticize(
    player_costs,
    spec: GameSpec,
    op: OperatingPoint,
    al: ALState,
    extreme_ks: jnp.ndarray,
) -> QuadraticCosts:
    """Full-horizon quadratic approximation of every player's cost, vmapped
    over time (the reference's per-timestep loop,
    src/ilq_solver.cpp:471-490)."""
    N = spec.num_time_steps
    P = spec.num_players
    xd = spec.xdim
    um = spec.umax
    ts = spec.horizon_times()
    ks = jnp.arange(N)
    u_mask = spec.u_mask()
    eye_x = jnp.eye(xd, dtype=jnp.float32)

    Q = jnp.zeros((N, P, xd, xd), jnp.float32)
    l = jnp.zeros((N, P, xd), jnp.float32)
    R = jnp.zeros((N, P, P, um, um), jnp.float32)
    r = jnp.zeros((N, P, P, um), jnp.float32)

    for i, pc in enumerate(player_costs):
        # ----- state terms -----
        def state_quad(k, t, x, _pc=pc, _i=i):
            hess = jnp.zeros((xd, xd), jnp.float32)
            grad = jnp.zeros((xd,), jnp.float32)
            for c in _pc.state_costs:
                h, g = c.quadraticize(t, x)
                hess, grad = hess + h, grad + g
            for ci, con in enumerate(_pc.state_constraints):
                lam = al.state_lambdas[_i][ci, k]
                h, g = con.quadraticize_al(t, x, lam, al.mu)
                hess, grad = hess + h, grad + g
            return hess, grad

        hess_x, grad_x = jax.vmap(state_quad)(ks, ts, op.xs)

        if pc.structure != STRUCTURE_SUM:
            # Extremal structures: state terms only at the extreme time
            # (src/ilq_solver.cpp:483-487).
            mask = (ks == extreme_ks[i]).astype(jnp.float32)
            hess_x = hess_x * mask[:, None, None]
            grad_x = grad_x * mask[:, None]

        Q = Q.at[:, i].set(hess_x + pc.state_regularization * eye_x)
        l = l.at[:, i].set(grad_x)

        # ----- control terms, grouped by which player's control -----
        for j in pc.control_players():
            atoms = [c for jj, c in pc.control_costs if jj == j]
            cons = [
                (ci, con)
                for ci, (jj, con) in enumerate(pc.control_constraints)
                if jj == j
            ]

            def u_quad(k, t, u, _atoms=atoms, _cons=cons, _i=i):
                hess = jnp.zeros((um, um), jnp.float32)
                grad = jnp.zeros((um,), jnp.float32)
                for c in _atoms:
                    h, g = c.quadraticize(t, u)
                    hess, grad = hess + h, grad + g
                for ci, con in _cons:
                    lam = al.control_lambdas[_i][ci, k]
                    h, g = con.quadraticize_al(t, u, lam, al.mu)
                    hess, grad = hess + h, grad + g
                return hess, grad

            hess_u, grad_u = jax.vmap(u_quad)(ks, ts, op.us[:, j])
            # Regularization only on this player's real control dims
            # (SingleCostApproximation ctor initializes hess = reg * I).
            reg = pc.control_regularization * jnp.diag(u_mask[j])
            R = R.at[:, i, j].set(hess_u + reg)
            r = r.at[:, i, j].set(grad_u)

    return QuadraticCosts(Q=Q, l=l, R=R, r=r)
