"""Batch-level fused AL+iLQ solver driving the Pallas kernels.

This is the production TPU path. It mirrors `solver/fused.py`'s flat
per-lane state machine EXACTLY (same accept rules, merit carryover, AL
bookkeeping — reference src/ilq_solver.cpp:123-165 +
src/augmented_lagrangian_solver.cpp:108-178) but operates on whole
batches: the horizon recursions (LQ backward/forward, rollout, linesearch
sweep) run as Pallas kernels over the full batch instead of vmapped
`lax.scan`s. With `fuse_stages` (opt-in; see _resolve_fuse_stages for
the default and why), linearize + quadraticize also run in one
knot-parallel Pallas kernel
(ops/pallas/stage.py) that feeds the LQ kernel batch-minor directly —
the quadraticization is recomputed from (op, al) each trip instead of
carried (bit-equivalent; see _empty_quad), and only cost totals /
violations stay as vmapped XLA.

Why a separate module instead of a flag inside fused.py: the kernels are
batch-level functions (batch on the lane axis), so the control flow can't
sit under `jax.vmap`. The split is held honest by
tests/test_batched_pallas.py, which pins this machine against the vmapped
fused machine trip-by-trip (decisions exactly equal, arrays at float
tolerance) on CPU via interpret mode.

Open-loop problems (dubins_origin) run on this machine too: the LQ
kernel switches to the vmapped XLA open-loop solver (strategies are
affine with P=0) while the rollout / merit-sweep Pallas kernels are
shared unchanged. Only `fuse_stages` is feedback-only.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.ops.pallas.layout import bm, mb, pad_batch
from ilqgames_tpu.ops.pallas.lq import solve_lq_feedback_bm, \
    solve_lq_feedback_pallas
from ilqgames_tpu.ops.pallas.stage import lin_quad_pallas
from ilqgames_tpu.ops.pallas.sweep import _prep_al, rollout_bm, \
    rollout_pallas, sweep_merits_bm, sweep_merits_pallas
from ilqgames_tpu.solver import ilq
from ilqgames_tpu.solver.al import ALResult, constraint_violations, \
    max_constraint_violation
from ilqgames_tpu.solver.fused import _FusedCarry
from ilqgames_tpu.solver.params import SolverParams
from ilqgames_tpu.types import GameSpec, OperatingPoint, QuadraticCosts, \
    Strategy


def _bwhere(mask, a, b):
    """Per-lane select over pytrees with leading batch axis."""
    def sel(x, y):
        m = mask.reshape(mask.shape + (1,) * (x.ndim - 1))
        return jnp.where(m, x, y)

    return jax.tree_util.tree_map(sel, a, b)


def _totals_b(player_costs, spec, op):
    return jax.vmap(lambda o: pcost.total_costs(player_costs, spec, o))(op)


def _all_sum(player_costs):
    """True when every player's structure is SUM — then extreme_ks is
    identically 0 (pcost.total_costs) and the per-trip TotalCosts pass
    exists only to produce it, so the trip skips the pass entirely."""
    return all(pc.structure == pcost.STRUCTURE_SUM for pc in player_costs)


def _quad_b(player_costs, spec, op, al, extreme_ks):
    return jax.vmap(
        lambda o, a, ek: pcost.quadraticize(player_costs, spec, o, a, ek)
    )(op, al, extreme_ks)


def _resolve_fuse_stages(fuse_stages):
    """None -> the production default (True), overridable without code
    edits via ILQ_FUSE_STAGES=0/1. The fused stage kernel compiles and
    runs on real v5e with BITWISE parity vs the vmapped XLA stages
    (tools/tpu_stage_check.txt: stage_kernel_fused ok, compile 116.6 s,
    all deltas 0.0) after the round-3 rewrite: analytic Jacobians +
    sparse quad/AL pairs (no in-kernel autodiff) and per-entry tile
    stores (no output stacks). Trip time matches the XLA-stage mode at
    B=128-256 and drops the 0.3 GB/trip quad carry, which pays at
    larger batches. Individual lanes may diverge between the two modes
    over many iterations (reduction-order ulps at Armijo knife edges —
    the same class of difference as recompiling the reference with
    different flags); tools/tpu_trip_check.txt records it."""
    if fuse_stages is None:
        import os

        return os.environ.get("ILQ_FUSE_STAGES", "1") == "1"
    return fuse_stages


def _resolve_fuse_for(params, fuse_stages, dyn=None):
    """fuse_stages resolution incl. the open-loop guard (the fused
    stage kernel is feedback-only) and the analytic-Jacobian guard
    (lin_quad_pallas cannot lower jacfwd on Mosaic, so dynamics without
    `ode_jac` — e.g. hand-built MultiPlayerDynamics like the point-mass
    LQ game — fall back to the XLA stage path instead of erroring)."""
    fs = _resolve_fuse_stages(fuse_stages)
    if params.open_loop:
        return False
    if fs and dyn is not None and dyn.ode_jac is None:
        return False
    return fs


def _empty_quad(Bt):
    """Zero-size QuadraticCosts placeholder: the fused-stage machine
    recomputes the quadraticization from (op, al) in-kernel every trip
    (bit-equivalent — failed lanes always pass through the reinit
    boundary, so a carried quad is never consumed with a stale al), so
    the 0.3 GB/trip quad carry + its masked updates disappear."""
    z = lambda *s: jnp.zeros((Bt,) + s, jnp.float32)
    return QuadraticCosts(Q=z(0, 0, 0, 0), l=z(0, 0, 0),
                          R=z(0, 0, 0, 0, 0), r=z(0, 0, 0, 0))


def _expected_decrease_bm(spec, ops, al_r, dxs):
    """ExpectedDecrease (ilq._expected_decrease, shipped form) from the
    batch-minor stage/LQ arrays: returns [B] (lane-padded)."""
    N = spec.num_time_steps
    P = spec.num_players
    x = spec.xdim
    u = spec.umax
    ns = N - 1
    R6 = ops["Rf"].reshape(N, P, P, u, u, -1)
    r5 = ops["rf"].reshape(N, P, P, u, -1)
    Rii = jnp.einsum("kiiuvb->kiuvb", R6)
    rii = jnp.einsum("kiiub->kiub", r5)
    alph = al_r.reshape(ns, P, u, -1)
    # The reference sums all N knots; the LQ strategy's terminal row is
    # zero, so summing the ns real rows is identical.
    control = -jnp.einsum("kiub,kiuvb,kivb->b", alph, Rii[:ns], rii[:ns])
    Q6 = ops["Qf"].reshape(N, P, x, x, -1)
    l5 = ops["lf"].reshape(N, P, x, -1)
    state = -jnp.einsum("kxb,kixyb,kiyb->b", dxs[1:], Q6[1:], l5[1:])
    return control + state


def _extreme_gate_b(player_costs, spec, extreme_ks):
    """[B, N, P] gate: 1 everywhere for additive players, one-hot at the
    extreme knot for extremal structures (src/ilq_solver.cpp:483-487)."""
    Bt = extreme_ks.shape[0]
    N = spec.num_time_steps
    P = spec.num_players
    ks = jnp.arange(N)
    gate = jnp.ones((Bt, N, P), jnp.float32)
    for i, pc in enumerate(player_costs):
        if pc.structure != pcost.STRUCTURE_SUM:
            gate = gate.at[:, :, i].set(
                (ks[None, :] == extreme_ks[:, i][:, None]).astype(jnp.float32)
            )
    return gate


def iteration_step_batched(dyn, player_costs, spec, params, x0, al_state, c,
                           *, active=None, batch_block=128,
                           interpret=False, stage1_cands=None,
                           return_stats=False, fuse_stages=False):
    """ONE iLQ iteration for a whole batch (the batch-level twin of
    ilq.iteration_step; reference src/ilq_solver.cpp:123-165).

    `active` ([Bt] bool, optional) marks lanes whose results will be
    kept by the caller; lanes outside it cannot force the expensive
    stage-2 linesearch escalation (their outputs are discarded anyway).

    `fuse_stages`: compute linearize+quadraticize in the fused Pallas
    stage kernel (ops/pallas/stage.py) from (c.op, al_state) each trip
    and keep all inter-kernel arrays batch-minor — no quad carry, no
    layout transposes between stages. Semantics are identical (see
    _empty_quad's rationale).

    `stage1_cands` (default params.linesearch_chunk): candidates per
    sweep-kernel call in the adaptive ladder. Results are identical for
    ANY width (the selected candidate is the first Armijo pass, and
    merits are chunk-invariant — tools/sweep_width.txt dref=0.0); width
    is a pure perf knob. Measured on v5e at B=256: one C=1 chunk costs
    4.6 ms vs 30 ms for C=8, so narrow chunks win whenever the deepest
    active lane needs only a few candidates (tools/sweep_width.txt).
    """
    if params.open_loop and fuse_stages:
        raise ValueError(
            "fuse_stages supports feedback LQ only; open-loop problems "
            "use the XLA LQ kernel inside the batched machine "
            "(fuse_stages=False)")
    Bt = x0.shape[0]
    Bb = batch_block
    N = spec.num_time_steps
    P = spec.num_players
    xd = spec.xdim
    um = spec.umax
    Pu = P * um
    ns = N - 1
    gate = _extreme_gate_b(player_costs, spec, c.extreme_ks)
    last_op = c.op

    if fuse_stages:
        op_bm = {
            "xs": pad_batch(bm(c.op.xs), Bb),
            "us": pad_batch(bm(c.op.us).reshape(N, Pu, -1), Bb),
            "t0": pad_batch(bm(c.op.t0)[None], Bb),
        }
        x0m = pad_batch(bm(x0), Bb)
        Bp = x0m.shape[-1]
        lamS, lamC, mu_bm, gate_bm = _prep_al(spec, al_state, gate, Bb)
        ops = lin_quad_pallas(
            dyn, player_costs, spec, op_bm, lamS, lamC, mu_bm, gate_bm,
            batch_block=Bb, interpret=interpret,
        )
        Ps_r, al_r, dxs = solve_lq_feedback_bm(
            spec, ops, x0m - op_bm["xs"][0],
            adaptive_regularization=params.adaptive_regularization,
            batch_block=Bb, interpret=interpret,
        )
        st_bm = {
            "Ps": jnp.concatenate(
                [Ps_r, jnp.zeros((1, Pu, xd, Bp), jnp.float32)]),
            "alphas": jnp.concatenate(
                [al_r, jnp.zeros((1, Pu, Bp), jnp.float32)]),
        }
        expected_decrease = _expected_decrease_bm(spec, ops, al_r, dxs)[:Bt]

        def sweep_chunk_fn(scal_c):
            m = sweep_merits_bm(
                dyn, player_costs, spec, x0m, op_bm, st_bm, scal_c,
                lamS, lamC, mu_bm, gate_bm,
                batch_block=Bb, interpret=interpret,
            )
            return jnp.moveaxis(m[:, :Bt], -1, 0)  # [Bt, C]

        def sweep_compact_fn(sel, scal_w):
            # Gather the selected lanes (batch-minor: last axis) into one
            # lane block and sweep only that block; scal_w [Bc, CD] gives
            # each gathered lane its own candidate window.
            Bc = sel.shape[0]
            g = lambda a: None if a is None else jnp.take(a, sel, axis=-1)
            m = sweep_merits_bm(
                dyn, player_costs, spec, g(x0m),
                {k: g(v) for k, v in op_bm.items()},
                {k: g(v) for k, v in st_bm.items()},
                scal_w.T, g(lamS), g(lamC), g(mu_bm), g(gate_bm),
                batch_block=Bc, interpret=interpret,
            )
            return jnp.moveaxis(m, -1, 0)  # [Bc, CD]

        def reroll_fn(scal_lane):
            scal_bm = pad_batch(bm(scal_lane)[None], Bb)
            xs_r, us_r = rollout_bm(
                dyn, spec, x0m, op_bm, st_bm, scal_bm,
                batch_block=Bb, interpret=interpret,
            )
            return OperatingPoint(
                xs=mb(xs_r, Bt), us=mb(us_r, Bt).reshape(Bt, N, P, um),
                t0=c.op.t0,
            )

        lq_strategy = Strategy(
            Ps=jnp.concatenate(
                [mb(Ps_r, Bt).reshape(Bt, ns, P, um, xd),
                 jnp.zeros((Bt, 1, P, um, xd), jnp.float32)], axis=1),
            alphas=jnp.concatenate(
                [mb(al_r, Bt).reshape(Bt, ns, P, um),
                 jnp.zeros((Bt, 1, P, um), jnp.float32)], axis=1),
        )
        quad_of = lambda op: _empty_quad(Bt)
    else:
        lin = jax.vmap(lambda o: dyn_base.linearize(dyn, spec, o))(c.op)
        if params.open_loop:
            # Open-loop Nash (reference src/lq_open_loop_solver.cpp):
            # the XLA kernel, vmapped — strategies come back as affine
            # laws with P=0, so every downstream kernel (rollout, merit
            # sweep) is shared with the feedback path unchanged.
            from ilqgames_tpu.solver.lq_open_loop import solve_lq_open_loop

            lqsol = jax.vmap(
                lambda l, q, d: solve_lq_open_loop(spec, l, q, d)
            )(lin, c.quad, x0 - c.op.xs[:, 0])
        else:
            lqsol = solve_lq_feedback_pallas(
                spec, lin, c.quad, x0 - c.op.xs[:, 0],
                adaptive_regularization=params.adaptive_regularization,
                batch_block=batch_block, interpret=interpret,
            )
        expected_decrease = jax.vmap(
            lambda q, a, d: ilq._expected_decrease(spec, q, a, d)
        )(c.quad, lqsol.strategy.alphas, lqsol.delta_xs)
        lq_strategy = lqsol.strategy

        def sweep_chunk_fn(scal_c):
            return sweep_merits_pallas(
                dyn, player_costs, spec, x0, last_op, lq_strategy,
                scal_c, al_state, gate,
                batch_block=batch_block, interpret=interpret,
            )


        def sweep_compact_fn(sel, scal_w):
            # Gather the selected lanes (batch-major: leading axis) into
            # one lane block and sweep only that block; scal_w [Bc, CD]
            # gives each gathered lane its own candidate window.
            Bc = sel.shape[0]
            g = lambda t: jax.tree_util.tree_map(
                lambda a: jnp.take(a, sel, axis=0), t)
            return sweep_merits_pallas(
                dyn, player_costs, spec, x0[sel], g(last_op),
                g(lq_strategy), scal_w, g(al_state), gate[sel],
                batch_block=Bc, interpret=interpret,
            )

        def reroll_fn(scal_lane):
            return rollout_pallas(
                dyn, spec, x0, last_op, lq_strategy, scal=scal_lane,
                batch_block=batch_block, interpret=interpret,
            )

        quad_of = lambda op: _quad_b(player_costs, spec, op, al_state,
                                     c.extreme_ks)

    if not params.linesearch:
        scal = jnp.full((Bt,), params.initial_alpha_scaling, jnp.float32)
        trial_op = reroll_fn(scal)
        if _all_sum(player_costs):
            extreme_ks = c.extreme_ks
        else:
            _, extreme_ks = _totals_b(player_costs, spec, trial_op)
        if fuse_stages:
            quad = _empty_quad(Bt)
        else:
            quad = _quad_b(player_costs, spec, trial_op, al_state,
                           extreme_ks)
        scaled = lq_strategy.scale_alphas(params.initial_alpha_scaling)
        return c.replace(
            op=trial_op, strategy=scaled, quad=quad, extreme_ks=extreme_ks,
            iteration=c.iteration + 1,
        )

    if stage1_cands is None:
        stage1_cands = params.linesearch_chunk
    n_cand = params.max_backtracking_steps
    scalings = params.initial_alpha_scaling * (
        params.geometric_alpha_scaling
        ** jnp.arange(n_cand, dtype=jnp.float32)
    )

    # ADAPTIVE two-phase linesearch ladder. Selection is the same
    # first-Armijo-pass rule as the reference's sequential backtracking
    # (src/ilq_solver.cpp:325-343), evaluated in parallel; unevaluated
    # merits stay +inf, which never passes Armijo, and a lane's selected
    # candidate is its FIRST pass, so evaluating EXTRA candidates for
    # any lane can never change its selection — every variant below is
    # decision-identical to evaluating the whole ladder.
    #
    # Phase 1 sweeps the first `stage1_cands` candidates for the FULL
    # batch (measured idx distribution: ~94% of accepting lanes take
    # candidate 0 — tools/profile_trip3.txt selected_idx_hist). Phase 2
    # then serves only the unhappy lanes: when they fit in one lane
    # block they are GATHERED into a single compact block and the deep
    # candidate windows are swept at 1-block cost instead of B/128
    # blocks (the deep tail previously made every trip pay the full
    # 5-chunk ladder across the whole batch — 130 of the 145 ms trip).
    # Hopeless lanes (reject everything) still force full-depth
    # evaluation — the reference pays the same 100 sequential rollouts.
    #
    # f32 ladder cap: candidates past `linesearch_eval_cap` are bitwise
    # identical to the last evaluated one (params.py rationale), so only
    # the first n_eval merits are computed; Armijo still sees every
    # candidate's own threshold below.
    cap = params.linesearch_eval_cap
    n_eval = min(n_cand, cap) if cap > 0 else n_cand
    C1 = min(stage1_cands, n_eval)
    CD = min(params.linesearch_deep_chunk, n_eval)
    n_deep = -(-max(n_eval - C1, 0) // CD)
    Cp = C1 + n_deep * CD
    pad = Cp - n_eval
    scal_full = jnp.concatenate(
        [scalings[:n_eval],
         jnp.full((pad,), scalings[n_eval - 1], jnp.float32)])

    def armijo(merits, scal_c):
        return (
            (c.last_merit[:, None] - merits)
            >= params.expected_decrease_fraction * scal_c[None, :]
            * expected_decrease[:, None]
        )

    def unhappy_of(buf):
        u = ~jnp.any(armijo(buf, scal_full), axis=1)
        if active is not None:
            u = u & active
        return u

    # Phase 1: first chunk, full batch (always evaluated — matches the
    # reference, which always rolls out the first candidate).
    buf = jnp.full((Bt, Cp), jnp.inf, jnp.float32)
    m1 = sweep_chunk_fn(scal_full[:C1])
    buf = jax.lax.dynamic_update_slice(buf, m1, (0, 0))

    if n_deep > 0:
        # Compact deep ladder with PER-LANE candidate windows: every
        # round gathers up to one lane block of unhappy lanes and
        # evaluates, for each gathered lane, ITS OWN next CD candidates
        # (the sweep kernel takes per-lane stepsizes). One kernel shape
        # serves ANY unhappy count — round count is proportional to the
        # total deep work, not to the batch:
        #   * <=Bc unhappy lanes: one round per shared window (the
        #     common case — they all sit at the same offset).
        #   * >Bc unhappy lanes: extra rounds drain them block by
        #     block, each lane advancing through its own windows.
        # A tiered-gather lax.switch variant compiled >80 min (one
        # sweep instantiation per tier); this keeps exactly one compact
        # sweep shape. Tail (happy) lanes gathered as fill get extra
        # candidates evaluated — selection-invariant (header note).
        Bc = min(batch_block, Bt)

        def deep_cond(state):
            buf, nxt, rounds = state
            u = unhappy_of(buf) & (nxt < Cp)
            return jnp.any(u)

        def deep_body(state):
            buf, nxt, rounds = state
            u = unhappy_of(buf) & (nxt < Cp)
            # Work-optimal packing: serve unhappy lanes with the SMALLEST
            # next-candidate offset first. Serving a fixed first-Bc set
            # (argsort(~u)) exhausts those lanes' windows before touching
            # the rest, leaving the final rounds underfilled when
            # unhappy > Bc (measured at B=1024: 10-11 rounds for ~180
            # unhappy lanes vs the ceil(work/Bc) = 8 optimum —
            # tools/profile_trip4.txt ladder_stats). Smallest-nxt-first
            # equalizes progress so every round stays full of real work.
            # Selection-invariant: evaluation order never changes the
            # first-Armijo-pass selection (header note).
            key = jnp.where(u, nxt, Cp + 1)
            sel = jnp.argsort(key)[:Bc]
            offs = nxt[sel]                              # [Bc]
            # Per-lane windows; dynamic_slice clamps at the ladder end,
            # which re-evaluates (overwrites) identical tail merits.
            scal_w = jax.vmap(
                lambda o: jax.lax.dynamic_slice(scal_full, (o,), (CD,))
            )(offs)                                      # [Bc, CD]
            m_c = sweep_compact_fn(sel, scal_w)          # [Bc, CD]
            rows = jax.vmap(
                lambda r, m, o: jax.lax.dynamic_update_slice(r, m, (o,))
            )(buf[sel], m_c, offs)
            # f32-collapse early exit: the geometric ladder collapses —
            # past k ~ 25 every candidate's controls round to the
            # alpha->0 limit, so merits freeze (linesearch_eval_cap's
            # rationale, params.py). A lane whose ENTIRE window came
            # back bitwise-uniform is inside that frozen regime: fill
            # its remaining ladder with the frozen value (what deeper
            # evaluation would return) and stop walking it. Armijo
            # still sees every candidate's own threshold, so selection
            # matches full evaluation; the all-CD-equal guard (not just
            # last-two) makes a coincidental trigger require CD
            # distinct trajectories with bitwise-equal merits. Saves
            # the deepest round(s) of every reject-heavy lane's walk —
            # the rounds that exist only to prove reject-all.
            if CD >= 2:
                uniform = jnp.all(m_c == m_c[:, :1], axis=1)  # [Bc]
                cols = jnp.arange(Cp)[None, :]
                fill = uniform[:, None] & (cols >= (offs + CD)[:, None])
                rows = jnp.where(fill, m_c[:, -1:], rows)
                nxt_new = jnp.where(uniform, Cp, offs + CD)
            else:
                nxt_new = offs + CD
            buf = buf.at[sel].set(rows)
            nxt = nxt.at[sel].set(nxt_new)
            return buf, nxt, rounds + 1

        buf, _, deep_rounds = jax.lax.while_loop(
            deep_cond, deep_body,
            (buf, jnp.full((Bt,), C1, jnp.int32),
             jnp.zeros((), jnp.int32)),
        )
        chunks_used = 1 + deep_rounds
    else:
        chunks_used = jnp.ones((), jnp.int32)
    merits = buf

    # Extend the evaluated merits across the full ladder (constant past
    # n_eval — see the cap rationale) and apply Armijo with every
    # candidate's own threshold, exactly as full evaluation would.
    merits_full = jnp.concatenate(
        [merits[:, :n_eval],
         jnp.broadcast_to(merits[:, n_eval - 1:n_eval],
                          (Bt, n_cand - n_eval))], axis=1)
    ok = armijo(merits_full, scalings)

    passed = jnp.any(ok, axis=1)
    idx = jnp.argmax(ok, axis=1)
    scal_sel = jnp.where(passed, scalings[idx], scalings[0])
    merit_sel = jnp.where(
        passed, jnp.take_along_axis(merits_full, idx[:, None], 1)[:, 0],
        c.last_merit,
    )

    strategy_sel = lq_strategy.replace(
        alphas=lq_strategy.alphas * scal_sel[:, None, None, None]
    )
    # Re-roll ONLY the selected candidate (per-lane scal): an in-kernel
    # rollout is far cheaper than emitting every candidate's trajectory
    # to HBM (1.7 GB at C=104, B=256) and gathering from it.
    op_sel = reroll_fn(scal_sel)
    quad_sel = quad_of(op_sel)

    failed = ~passed
    converged = passed & (merit_sel <= c.last_merit) & (
        jnp.abs(c.last_merit - merit_sel) < params.convergence_tolerance
    )
    if _all_sum(player_costs):
        extreme_ks = c.extreme_ks
    else:
        _, extreme_ks = _totals_b(player_costs, spec, op_sel)
    out = ilq._SolveCarry(
        op=_bwhere(passed, op_sel, c.op),
        strategy=_bwhere(passed, strategy_sel, c.strategy),
        quad=_bwhere(passed, quad_sel, c.quad),
        extreme_ks=_bwhere(passed, extreme_ks, c.extreme_ks),
        last_merit=jnp.where(passed, merit_sel, c.last_merit),
        iteration=c.iteration + 1,
        converged=converged,
        failed=failed,
    )
    if return_stats:
        return out, {"passed": passed, "idx": idx,
                     "chunks_used": chunks_used}
    return out


def _init_inner_batched(dyn, player_costs, spec, x0, op, strategy, al,
                        last_merit, *, batch_block, interpret,
                        fuse_stages=False):
    """Batched ILQSolver::Solve initialization (src/ilq_solver.cpp:82-121)."""
    Bt = x0.shape[0]
    last_op = op.replace(xs=op.xs.at[:, 0].set(x0))
    current_op = rollout_pallas(
        dyn, spec, x0, last_op, strategy,
        batch_block=batch_block, interpret=interpret,
    )
    if _all_sum(player_costs):
        Bt2 = jax.tree_util.tree_leaves(current_op)[0].shape[0]
        extreme_ks = jnp.zeros((Bt2, spec.num_players), jnp.int32)
    else:
        _, extreme_ks = _totals_b(player_costs, spec, current_op)
    if fuse_stages:
        quad = _empty_quad(Bt)
    else:
        quad = _quad_b(player_costs, spec, current_op, al, extreme_ks)
    zi = jnp.zeros((Bt,), jnp.int32)
    zb = jnp.zeros((Bt,), bool)
    return ilq._SolveCarry(
        op=current_op, strategy=strategy, quad=quad, extreme_ks=extreme_ks,
        last_merit=last_merit, iteration=zi, converged=zb, failed=zb,
    )


def _trip_batched(dyn, player_costs, spec, params, x0, fc, *, batch_block,
                  interpret, fuse_stages=False):
    """One trip of the flat machine, batch-level (twin of fused._trip)."""
    c2 = iteration_step_batched(
        dyn, player_costs, spec, params, x0, fc.al, fc.c,
        active=~fc.done, batch_block=batch_block, interpret=interpret,
        fuse_stages=fuse_stages,
    )
    inner_iters = fc.inner_iters + 1
    cum_iters = fc.cum_iters + 1
    inner_budget = params.unconstrained_solver_max_iters
    inner_end = c2.converged | c2.failed | (inner_iters >= inner_budget)
    inner_ok = ~c2.failed

    al_pre = fc.al
    down = lambda lam: lam * params.geometric_lambda_downscaling
    al_failed = al_pre.replace(
        state_lambdas=tuple(down(l) for l in al_pre.state_lambdas),
        control_lambdas=tuple(down(l) for l in al_pre.control_lambdas),
        mu=al_pre.mu * params.geometric_mu_downscaling,
    )
    al_base = _bwhere(c2.failed, al_failed, al_pre)

    continuing = (cum_iters < params.max_solver_iters) & (
        fc.violation > params.constraint_error_tolerance
    )
    done_now = inner_end & ~continuing

    adv = inner_end & inner_ok
    warm_op = _bwhere(adv, c2.op, fc.warm_op)
    warm_strategy = _bwhere(adv, c2.strategy, fc.warm_strategy)

    reinit = inner_end & continuing

    # The AL update + inner re-initialization (a rollout + quadraticize)
    # only matters on trips where some lane crosses an inner-solve
    # boundary — with a 10-iteration inner budget that is <=1 trip in
    # 10 in steady state, so the whole block sits behind a cond. Done
    # lanes never have reinit set (their violation/budget freeze them),
    # so no active-mask is needed here.
    def do_reinit(_):
        al_inc, violation_new = jax.vmap(
            lambda o, a: constraint_violations(player_costs, spec, o, a)
        )(c2.op, al_base)
        al_inc = al_inc.replace(mu=al_inc.mu * params.geometric_mu_scaling)
        c3 = _init_inner_batched(
            dyn, player_costs, spec, x0, warm_op, warm_strategy, al_inc,
            c2.last_merit, batch_block=batch_block, interpret=interpret,
            fuse_stages=fuse_stages,
        )
        return c3, al_inc, violation_new

    def skip_reinit(_):
        return c2, fc.al, fc.violation

    c3, al_inc, violation_new = jax.lax.cond(
        jnp.any(reinit), do_reinit, skip_reinit, None)

    c_next = _bwhere(reinit, c3, c2)
    al_next = _bwhere(reinit, al_inc, _bwhere(c2.failed, al_failed, fc.al))

    return _FusedCarry(
        c=c_next,
        al=al_next,
        warm_op=warm_op,
        warm_strategy=warm_strategy,
        inner_iters=jnp.where(reinit, 0, inner_iters),
        cum_iters=cum_iters,
        violation=jnp.where(reinit, violation_new, fc.violation),
        success=fc.success & jnp.where(inner_end, inner_ok, True),
        done=fc.done | done_now,
    )


def _carry0(dyn, player_costs, spec, x0_b, wop_b, wst_b, al_b,
            batch_block, interpret, fuse_stages=False):
    Bt = x0_b.shape[0]
    c0 = _init_inner_batched(
        dyn, player_costs, spec, x0_b, wop_b, wst_b, al_b,
        jnp.full((Bt,), jnp.inf, jnp.float32),
        batch_block=batch_block, interpret=interpret,
        fuse_stages=fuse_stages,
    )
    return _FusedCarry(
        c=c0, al=al_b, warm_op=c0.op, warm_strategy=c0.strategy,
        inner_iters=jnp.zeros((Bt,), jnp.int32),
        cum_iters=jnp.zeros((Bt,), jnp.int32),
        violation=jnp.full((Bt,), jnp.inf, jnp.float32),
        success=jnp.ones((Bt,), bool),
        done=jnp.zeros((Bt,), bool),
    )


def _pad_args(args, m):
    """Pad every arg's leading batch dim up to a multiple of m by
    replicating lane 0 (a real, convergent instance — zero-padding can
    spin the while loop on lanes that never converge). Batches that are
    not lane-block multiples also tickle odd-shape XLA/Mosaic code paths
    observed to fault on TPU (B=32 under shard_map); host-side padding
    keeps every device program at the well-trodden aligned shapes."""
    Bt = jax.tree_util.tree_leaves(args[0])[0].shape[0]
    Bp = -(-Bt // m) * m
    if Bp == Bt:
        return args, Bt
    pad1 = lambda a: jnp.concatenate(
        [a, jnp.broadcast_to(a[:1], (Bp - Bt,) + a.shape[1:])])
    return tuple(jax.tree_util.tree_map(pad1, a) for a in args), Bt


def _driver_parts(dyn, player_costs, spec, params, trips_per_call,
                  batch_block, interpret, fuse_stages=False):
    """The three device programs shared by every host-stepped driver:
    (trip-pack `steps`, `finalize`, `constrained` flag). Pure code
    motion out of _make_driver so the wave-refill queue driver below
    reuses the IDENTICAL per-lane programs (bitwise parity with the
    plain driver is pinned by tests/test_batched_pallas.py)."""
    constrained = pcost.is_constrained(player_costs)

    if constrained:
        def trip(x0_b, fc):
            fc2 = _trip_batched(
                dyn, player_costs, spec, params, x0_b, fc,
                batch_block=batch_block, interpret=interpret,
                fuse_stages=fuse_stages,
            )
            return _bwhere(fc.done, fc, fc2)
    else:
        # Unconstrained: the trip is a bare iLQ iteration with the full
        # budget (fused.solve delegates to ilq.solve in this case).
        def trip(x0_b, fc):
            c2 = iteration_step_batched(
                dyn, player_costs, spec, params, x0_b, fc.al, fc.c,
                active=~fc.done, batch_block=batch_block,
                interpret=interpret, fuse_stages=fuse_stages,
            )
            cum = fc.cum_iters + 1
            done_now = c2.converged | c2.failed | (
                cum >= params.max_solver_iters
            )
            fc2 = fc.replace(
                c=c2, cum_iters=cum,
                success=fc.success & ~c2.failed,
                done=fc.done | done_now,
            )
            return _bwhere(fc.done, fc, fc2)

    def steps(x0_b, fc):
        # Bounded while_loop instead of a fixed-length scan: a pack ends
        # early once every (local) lane is done, so warm-started solves
        # that converge in a few trips don't pay the full pack. Done
        # lanes are frozen by the trip's own mask, so results are
        # identical; under shard_map the all-done reduction is per-shard
        # (lanes never communicate).
        def cond(s):
            i, fc = s
            return (i < trips_per_call) & ~jnp.all(fc.done)

        def body(s):
            i, fc = s
            return i + 1, trip(x0_b, fc)

        _, fc = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), fc))
        return fc

    def finalize(fc):
        fv = jax.vmap(
            lambda o: max_constraint_violation(player_costs, spec, o)
        )(fc.c.op)
        totals, _ = _totals_b(player_costs, spec, fc.c.op)
        if constrained:
            conv = fc.success & (fv <= params.constraint_error_tolerance)
        else:
            conv = fc.c.converged & ~fc.c.failed
        return ALResult(
            op=fc.c.op, strategy=fc.c.strategy, total_costs=totals,
            converged=conv, max_violation=fv,
            cumulative_iterations=fc.cum_iters, al_state=fc.al,
        )

    return steps, finalize, constrained


def _make_driver(dyn, player_costs, spec, params, init, trips_per_call,
                 batch_block, interpret, mesh, fuse_stages=False):
    """Shared host-stepped driver: `init(*args) -> _FusedCarry` (args[0]
    must be x0_b), then trips_per_call masked trips per dispatch until
    every lane is done. Optionally shard_mapped over a 1-D mesh."""
    steps, finalize, _ = _driver_parts(
        dyn, player_costs, spec, params, trips_per_call, batch_block,
        interpret, fuse_stages=fuse_stages)

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec

        axis = mesh.axis_names[0]
        pspec = PartitionSpec(axis)
        sm = lambda f, n: shard_map(
            f, mesh=mesh, in_specs=(pspec,) * n, out_specs=pspec,
            check_vma=False,
        )
        # in_specs arity must match the entry point's init signature;
        # built on first use and cached (one jit per arity).
        x0_sharding = NamedSharding(mesh, pspec)
        init_cache = {}

        def init_for(n):
            if n not in init_cache:
                init_cache[n] = jax.jit(sm(init, n))
            return init_cache[n]

        steps_j = jax.jit(sm(steps, 2))
        finalize_j = jax.jit(sm(finalize, 1))
        all_done = jax.jit(lambda fc: jnp.all(fc.done))

        def run(*args):
            args, Bt = _pad_args(args, mesh.size * batch_block)
            args = tuple(jax.device_put(a, x0_sharding) for a in args)
            fc = init_for(len(args))(*args)
            while not bool(all_done(fc)):
                fc = steps_j(args[0], fc)
            out = finalize_j(fc)
            return jax.tree_util.tree_map(lambda a: a[:Bt], out)

        return run

    init_j = jax.jit(init)
    steps_j = jax.jit(steps)
    finalize_j = jax.jit(finalize)
    all_done = jax.jit(lambda fc: jnp.all(fc.done))

    def run(*args):
        args, Bt = _pad_args(args, batch_block)
        fc = init_j(*args)
        while not bool(all_done(fc)):
            fc = steps_j(args[0], fc)
        out = finalize_j(fc)
        return jax.tree_util.tree_map(lambda a: a[:Bt], out)

    return run


def make_host_batched_solver(dyn, player_costs, spec, params,
                             warm_op=None, warm_strategy=None,
                             trips_per_call: int = 25,
                             batch_block: int = 128,
                             interpret: bool = False,
                             mesh=None,
                             fuse_stages: Optional[bool] = None):
    """Batched Pallas solve with bounded device programs (twin of
    fused.make_host_batched_solver): each dispatch runs `trips_per_call`
    masked trips for the whole batch; the host loops until all lanes are
    done. Returns fn(x0 [B, xdim]) -> batched ALResult.

    With `mesh` (a 1-D jax.sharding.Mesh over the batch axis), every
    device program is wrapped in `shard_map`: each device runs the Pallas
    kernels on its local batch shard, and no collectives are needed until
    the host-side all-done reduction (instances never communicate —
    docs/scaling.md). The global batch must divide mesh size *
    batch_block... or rather mesh size; each shard pads to batch_block
    lanes internally."""
    fuse_stages = _resolve_fuse_for(params, fuse_stages, dyn)
    if warm_op is None:
        warm_op = OperatingPoint.zeros(spec)
    if warm_strategy is None:
        warm_strategy = Strategy.zeros(spec)

    def init(x0_b):
        Bt = x0_b.shape[0]
        al0 = jax.vmap(
            lambda _: pcost.ALState.init(player_costs, spec)
        )(jnp.arange(Bt))
        bc = lambda t: jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (Bt,) + a.shape), t
        )
        return _carry0(dyn, player_costs, spec, x0_b, bc(warm_op),
                       bc(warm_strategy), al0, batch_block, interpret,
                       fuse_stages=fuse_stages)

    return _make_driver(dyn, player_costs, spec, params, init,
                        trips_per_call, batch_block, interpret, mesh,
                        fuse_stages=fuse_stages)


def make_host_batched_warm_solver(dyn, player_costs, spec, params,
                                  trips_per_call: int = 25,
                                  batch_block: int = 128,
                                  interpret: bool = False,
                                  mesh=None,
                                  fuse_stages: Optional[bool] = None):
    """Warm-started batched Pallas solve: fn(x0 [B,x], warm_op, 
    warm_strategy, al_state — all batched) -> ALResult. The receding-
    horizon replanning path (runtime/receding_horizon.py simulate_batched
    backend='pallas')."""

    fuse_stages = _resolve_fuse_for(params, fuse_stages, dyn)

    def init(x0_b, wop_b, wst_b, al_b):
        return _carry0(dyn, player_costs, spec, x0_b, wop_b, wst_b, al_b,
                       batch_block, interpret, fuse_stages=fuse_stages)

    return _make_driver(dyn, player_costs, spec, params, init,
                        trips_per_call, batch_block, interpret, mesh,
                        fuse_stages=fuse_stages)


def make_host_batched_queue_solver(dyn, player_costs, spec, params,
                                   warm_op=None, warm_strategy=None,
                                   device_batch: int = 1024,
                                   trips_per_call: int = 10,
                                   batch_block: int = 128,
                                   harvest_block: Optional[int] = None,
                                   interpret: bool = False,
                                   fuse_stages: Optional[bool] = None):
    """Wave-refill batched solve: keeps `device_batch` lanes hot by
    retiring finished lanes and refilling them from the pending
    instance queue, so device throughput tracks the MEAN iteration
    count (~84 on the flagship) instead of the batch max (~109 — the
    deep diverged-tail lanes previously left every finished lane idle
    until the last lane's final trip). fn(x0 [B_total, xdim]) ->
    ALResult for all instances, in order.

    Per-instance results are bitwise IDENTICAL to
    make_host_batched_solver: the device programs are the same
    (_driver_parts), every kernel is lane-elementwise (cross-lane
    coupling exists only in selection-invariant control flow — the
    compact deep ladder's packing order and the any-lane reinit cond,
    both of which select per-lane values computed from per-lane data),
    and a refilled lane's carry is initialized exactly as lane 0 of a
    fresh solve. Pinned by tests/test_batched_pallas.py.

    Mechanics: harvest/refill happens in fixed `harvest_block`-sized
    chunks (one compiled shape for every gather/scatter/init program);
    harvested results are scattered into an on-device result buffer
    (no per-chunk host transfer — the axon tunnel's bandwidth would
    otherwise eat the gain). Ragged final chunks are padded with
    duplicate lanes (harmless: gathers re-read, scatters re-write the
    same rows); lanes with no pending instance left retire with
    done=True so they freeze instead of solving junk.

    `harvest_block` (default batch_block) sets the refill granularity.
    The flagship's trip distribution is bimodal (78% of lanes at
    ~100-109 trips, 22% at ~15, tools/bench_b1024_lanes.npz): mid-wave
    completions drip in at ~10/dispatch, so a 128-lane chunk makes a
    freed lane wait ~12 dispatches for its refill and the makespan
    collapses back to the plain driver's (measured: 44 dispatches vs
    the work-conserving bound's ~36, tools/bench_r5d.log). A small
    harvest_block (32) trades a few extra ~40 ms chunk dispatches for
    prompt refills."""
    import numpy as np

    fuse_stages = _resolve_fuse_for(params, fuse_stages, dyn)
    if warm_op is None:
        warm_op = OperatingPoint.zeros(spec)
    if warm_strategy is None:
        warm_strategy = Strategy.zeros(spec)

    steps, finalize, _ = _driver_parts(
        dyn, player_costs, spec, params, trips_per_call, batch_block,
        interpret, fuse_stages=fuse_stages)

    def init(x0_b):
        Bt = x0_b.shape[0]
        al0 = jax.vmap(
            lambda _: pcost.ALState.init(player_costs, spec)
        )(jnp.arange(Bt))
        bc = lambda t: jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (Bt,) + a.shape), t
        )
        return _carry0(dyn, player_costs, spec, x0_b, bc(warm_op),
                       bc(warm_strategy), al0, batch_block, interpret,
                       fuse_stages=fuse_stages)

    init_j = jax.jit(init)
    steps_j = jax.jit(steps)
    tmap = jax.tree_util.tree_map
    H = batch_block if harvest_block is None else harvest_block

    def _harvest_refill(fc, buf, x0d, lanes, inst, x0_new, keep):
        """ONE dispatch per harvest chunk: finalize the H harvested
        lanes (H-row shapes — not the full device batch), scatter their
        results into the on-device buffer, init the replacement
        instances, and swap them into the freed lanes. Folding the
        five previous dispatches (full-batch finalize, gather, init,
        scatter, refill) into one cut the ~5x 27 ms tunnel round trips
        per chunk that erased the queue driver's gain in its first
        TPU measurement (tools/bench_r5b.log: 67.0/s vs plain 68.1)."""
        sub_fc = tmap(lambda a: a[lanes], fc)
        res = finalize(sub_fc)
        buf2 = tmap(lambda b, s: b.at[inst].set(s), buf, res)
        new_c = init(x0_new)
        fc2 = tmap(lambda a, b: a.at[lanes].set(b), fc, new_c)
        # Retired lanes (no pending instance left) freeze as done.
        fc2 = fc2.replace(done=fc2.done.at[lanes].set(~keep))
        return fc2, buf2, x0d.at[lanes].set(x0_new)

    harvest_j = jax.jit(_harvest_refill, donate_argnums=(0, 1, 2))
    # No donation: the gathered outputs are smaller than the inputs, so
    # buffers can't be reused (donating just warns); <=log2(D/block)
    # compactions per run make the copies irrelevant.
    compact_j = jax.jit(
        lambda fc, x0d, idx: (tmap(lambda a: a[idx], fc), x0d[idx]))

    def run(x0_all):
        x0_all = jnp.asarray(x0_all)
        Btot = x0_all.shape[0]
        D = min(-(-device_batch // H) * H, -(-Btot // H) * H)
        n0 = min(D, Btot)
        slot_inst = np.full((D,), -1, np.int64)
        slot_inst[:n0] = np.arange(n0)
        x0d = jnp.concatenate(
            [x0_all[:n0],
             jnp.broadcast_to(x0_all[:1], (D - n0, x0_all.shape[1]))]
        ) if D > n0 else x0_all[:D]
        next_i = n0
        harvested = np.zeros((Btot,), bool)
        fc = init_j(x0d)
        if D > n0:
            fc = fc.replace(done=fc.done.at[jnp.arange(n0, D)].set(True))
        # Result buffer allocated up front from finalize's output spec.
        sub_spec = jax.eval_shape(lambda t: tmap(lambda a: a[:H], t), fc)
        res_spec = jax.eval_shape(finalize, sub_spec)
        buf = tmap(lambda s: jnp.zeros((Btot,) + s.shape[1:], s.dtype),
                   res_spec)
        stats = {"dispatches": 0, "harvests": 0, "done_per_dispatch": []}

        # `done` is tracked host-side between device reads: steps_j is
        # the only program that can newly finish a lane, so one read per
        # steps dispatch suffices; harvest/refill updates it locally.
        while not harvested.all():
            fc = steps_j(x0d, fc)
            stats["dispatches"] += 1
            done = np.array(fc.done)  # writable copy (host-tracked)
            stats["done_per_dispatch"].append(int(done.sum()))
            while True:
                elig = np.nonzero(done & (slot_inst >= 0))[0]
                pending = next_i < Btot
                # Full chunks only while instances remain (refills keep
                # every pad-row invariant trivial); ragged chunks occur
                # only in the final drain, where every lane retires.
                if not (len(elig) >= H or (not pending and len(elig))):
                    break
                lanes = elig[:H]
                n = len(lanes)
                lanes_p = (np.concatenate([lanes,
                                           np.full(H - n, lanes[0])])
                           if n < H else lanes)
                inst = slot_inst[lanes]
                inst_p = (np.concatenate([inst, np.full(H - n, inst[0])])
                          if n < H else inst)
                k = min(n, Btot - next_i)
                new_inst = np.arange(next_i, next_i + k)
                next_i += k
                keep = np.zeros((H,), bool)
                keep[:k] = True
                fill = np.concatenate([new_inst,
                                       np.zeros(H - k, np.int64)])
                fc, buf, x0d = harvest_j(
                    fc, buf, x0d, jnp.asarray(lanes_p),
                    jnp.asarray(inst_p), x0_all[jnp.asarray(fill)],
                    jnp.asarray(keep))
                stats["harvests"] += 1
                harvested[inst] = True
                slot_inst[lanes] = np.where(keep[:n], fill[:n], -1)
                done[lanes] = ~keep[:n]
            # Drain-phase compaction: once the instance queue is empty
            # and the still-active lanes fit in half the device batch,
            # gather them into a half-size batch — the remaining trips
            # then cost proportionally less (the round-5d stats showed
            # ~14% of all lane-trips idling in the drain ramp). Pure
            # gather: per-lane arithmetic is unchanged, pinned by the
            # queue parity test. Each size's programs compile once and
            # persist in the jit/persistent caches.
            if next_i >= Btot:
                while D > batch_block:
                    active_idx = np.nonzero(~done)[0]
                    newD = D // 2
                    if (newD < batch_block or newD % batch_block
                            or len(active_idx) > newD):
                        break
                    fill_idx = np.nonzero(done)[0][:newD - len(active_idx)]
                    perm = np.concatenate([active_idx, fill_idx])
                    fc, x0d = compact_j(fc, x0d, jnp.asarray(perm))
                    slot_inst = slot_inst[perm]
                    done = done[perm]
                    D = newD
                    stats["compactions"] = stats.get("compactions", 0) + 1
        run.last_stats = dict(stats)
        return buf

    run.last_stats = None
    return run
