"""Forward rollout and parallel-linesearch merit sweep as Pallas kernels.

Replicates, in-kernel, the two horizon scans of the iterative solver:
  * `dyn_base.rollout` — ILQSolver::CurrentOperatingPoint
    (reference src/ilq_solver.cpp:174-206);
  * the fused merit sweep of `solver/ilq.py:tranche_merits` — the parallel
    form of the reference's backtracking linesearch + gradient-only merit
    (src/ilq_solver.cpp:289-435).

One kernel template serves both: a rollout is a sweep with one candidate,
no merit accumulation, and trajectory emission on. Candidate stepsizes
ride the sublane axis next to the state ([x, C, B] slabs, state-major);
the batch stays in lanes. Dynamics and cost-gradient code is NOT
reimplemented — the per-instance `dyn.ode` / `stage_gradients_core`
functions are double-vmapped (candidates x lanes) inside the kernel, so
semantics match the scan path by construction.

VMEM-resident: the whole horizon for one batch block (~7 MB of reference
trajectory + strategy at N=100, Bb=128) fits comfortably in VMEM, so the
grid is batch blocks only and one `fori_loop` walks all N knots with no
per-time-block DMA or grid bookkeeping. Measured floor (tools/
kernel_floor.py): an in-kernel RK4+feedback step costs ~4 us at Bb=128 —
the previous time-streamed formulation paid ~80 us/step in grid/DMA
overhead for the same math.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.ops.pallas.layout import bm, mb, pad_batch
from ilqgames_tpu.types import GameSpec, OperatingPoint, Strategy


def _time_block(n: int, cap: int = 16) -> int:
    """Largest divisor of n not exceeding cap (knots per grid step)."""
    for tb in range(min(cap, n), 0, -1):
        if n % tb == 0:
            return tb
    return 1


def _resolve_merit_backend(merit_backend=None) -> str:
    """Resolve the sweep-merit backend: "xla" (default — emit candidate
    trajectories, compute merits in plain XLA) or "kernel" (in-kernel
    accumulation). `None` falls back to the ILQ_SWEEP_MERIT env var.

    Why "xla" is the default: the cost-gradient content inside the
    Mosaic kernel hits an unpredictable ~100 us/knot scheduling cliff
    (tools/sweep_floor5b-h.txt: a 2-segment polyline query costs
    0.49 us/knot, the 6-segment one 105; 1-player quadratics 0.5,
    2-player 101 — no stable invariant), while the same math under
    plain XLA over emitted candidate trajectories costs ~2.5 us/knot/
    block INCLUDING the emit (tools/sweep_floor5i.txt).

    The backend is threaded as an explicit STATIC argument through the
    sweep entry points so it participates in every jit cache key; when
    left as `None` the env var is read at trace time, so flipping
    ILQ_SWEEP_MERIT mid-process has no effect on already-traced
    solvers — set it before first use, or pass `merit_backend`
    explicitly."""
    if merit_backend is None:
        merit_backend = os.environ.get("ILQ_SWEEP_MERIT", "xla")
    if merit_backend not in ("xla", "kernel", "pallas"):
        raise ValueError(
            f"merit_backend must be 'xla', 'kernel' or 'pallas', got "
            f"{merit_backend!r}")
    return merit_backend


# Scoped-VMEM budget for the sweep kernel's RESIDENT arrays (operand +
# output + scratch blocks). The kernel requests vmem_limit_bytes=100 MiB
# from Mosaic; the gap between this budget and that limit is headroom
# for double-buffering of grid blocks and the compute temporaries of the
# in-kernel rollout/merit math, which the static model below cannot see.
# Calibration: the flagship sweep (N=100, x=16, Pu=6, C=8, Bb=128,
# ~10 MiB resident) compiles and runs; a C=40 tiered-ladder variant with
# multiple live instantiations OOM'd at 117.4 MiB on v5e
# (tools/tpu_bench_b1024c.log). 40 MiB resident leaves >2x headroom.
_VMEM_RESIDENT_BUDGET = 40 * 1024 * 1024


def _resident_bytes(spec, *, C, Bb, nS, nC, compute_merit, emit_traj):
    """Static VMEM-resident footprint (bytes) of one sweep-kernel block:
    every operand/output BlockSpec in `_run` plus the state scratch.
    Mirrors `_run`'s spec list — keep the two in sync."""
    N = spec.num_time_steps
    P = spec.num_players
    x = spec.xdim
    Pu = P * spec.umax
    words = N * x + N * Pu + N * Pu * x + N * Pu  # xs, us, Ps, alphas
    if compute_merit:
        words += N * P + N * nS + N * nC + 1      # gate, lamS, lamC, mu
        words += C                                # merit out
    words += 1 + C + x                            # t0, scal, x0
    if emit_traj:                                 # True or "xs"
        words += N * C * x                        # xs_out
    if emit_traj is True:
        words += N * C * Pu                       # us_out
    words += x * C                                # xcur scratch
    return words * Bb * 4


def check_vmem(spec, *, C, Bb, nS=0, nC=0, compute_merit=True,
               emit_traj=False):
    """Fail fast (with an actionable message) when a sweep-kernel launch
    would blow past the scoped-VMEM budget — the runtime alternative is
    an opaque Mosaic allocation error after minutes of compilation
    (observed: tools/tpu_bench_b1024c.log). Returns the footprint."""
    got = _resident_bytes(spec, C=C, Bb=Bb, nS=nS, nC=nC,
                          compute_merit=compute_merit,
                          emit_traj=emit_traj)
    if got > _VMEM_RESIDENT_BUDGET:
        raise ValueError(
            f"sweep kernel resident VMEM {got / 2**20:.1f} MiB exceeds "
            f"the {_VMEM_RESIDENT_BUDGET / 2**20:.0f} MiB budget "
            f"(N={spec.num_time_steps}, xdim={spec.xdim}, C={C}, "
            f"batch_block={Bb}, emit_traj={emit_traj}). Reduce "
            f"batch_block or the candidate chunk (cand_chunk / "
            f"SolverParams.linesearch_deep_chunk)."
        )
    return got


def _fit_cand_chunk(spec, *, C, Bb, nS, nC, cap, emit_traj=False):
    """Largest divisor-of-C chunk width <= cap whose sweep launch fits
    the VMEM budget (auto-split instead of the runtime Mosaic OOM).
    Raises via check_vmem if even single-candidate launches don't fit."""
    Cc = _time_block(C, cap=cap)
    while Cc > 1:
        if _resident_bytes(spec, C=Cc, Bb=Bb, nS=nS, nC=nC,
                           compute_merit=True,
                           emit_traj=emit_traj) <= _VMEM_RESIDENT_BUDGET:
            return Cc
        Cc = _time_block(C, cap=Cc - 1)
    check_vmem(spec, C=1, Bb=Bb, nS=nS, nC=nC, emit_traj=emit_traj)
    return 1


def _make_grads_cb(player_costs, spec):
    """Double-vmapped per-player SQUARED-gradient sums over state-major
    [x, C, B] layouts (candidates on axis 1), as TUPLES of P [C, B]
    scalars. Squared sums come straight from sparse gradient pairs —
    assembling dense [P, xd] gradients in-kernel just to square them
    cost ~66 vreg copies per knot (tools/grads_floor3.txt). Tuple
    (unstacked) outputs: a stacked [P] core output vmaps into a
    lane-minor [C, B, P] concatenate + two cross-lane transposes per
    knot that Mosaic lowers at ~100 us/knot — 375x the cost of the
    gradient math itself (tools/sweep_floor5*.txt)."""
    def grads_cb(t, x_cb, us_cb, lamS, lamC, mu):
        def core(tt, xx, uu, ls, lc, m):
            return pcost.stage_gradient_sq_tuple(
                player_costs, spec, ls, lc, m, tt, xx, uu
            )

        # Scalar leaves: inner vmap appends B (-1 -> [B]), outer
        # prepends C (0 -> [C, B]).
        inner = jax.vmap(core, in_axes=(0, -1, -1, -1, -1, 0),
                         out_axes=-1)
        outer = jax.vmap(inner, in_axes=(None, 1, 2, None, None, None),
                         out_axes=0)
        return outer(t, x_cb, us_cb, lamS, lamC, mu)

    return grads_cb


def _make_kernel(dyn, player_costs, spec: GameSpec, C: int, nS: int,
                 nC: int, compute_merit: bool, emit_traj: bool, N: int):
    P = spec.num_players
    x = spec.xdim
    u = spec.umax
    Pu = P * u
    dt = spec.dt
    # Concrete numpy (spec.u_mask() builds a traced jnp array under jit).
    u_mask_flat = np.zeros((Pu,), np.float32)
    for i, d in enumerate(spec.udims):
        u_mask_flat[i * u:i * u + d] = 1.0

    if compute_merit:
        n_sc = [len(pc.state_constraints) for pc in player_costs]
        n_cc = [len(pc.control_constraints) for pc in player_costs]
        sc_off = np.cumsum([0] + n_sc)
        cc_off = np.cumsum([0] + n_cc)
        grads_cb = _make_grads_cb(player_costs, spec)

    def integ_cb(t, x_cb, us_cb):
        """RK4 step on [x, C, B] state / [P, u, C, B] controls. The
        state dim stays OUTERMOST so every per-dimension access inside
        the traced dynamics is a contiguous sublane row group — the
        candidate-inner layout ([C, x, B]) made each one a strided
        sublane shuffle (~4x slower end to end)."""
        def one(tt, xx, uu):
            return dyn_base.integrate(dyn, tt, dt, xx, uu)

        inner = jax.vmap(one, in_axes=(0, -1, -1), out_axes=-1)
        outer = jax.vmap(inner, in_axes=(None, 1, 2), out_axes=1)
        return outer(t, x_cb, us_cb)

    def kernel(*refs):
        it = iter(refs)
        xs_ref = next(it)
        us_ref = next(it)
        Ps_ref = next(it)
        al_ref = next(it)
        gate_ref = next(it) if compute_merit else None
        lamS_ref = next(it) if (compute_merit and nS > 0) else None
        lamC_ref = next(it) if (compute_merit and nC > 0) else None
        mu_ref = next(it) if compute_merit else None
        t0_ref = next(it)
        scal_ref = next(it)
        x0_ref = next(it)
        merit_ref = next(it) if compute_merit else None
        xso_ref = next(it) if emit_traj else None
        uso_ref = next(it) if emit_traj is True else None
        xcur = next(it)  # scratch [x, C, Bb]

        xcur[...] = jnp.broadcast_to(
            x0_ref[...][:, None, :],
            (x0_ref.shape[0], C, x0_ref.shape[1]),
        )
        if compute_merit:
            merit_ref[...] = jnp.zeros_like(merit_ref)

        scal = scal_ref[...]                  # [C, B]

        def step(k, _):
            x_c = xcur[...]                   # [x, C, B] (state-major)
            x_ref_k = xs_ref[pl.ds(k, 1)][0]  # [x, B]
            u_ref_k = us_ref[pl.ds(k, 1)][0]  # [Pu, B]
            P_k = Ps_ref[pl.ds(k, 1)][0]      # [Pu, x, B]
            a_k = al_ref[pl.ds(k, 1)][0]      # [Pu, B]
            t = t0_ref[0] + k.astype(jnp.float32) * dt  # [B]

            delta = x_c - x_ref_k[:, None, :]  # [x, C, B]
            us_rows = []
            for af in range(Pu):
                acc = P_k[af, 0][None, :] * delta[0]
                for xx in range(1, x):
                    acc = acc + P_k[af, xx][None, :] * delta[xx]
                row = (u_ref_k[af][None, :] - acc - scal * a_k[af][None, :])
                us_rows.append(row * float(u_mask_flat[af]))
            us_flat = jnp.stack(us_rows, axis=0)  # [Pu, C, B]
            us_cb = us_flat.reshape(P, u, C, us_flat.shape[-1])

            if compute_merit:
                lamS = tuple(
                    lamS_ref[pl.ds(k, 1)][0, sc_off[p_]:sc_off[p_ + 1]]
                    for p_ in range(P)
                ) if nS > 0 else tuple(
                    jnp.zeros((0, x_c.shape[-1]), jnp.float32)
                    for _ in range(P)
                )
                lamC = tuple(
                    lamC_ref[pl.ds(k, 1)][0, cc_off[p_]:cc_off[p_ + 1]]
                    for p_ in range(P)
                ) if nC > 0 else tuple(
                    jnp.zeros((0, x_c.shape[-1]), jnp.float32)
                    for _ in range(P)
                )
                mu = mu_ref[0]                # [B]
                s_cb, r_cb = grads_cb(t, x_c, us_cb, lamS, lamC, mu)
                # s_cb/r_cb: tuples of P [C, B] scalars; gate [P, B].
                # gate is 0/1, so gating the squared sum equals squaring
                # the gated gradient ((l*g)^2 = l^2*g for g in {0,1}).
                # Per-player left-fold sums match the previous stacked
                # jnp.sum(axis=0) association exactly.
                gate_k = gate_ref[pl.ds(k, 1)][0]
                state_term = s_cb[0] * gate_k[0][None, :]
                for p_ in range(1, P):
                    state_term = state_term + s_cb[p_] * gate_k[p_][None, :]
                ctrl_term = r_cb[0]
                for p_ in range(1, P):
                    ctrl_term = ctrl_term + r_cb[p_]
                inc = ctrl_term + jnp.where(k > 0, state_term, 0.0)
                merit_ref[...] = merit_ref[...] + inc

            if emit_traj:
                # 4D stores (axis-insert only, no flatten-reshape): the
                # [x, C, B] -> [1, x*C, B] flatten before the store made
                # the C=1 reroll pay 27 us/knot of relayout vs 1.8 for
                # the reshape-free form (tools/sweep_floor5d/i.txt).
                xso_ref[pl.ds(k, 1)] = x_c[None]
            if emit_traj is True:
                uso_ref[pl.ds(k, 1)] = us_flat[None]

            xcur[...] = integ_cb(t, x_c, us_cb)
            return 0

        jax.lax.fori_loop(0, N, step, 0)

    return kernel


def _run(dyn, player_costs, spec, x0, last_op, strategy, scal_cb,
         al_lamS, al_lamC, mu, gate, compute_merit, emit_traj,
         batch_block, interpret):
    """Shared driver. All array args batch-minor and lane-padded.

    Grid is batch blocks ONLY: every operand's full horizon lands in VMEM
    once per block and the kernel walks all N knots in one fori_loop
    (dynamic in-VMEM slicing). Pallas double-buffers the next batch
    block's DMA behind the current block's compute."""
    N = spec.num_time_steps
    P = spec.num_players
    x = spec.xdim
    u = spec.umax
    Pu = P * u
    C = scal_cb.shape[0]
    B = x0.shape[-1]
    Bb = batch_block
    nb = B // Bb
    nS = al_lamS.shape[1] if (compute_merit and al_lamS is not None) else 0
    nC = al_lamC.shape[1] if (compute_merit and al_lamC is not None) else 0
    check_vmem(spec, C=C, Bb=Bb, nS=nS, nC=nC,
               compute_merit=compute_merit, emit_traj=emit_traj)

    whole3 = lambda b: (0, 0, b)
    whole4 = lambda b: (0, 0, 0, b)
    res = lambda b: (0, b)

    in_specs = [
        pl.BlockSpec((N, x, Bb), whole3, memory_space=pltpu.VMEM),
        pl.BlockSpec((N, Pu, Bb), whole3, memory_space=pltpu.VMEM),
        pl.BlockSpec((N, Pu, x, Bb), whole4, memory_space=pltpu.VMEM),
        pl.BlockSpec((N, Pu, Bb), whole3, memory_space=pltpu.VMEM),
    ]
    operands = [last_op["xs"], last_op["us"], strategy["Ps"],
                strategy["alphas"]]
    if compute_merit:
        in_specs.append(pl.BlockSpec((N, P, Bb), whole3,
                                     memory_space=pltpu.VMEM))
        operands.append(gate)
        if nS > 0:
            in_specs.append(pl.BlockSpec((N, nS, Bb), whole3,
                                         memory_space=pltpu.VMEM))
            operands.append(al_lamS)
        if nC > 0:
            in_specs.append(pl.BlockSpec((N, nC, Bb), whole3,
                                         memory_space=pltpu.VMEM))
            operands.append(al_lamC)
        in_specs.append(pl.BlockSpec((1, Bb), res,
                                     memory_space=pltpu.VMEM))
        operands.append(mu)
    in_specs.append(pl.BlockSpec((1, Bb), res, memory_space=pltpu.VMEM))
    operands.append(last_op["t0"])
    in_specs.append(pl.BlockSpec((C, Bb), res, memory_space=pltpu.VMEM))
    operands.append(scal_cb)
    in_specs.append(pl.BlockSpec((x, Bb), res, memory_space=pltpu.VMEM))
    operands.append(x0)

    out_specs = []
    out_shape = []
    if compute_merit:
        out_specs.append(pl.BlockSpec((C, Bb), res,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((C, B), jnp.float32))
    if emit_traj:
        out_specs.append(pl.BlockSpec((N, x, C, Bb), whole4,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((N, x, C, B), jnp.float32))
    if emit_traj is True:
        out_specs.append(pl.BlockSpec((N, Pu, C, Bb), whole4,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((N, Pu, C, B), jnp.float32))

    kern = _make_kernel(dyn, player_costs, spec, C, nS, nC,
                        compute_merit, emit_traj, N=N)
    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((x, C, Bb), jnp.float32)],
        # Whole-horizon resident blocks + the merit sweep's autodiff
        # temporaries overflow the conservative 16M default scoped-vmem
        # budget; v5e has headroom well beyond it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return outs


def _make_merit_consumer_kernel(player_costs, spec: GameSpec, C: int,
                                nS: int, nC: int, N: int):
    """Reduce-style merit kernel over EMITTED candidate trajectories:
    reads xs [N,x,C,B] / us [N,Pu,C,B] (the `_run(emit_traj=True)`
    outputs) and accumulates the gated squared-gradient merit [C,B] —
    the in-kernel merit math of `_make_kernel`, minus the sequential
    rollout. Motivation (VERDICT r4 #7): XLA consumption of
    pallas-emitted MB-scale buffers pays ~1 ms/MB (+1.8 ms base;
    tools/kernel_profile6*.txt), while pallas->pallas handoffs and
    reduce-style consumers are exempt — this kernel is the one untested
    corner of that design space. Measured result: tools/ (round 5)."""
    P = spec.num_players
    x = spec.xdim
    u = spec.umax
    Pu = P * u
    dt = spec.dt
    n_sc = [len(pc.state_constraints) for pc in player_costs]
    n_cc = [len(pc.control_constraints) for pc in player_costs]
    sc_off = np.cumsum([0] + n_sc)
    cc_off = np.cumsum([0] + n_cc)
    grads_cb = _make_grads_cb(player_costs, spec)

    def kernel(*refs):
        it = iter(refs)
        xs_ref = next(it)                       # [N, x, C, Bb]
        us_ref = next(it)                       # [N, Pu, C, Bb]
        gate_ref = next(it)                     # [N, P, Bb]
        lamS_ref = next(it) if nS > 0 else None
        lamC_ref = next(it) if nC > 0 else None
        mu_ref = next(it)                       # [1, Bb]
        t0_ref = next(it)                       # [1, Bb]
        merit_ref = next(it)                    # [C, Bb]

        merit_ref[...] = jnp.zeros_like(merit_ref)

        def step(k, _):
            x_c = xs_ref[pl.ds(k, 1)][0]        # [x, C, B]
            us_flat = us_ref[pl.ds(k, 1)][0]    # [Pu, C, B]
            B_ = x_c.shape[-1]
            us_cb = us_flat.reshape(P, u, C, B_)
            t = t0_ref[0] + k.astype(jnp.float32) * dt
            lamS = tuple(
                lamS_ref[pl.ds(k, 1)][0, sc_off[p_]:sc_off[p_ + 1]]
                for p_ in range(P)
            ) if nS > 0 else tuple(
                jnp.zeros((0, B_), jnp.float32) for _ in range(P))
            lamC = tuple(
                lamC_ref[pl.ds(k, 1)][0, cc_off[p_]:cc_off[p_ + 1]]
                for p_ in range(P)
            ) if nC > 0 else tuple(
                jnp.zeros((0, B_), jnp.float32) for _ in range(P))
            mu = mu_ref[0]
            s_cb, r_cb = grads_cb(t, x_c, us_cb, lamS, lamC, mu)
            gate_k = gate_ref[pl.ds(k, 1)][0]
            state_term = s_cb[0] * gate_k[0][None, :]
            for p_ in range(1, P):
                state_term = state_term + s_cb[p_] * gate_k[p_][None, :]
            ctrl_term = r_cb[0]
            for p_ in range(1, P):
                ctrl_term = ctrl_term + r_cb[p_]
            inc = ctrl_term + jnp.where(k > 0, state_term, 0.0)
            merit_ref[...] = merit_ref[...] + inc
            return 0

        jax.lax.fori_loop(0, N, step, 0)

    return kernel


def _pallas_merits(player_costs, spec, xs_cand, us_cand, t0_bm,
                   lamS, lamC, mu, gate, batch_block, interpret):
    """Merits [C, B] from emitted candidate trajectories via the
    reduce-style consumer kernel (merit_backend="pallas")."""
    N = spec.num_time_steps
    P = spec.num_players
    x = spec.xdim
    Pu = P * spec.umax
    C = xs_cand.shape[2]
    B = xs_cand.shape[-1]
    Bb = batch_block
    nb = B // Bb
    nS = lamS.shape[1] if lamS is not None else 0
    nC = lamC.shape[1] if lamC is not None else 0

    whole3 = lambda b: (0, 0, b)
    whole4 = lambda b: (0, 0, 0, b)
    res = lambda b: (0, b)

    in_specs = [
        pl.BlockSpec((N, x, C, Bb), whole4, memory_space=pltpu.VMEM),
        pl.BlockSpec((N, Pu, C, Bb), whole4, memory_space=pltpu.VMEM),
        pl.BlockSpec((N, P, Bb), whole3, memory_space=pltpu.VMEM),
    ]
    operands = [xs_cand, us_cand, gate]
    if nS > 0:
        in_specs.append(pl.BlockSpec((N, nS, Bb), whole3,
                                     memory_space=pltpu.VMEM))
        operands.append(lamS)
    if nC > 0:
        in_specs.append(pl.BlockSpec((N, nC, Bb), whole3,
                                     memory_space=pltpu.VMEM))
        operands.append(lamC)
    in_specs.append(pl.BlockSpec((1, Bb), res, memory_space=pltpu.VMEM))
    operands.append(mu if mu is not None
                    else jnp.zeros((1, B), jnp.float32))
    in_specs.append(pl.BlockSpec((1, Bb), res, memory_space=pltpu.VMEM))
    operands.append(t0_bm)

    kern = _make_merit_consumer_kernel(player_costs, spec, C, nS, nC, N)
    (merits,) = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((C, Bb), res, memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((C, B), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return merits


def _prep_common(spec, x0, last_op, strategy, Bb):
    """Batch-major containers -> padded batch-minor operand dicts."""
    N = spec.num_time_steps
    P = spec.num_players
    x = spec.xdim
    u = spec.umax
    Pu = P * u
    op = {
        "xs": pad_batch(bm(last_op.xs), Bb),                       # [N,x,B]
        "us": pad_batch(bm(last_op.us).reshape(N, Pu, -1), Bb),    # [N,Pu,B]
        "t0": pad_batch(bm(last_op.t0)[None], Bb),                 # [1,B]
    }
    st = {
        "Ps": pad_batch(bm(strategy.Ps).reshape(N, Pu, x, -1), Bb),
        "alphas": pad_batch(bm(strategy.alphas).reshape(N, Pu, -1), Bb),
    }
    x0m = pad_batch(bm(x0), Bb)                                    # [x,B]
    return op, st, x0m


def _prep_al(spec, al_state, extreme_gate, Bb):
    """Batched ALState + gate -> padded batch-minor merit operands."""
    lamS = None
    if sum(l.shape[1] for l in al_state.state_lambdas) > 0:
        # [Bt, nS, N] -> [N, nS, B]
        lamS = pad_batch(
            bm(jnp.concatenate(al_state.state_lambdas, axis=1)
               ).transpose(1, 0, 2), Bb)
    lamC = None
    if sum(l.shape[1] for l in al_state.control_lambdas) > 0:
        lamC = pad_batch(
            bm(jnp.concatenate(al_state.control_lambdas, axis=1)
               ).transpose(1, 0, 2), Bb)
    mu = pad_batch(bm(al_state.mu)[None], Bb)                      # [1,B]
    gate = pad_batch(bm(extreme_gate), Bb)                         # [N,P,B]
    return lamS, lamC, mu, gate


def _xla_merits(player_costs, spec: GameSpec, xs_cand, us_cand, t0_bm,
                lamS, lamC, mu, gate):
    """Merit of every candidate from EMITTED trajectories, under plain
    XLA: [N,x,C,B] x [N,Pu,C,B] -> raw merits [C, B] (callers apply the
    0.5 factor). Exactly the in-kernel formula and fold order
    (_make_kernel's merit branch): per-knot gated squared-gradient sums,
    control terms always, state terms for k > 0, accumulated in
    ascending k via lax.scan. The per-knot math is embarrassingly
    parallel — it never needed to live inside the sequential rollout
    kernel, where Mosaic schedules it ~50x slower
    (_resolve_merit_backend)."""
    N = spec.num_time_steps
    P = spec.num_players
    u = spec.umax
    C = xs_cand.shape[2]
    B = xs_cand.shape[-1]
    dt = spec.dt
    n_sc = [len(pc.state_constraints) for pc in player_costs]
    n_cc = [len(pc.control_constraints) for pc in player_costs]
    sc_off = np.cumsum([0] + n_sc)
    cc_off = np.cumsum([0] + n_cc)
    nS = sum(n_sc)
    nC = sum(n_cc)
    if lamS is None:
        lamS = jnp.zeros((N, nS, B), jnp.float32)
    if lamC is None:
        lamC = jnp.zeros((N, nC, B), jnp.float32)
    ts = t0_bm[0][None, :] + (
        jnp.arange(N, dtype=jnp.float32)[:, None] * dt)  # [N, B]
    mu_b = mu[0]  # [B]

    def core(tt, xx, uu, ls, lc, m):
        return pcost.stage_gradient_sq_tuple(
            player_costs, spec, ls, lc, m, tt, xx, uu)

    inner = jax.vmap(core, in_axes=(0, -1, -1, -1, -1, 0), out_axes=-1)
    outer = jax.vmap(inner, in_axes=(None, 1, 2, None, None, None),
                     out_axes=0)

    def body(carry, args):
        k, merit = carry
        t_b, xk, uk, lamS_k, lamC_k, gate_k = args
        ls = tuple(lamS_k[sc_off[p_]:sc_off[p_ + 1]] for p_ in range(P))
        lc = tuple(lamC_k[cc_off[p_]:cc_off[p_ + 1]] for p_ in range(P))
        s_cb, r_cb = outer(t_b, xk, uk.reshape(P, u, C, B), ls, lc, mu_b)
        state_term = s_cb[0] * gate_k[0][None, :]
        for p_ in range(1, P):
            state_term = state_term + s_cb[p_] * gate_k[p_][None, :]
        ctrl_term = r_cb[0]
        for p_ in range(1, P):
            ctrl_term = ctrl_term + r_cb[p_]
        inc = ctrl_term + jnp.where(k > 0, state_term, 0.0)
        return (k + 1, merit + inc), None

    (_, merits), _ = jax.lax.scan(
        body,
        (jnp.zeros((), jnp.int32), jnp.zeros((C, B), jnp.float32)),
        (ts, xs_cand, us_cand, lamS, lamC, gate),
    )
    return merits


def _us_from_xs(spec, xs_cand, op_bm, st_bm, scal_cb):
    """Recompute every candidate's controls [N, Pu, C, B] from the
    EMITTED states, in XLA, with the kernel's exact scalar fold order
    (u[af] = u_ref[af] − (Σ_xx P[af,xx]·δ[xx]) − scal·α[af], left fold
    over xx, then the u_mask multiply) — each output element is the
    same f32 multiply/add chain as the in-kernel control law. XLA does
    not reassociate, but its FMA contraction can fuse the chain
    differently between compilations, so the guarantee is ULP-level
    equivalence, not bit equality (measured ulp diffs on ~1/3 of
    elements; tests/test_batched_pallas.py) — the recompile-class
    difference already documented for the fuse-stage modes.
    Lets the sweep emit states only:
    the `us` third of the pallas-emitted bytes never crosses the
    ~1 ms/MB XLA consumption tax (CLAUDE.md), it is rebuilt from
    untaxed operands instead."""
    N = spec.num_time_steps
    x = spec.xdim
    Pu = spec.num_players * spec.umax
    u_mask_flat = np.zeros((Pu,), np.float32)
    for i, d in enumerate(spec.udims):
        u_mask_flat[i * spec.umax:i * spec.umax + d] = 1.0

    delta = xs_cand - op_bm["xs"][:, :, None, :]          # [N, x, C, B]
    Ps = st_bm["Ps"]                                      # [N, Pu, x, B]
    al = st_bm["alphas"]                                  # [N, Pu, B]
    us_rows = []
    for af in range(Pu):
        acc = Ps[:, af, 0, None, :] * delta[:, 0]
        for xx in range(1, x):
            acc = acc + Ps[:, af, xx, None, :] * delta[:, xx]
        row = (op_bm["us"][:, af, None, :] - acc
               - scal_cb[None] * al[:, af, None, :])
        us_rows.append(row * float(u_mask_flat[af]))
    return jnp.stack(us_rows, axis=1)                     # [N, Pu, C, B]


def _resolve_emit_us(emit_us=None) -> bool:
    """Emit-mode for the xla/pallas merit backends: False (default) =
    the kernel emits states only and `_us_from_xs` rebuilds controls
    bitwise in XLA (≈28% less pallas-emitted data through the ~1 ms/MB
    consumption tax); True = legacy both-arrays emission
    (ILQ_SWEEP_EMIT_US=1). Same static-arg/env pattern and trace-time
    caveat as _resolve_merit_backend."""
    if emit_us is None:
        return os.environ.get("ILQ_SWEEP_EMIT_US", "0") == "1"
    return emit_us


def _merit_chunk(dyn, player_costs, spec, x0m, op_bm, st_bm, scal_cb,
                 lamS, lamC, mu, gate, batch_block, interpret,
                 merit_backend="xla", emit_us=False, return_traj=False):
    """One candidate-chunk of raw merits [Cc, B], emit + XLA split (or
    the in-kernel path under merit_backend="kernel"). return_traj=True
    also returns the emitted candidate states [N, x, Cc, B]."""
    if merit_backend == "kernel":
        (merits,) = _run(
            dyn, player_costs, spec, x0m, op_bm, st_bm, scal_cb, lamS,
            lamC, mu, gate, compute_merit=True, emit_traj=False,
            batch_block=batch_block, interpret=interpret,
        )
        return merits
    if emit_us:
        xs_cand, us_cand = _run(
            dyn, None, spec, x0m, op_bm, st_bm, scal_cb, None, None,
            None, None, compute_merit=False, emit_traj=True,
            batch_block=batch_block, interpret=interpret,
        )
    else:
        (xs_cand,) = _run(
            dyn, None, spec, x0m, op_bm, st_bm, scal_cb, None, None,
            None, None, compute_merit=False, emit_traj="xs",
            batch_block=batch_block, interpret=interpret,
        )
        us_cand = _us_from_xs(spec, xs_cand, op_bm, st_bm, scal_cb)
    if merit_backend == "pallas":
        merits = _pallas_merits(player_costs, spec, xs_cand, us_cand,
                                op_bm["t0"], lamS, lamC, mu, gate,
                                batch_block, interpret)
    else:
        merits = _xla_merits(player_costs, spec, xs_cand, us_cand,
                             op_bm["t0"], lamS, lamC, mu, gate)
    if return_traj:
        return merits, xs_cand
    return merits


def rollout_bm(
    dyn,
    spec: GameSpec,
    x0m: jnp.ndarray,         # [x, B]
    op_bm: dict,              # {"xs" [N,x,B], "us" [N,Pu,B], "t0" [1,B]}
    st_bm: dict,              # {"Ps" [N,Pu,x,B], "alphas" [N,Pu,B]}
    scal_bm: jnp.ndarray,     # [1, B] per-lane alpha scaling
    batch_block: int = 128,
    interpret: bool = False,
):
    """Raw batch-minor rollout: returns (xs_r [N,x,B], us_r [N,Pu,B])."""
    xs_r, us_r = _run(
        dyn, None, spec, x0m, op_bm, st_bm, scal_bm, None, None, None,
        None, compute_merit=False, emit_traj=True,
        batch_block=batch_block, interpret=interpret,
    )
    N = spec.num_time_steps
    return (xs_r.reshape(N, spec.xdim, -1),
            us_r.reshape(N, spec.num_players * spec.umax, -1))


def sweep_merits_bm(
    dyn,
    player_costs,
    spec: GameSpec,
    x0m: jnp.ndarray,         # [x, B]
    op_bm: dict,
    st_bm: dict,
    scalings: jnp.ndarray,    # [C] shared, or [C, B] PER-LANE candidates
    lamS, lamC, mu, gate,     # batch-minor AL operands (_prep_al form)
    batch_block: int = 128,
    interpret: bool = False,
    cand_chunk: int = 8,
    merit_backend: str = None,
    emit_us: bool = None,
    return_traj: bool = False,
):
    """Raw batch-minor merit sweep: [C, B] (0.5 * gated squared stage
    gradients; see sweep_merits_pallas). A 2-D `scalings` gives every
    lane its OWN candidate stepsizes (the compact deep ladder's
    per-lane windows); the kernel consumes [C, B] either way.

    return_traj=True additionally returns the emitted candidate states
    xs_cand [N, x, C, B] (requires an emitting backend — the caller
    reuses candidate trajectories instead of re-rolling; raises under
    merit_backend="kernel", which emits nothing)."""
    B = op_bm["xs"].shape[-1]
    C = scalings.shape[0]
    merit_backend = _resolve_merit_backend(merit_backend)
    emit_us = _resolve_emit_us(emit_us)
    in_kernel = merit_backend == "kernel"
    if return_traj and in_kernel:
        raise ValueError("return_traj needs an emitting merit backend "
                         "('xla'/'pallas'); 'kernel' emits nothing")
    emit_mode = False if in_kernel else (True if emit_us else "xs")
    Cc = _fit_cand_chunk(spec, C=C, Bb=batch_block,
                         nS=(lamS.shape[1] if (in_kernel and lamS
                                               is not None) else 0),
                         nC=(lamC.shape[1] if (in_kernel and lamC
                                               is not None) else 0),
                         cap=cand_chunk, emit_traj=emit_mode)
    parts = []
    traj_parts = []
    for c0 in range(0, C, Cc):
        if scalings.ndim == 2:
            scal_cb = scalings[c0:c0 + Cc]
        else:
            scal_cb = jnp.broadcast_to(
                scalings[c0:c0 + Cc, None], (Cc, B))
        out = _merit_chunk(
            dyn, player_costs, spec, x0m, op_bm, st_bm, scal_cb, lamS,
            lamC, mu, gate, batch_block, interpret,
            merit_backend=merit_backend, emit_us=emit_us,
            return_traj=return_traj)
        if return_traj:
            out, xs_c = out
            traj_parts.append(xs_c)
        parts.append(out)
    merits = 0.5 * jnp.concatenate(parts, axis=0)  # [C, B]
    if return_traj:
        return merits, jnp.concatenate(traj_parts, axis=2)
    return merits


@functools.partial(
    jax.jit,
    static_argnames=("dyn", "spec", "batch_block", "interpret"),
)
def rollout_pallas(
    dyn,
    spec: GameSpec,
    x0: jnp.ndarray,          # [Bt, x]
    last_op: OperatingPoint,  # batch-major
    strategy: Strategy,       # batch-major
    scal: jnp.ndarray = None,  # [Bt] per-lane alpha scaling (None -> 1)
    batch_block: int = 128,
    interpret: bool = False,
) -> OperatingPoint:
    """Batched rollout under affine strategies (one in-kernel horizon sweep).

    With `scal` given, rolls out `strategy.scale_alphas(scal)` per lane —
    the merged "re-roll the selected linesearch candidate" step."""
    N = spec.num_time_steps
    P = spec.num_players
    u = spec.umax
    x = spec.xdim
    Bt = x0.shape[0]
    op, st, x0m = _prep_common(spec, x0, last_op, strategy, batch_block)
    if scal is None:
        scal_cb = jnp.ones((1, op["xs"].shape[-1]), jnp.float32)
    else:
        scal_cb = pad_batch(bm(scal)[None], batch_block)           # [1,B]

    xs_r, us_r = _run(
        dyn, None, spec, x0m, op, st, scal_cb, None, None, None, None,
        compute_merit=False, emit_traj=True,
        batch_block=batch_block, interpret=interpret,
    )
    xs = mb(xs_r.reshape(N, x, -1), Bt)     # [Bt, N, x]  (C == 1)
    us = mb(us_r.reshape(N, P * u, -1), Bt).reshape(Bt, N, P, u)
    return OperatingPoint(xs=xs, us=us, t0=last_op.t0)


def sweep_merits_pallas(
    dyn,
    player_costs,
    spec,
    x0,
    last_op,
    strategy,
    scalings,
    al_state,
    extreme_gate,
    batch_block: int = 128,
    interpret: bool = False,
    cand_chunk: int = 8,
    merit_backend: str = None,
    emit_us: bool = None,
):
    """Merit of every candidate stepsize: [Bt, C] (0.5 * sum of squared
    gated stage gradients along each candidate's rollout). See
    `_sweep_merits_pallas_jit`; this wrapper resolves `merit_backend`
    and `emit_us` (None -> ILQ_SWEEP_MERIT / ILQ_SWEEP_EMIT_US env
    vars) BEFORE the jitted core so both are part of the jit cache
    key — passing them explicitly always takes effect, even after the
    other variant has been traced in this process."""
    return _sweep_merits_pallas_jit(
        dyn, player_costs, spec, x0, last_op, strategy, scalings,
        al_state, extreme_gate, batch_block=batch_block,
        interpret=interpret, cand_chunk=cand_chunk,
        merit_backend=_resolve_merit_backend(merit_backend),
        emit_us=_resolve_emit_us(emit_us))


@functools.partial(
    jax.jit,
    static_argnames=("dyn", "player_costs", "spec", "batch_block",
                     "interpret", "cand_chunk", "merit_backend",
                     "emit_us"),
)
def _sweep_merits_pallas_jit(
    dyn,
    player_costs,
    spec: GameSpec,
    x0: jnp.ndarray,          # [Bt, x]
    last_op: OperatingPoint,  # batch-major
    strategy: Strategy,       # batch-major (unscaled LQ strategy)
    scalings: jnp.ndarray,    # [C] candidate alpha scalings
    al_state: pcost.ALState,  # batched (leading Bt)
    extreme_gate: jnp.ndarray,  # [Bt, N, P]
    batch_block: int = 128,
    interpret: bool = False,
    cand_chunk: int = 8,
    merit_backend: str = "xla",
    emit_us: bool = False,
) -> jnp.ndarray:
    """Merit of every candidate stepsize: [Bt, C] (0.5 * sum of squared
    gated stage gradients along each candidate's rollout).

    Under the default merit_backend="xla", the kernel EMITS every
    candidate's [N,x,C,B]/[N,Pu,C,B] trajectory per chunk and the merit
    math runs in plain XLA over the emitted arrays (_xla_merits) —
    measured faster end-to-end than keeping the cost gradients inside
    the Mosaic kernel (see _resolve_merit_backend). "kernel" restores
    the no-emission in-kernel accumulation, where the selected candidate
    is later re-rolled by `rollout_pallas` with per-lane `scal`.

    Candidates are processed in equal sublane-aligned chunks: one kernel
    shape -> ONE Mosaic compile, reused across chunks (a single very wide
    kernel blows Mosaic compile time past 20 minutes).

    A 2-D `scalings` ([Bt, C]) gives every lane its own candidates (the
    compact deep ladder's per-lane windows)."""
    Bt = x0.shape[0]
    Bb = batch_block
    op, st, x0m = _prep_common(spec, x0, last_op, strategy, Bb)
    B = op["xs"].shape[-1]
    C = scalings.shape[-1] if scalings.ndim == 2 else scalings.shape[0]
    lamS, lamC, mu, gate = _prep_al(spec, al_state, extreme_gate, Bb)

    in_kernel = merit_backend == "kernel"
    emit_mode = False if in_kernel else (True if emit_us else "xs")
    Cc = _fit_cand_chunk(spec, C=C, Bb=Bb,
                         nS=(lamS.shape[1] if (in_kernel and lamS
                                               is not None) else 0),
                         nC=(lamC.shape[1] if (in_kernel and lamC
                                               is not None) else 0),
                         cap=cand_chunk, emit_traj=emit_mode)
    parts = []
    for c0 in range(0, C, Cc):
        if scalings.ndim == 2:
            scal_cb = pad_batch(bm(scalings[:, c0:c0 + Cc]), Bb)
        else:
            scal_cb = jnp.broadcast_to(
                scalings[c0:c0 + Cc, None], (Cc, B))
        parts.append(_merit_chunk(
            dyn, player_costs, spec, x0m, op, st, scal_cb, lamS, lamC,
            mu, gate, Bb, interpret, merit_backend=merit_backend,
            emit_us=emit_us))
    return 0.5 * mb(jnp.concatenate(parts, axis=0), Bt)  # [Bt, C]


@functools.partial(
    jax.jit,
    static_argnames=("dyn", "spec", "batch_block", "interpret",
                     "cand_chunk"),
)
def rollout_candidates_pallas(
    dyn,
    spec: GameSpec,
    x0: jnp.ndarray,          # [Bt, x]
    last_op: OperatingPoint,  # batch-major
    strategy: Strategy,       # batch-major (unscaled LQ strategy)
    scalings: jnp.ndarray,    # [C] candidate alpha scalings
    batch_block: int = 128,
    interpret: bool = False,
    cand_chunk: int = 8,
):
    """Roll out EVERY candidate stepsize and emit all trajectories:
    (xs [Bt, N, C, x], us [Bt, N, C, P, u]). Candidates ride the sublane
    axis in equal chunks (one Mosaic compile, reused)."""
    N = spec.num_time_steps
    P = spec.num_players
    u = spec.umax
    x = spec.xdim
    C = scalings.shape[0]
    Bt = x0.shape[0]
    op, st, x0m = _prep_common(spec, x0, last_op, strategy, batch_block)
    B = op["xs"].shape[-1]

    Cc = _fit_cand_chunk(spec, C=C, Bb=batch_block, nS=0, nC=0,
                         cap=cand_chunk, emit_traj=True)
    xs_parts, us_parts = [], []
    for c0 in range(0, C, Cc):
        scal_cb = jnp.broadcast_to(
            scalings[c0:c0 + Cc, None], (Cc, B))
        xs_r, us_r = _run(
            dyn, None, spec, x0m, op, st, scal_cb, None, None, None,
            None, compute_merit=False, emit_traj=True,
            batch_block=batch_block, interpret=interpret,
        )
        xs_parts.append(xs_r.transpose(0, 2, 1, 3))
        us_parts.append(
            us_r.reshape(N, P, u, Cc, B).transpose(0, 3, 1, 2, 4))
    xs = mb(jnp.concatenate(xs_parts, axis=1), Bt)   # [Bt, N, C, x]
    us = mb(jnp.concatenate(us_parts, axis=1), Bt)   # [Bt, N, C, P, u]
    return xs, us
