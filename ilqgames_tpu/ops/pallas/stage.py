"""Fused linearize + quadraticize as one knot-parallel Pallas kernel.

Replaces the two vmapped XLA stages of the batched solver's trip
(`dyn_base.linearize` + `pcost.quadraticize` — reference
ILQSolver::Solve's per-iteration Linearize/Quadraticize loops,
src/ilq_solver.cpp:445-490) with a single kernel that emits the LQ
kernel's batch-minor operand layout directly — no batch-major
intermediates in HBM, no transposes between the stages and the Riccati
sweep.

Knot-parallel layout: knots ride the sublane axis in blocks of 8 (the
per-knot work is embarrassingly parallel — only the Riccati/rollout
recursions are sequential), lanes carry the batch. Every scalar in the
per-knot trace becomes one [8, Bb] vreg op. The per-knot math is NOT
reimplemented: `dyn.ode` Jacobians via `jax.jacfwd` (the same
forward-Euler convention as dynamics/base.linearize) and
`pcost.stage_quadraticize_core` are double-vmapped inside the kernel,
so semantics match the XLA path by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.costs.base import assemble_matrix
from ilqgames_tpu.types import GameSpec

_TB = 8  # knots per grid step (one sublane tile)


def _make_kernel(dyn, player_costs, spec: GameSpec, nS: int, nC: int,
                 Tb: int):
    P = spec.num_players
    x = spec.xdim
    u = spec.umax
    Pu = P * u
    dt = spec.dt
    n_sc = [len(pc.state_constraints) for pc in player_costs]
    n_cc = [len(pc.control_constraints) for pc in player_costs]
    sc_off = np.cumsum([0] + n_sc)
    cc_off = np.cumsum([0] + n_cc)

    # Split a flat [Pu] control row into [P, u] without a reshape:
    # reshapes of non-batch dims inside the double-vmapped core lower to
    # Mosaic shape casts on the two minormost vector dims (the vmap
    # batching rule moves the lane axis in front of the reshaped dims),
    # which infer-vector-layout rejects. Slice + stack lowers to
    # supported ops (static slices + major-dim concats).
    #
    # KNOWN GAP (tools/tpu_stage_check.py, v5e): under jacfwd the same
    # stack concatenates the sliced tangent basis at mismatched vpad
    # offsets and crashes the Mosaic compiler (internal error on
    # tpu.concatenate of vector<6x1x2> pieces). jacfwd-in-kernel is
    # unproven on real TPU; this kernel therefore stays opt-in
    # (ILQ_FUSE_STAGES=1) and is exercised in interpret mode by
    # tests/test_batched_pallas.py. It saves <10% of a trip vs the
    # vmapped XLA stages, so the production default is the XLA path.
    def _split_u(uf):
        return jnp.stack([uf[i * u:(i + 1) * u] for i in range(P)])

    def core(t, xv, us_flat, lamS_row, lamC_row, mu, gate_p):
        """Per-instance, per-knot: (A [x,x], Bf [x,Pu], Q [P,x,x],
        l [P,x], R [P,P,u,u], r [P,P,u]) — natural ranks; the caller
        flattens outside the kernel where reshapes are plain XLA."""
        us = _split_u(us_flat)
        # Forward-Euler discrete Jacobians of the continuous ode
        # (dynamics/base.py:189-217). The identity enters via an
        # assembled diagonal — Mosaic kernels cannot capture a jnp.eye
        # array constant. Ju is taken w.r.t. the FLAT control row so the
        # [x, Pu] layout comes out of jacfwd directly (no reshape).
        Jx = jax.jacfwd(lambda xx: dyn.ode(t, xx, us))(xv)
        Ju = jax.jacfwd(lambda uf: dyn.ode(t, xv, _split_u(uf)))(us_flat)
        eye = assemble_matrix(
            x, [((d_, d_), jnp.full_like(t, 1.0)) for d_ in range(x)], t)
        A = eye + dt * Jx
        Bf = dt * Ju

        lamS = tuple(lamS_row[sc_off[i]:sc_off[i + 1]] for i in range(P))
        lamC = tuple(lamC_row[cc_off[i]:cc_off[i + 1]] for i in range(P))
        Q, l, R, r = pcost.stage_quadraticize_core(
            player_costs, spec, lamS, lamC, mu, t, xv, us, gate_p)
        return (A, Bf, Q, l, R, r)

    def kernel(xs_ref, us_ref, lamS_ref, lamC_ref, mu_ref, t0_ref,
               gate_ref, ks_ref,
               A_ref, Bf_ref, Qf_ref, lf_ref, Rf_ref, rf_ref):
        t = t0_ref[...][0][None, :] + ks_ref[...] * dt  # [Tb, B]
        xs = xs_ref[...]              # [Tb, x, B]
        us = us_ref[...]              # [Tb, Pu, B]
        lamS = (lamS_ref[...] if nS > 0
                else jnp.zeros((Tb, 0, xs.shape[-1]), jnp.float32))
        lamC = (lamC_ref[...] if nC > 0
                else jnp.zeros((Tb, 0, xs.shape[-1]), jnp.float32))
        mu = mu_ref[...][0]           # [B]
        gate = gate_ref[...]          # [Tb, P, B]

        inner = jax.vmap(core, in_axes=(0, -1, -1, -1, -1, 0, -1),
                         out_axes=-1)
        outer = jax.vmap(inner, in_axes=(0, 0, 0, 0, 0, None, 0),
                         out_axes=0)
        A, Bf, Qf, lf, Rf, rf = outer(t, xs, us, lamS, lamC, mu, gate)
        A_ref[...] = A
        Bf_ref[...] = Bf
        Qf_ref[...] = Qf
        lf_ref[...] = lf
        Rf_ref[...] = Rf
        rf_ref[...] = rf

    return kernel


def _pad_knots(arr, Np):
    """Pad the leading knot axis to Np by replicating the last knot."""
    N = arr.shape[0]
    if N == Np:
        return arr
    return jnp.concatenate(
        [arr, jnp.broadcast_to(arr[-1:], (Np - N,) + arr.shape[1:])])


def lin_quad_pallas(dyn, player_costs, spec: GameSpec, op_bm, lamS, lamC,
                    mu, gate, *, batch_block: int = 128,
                    interpret: bool = False):
    """Batch-minor fused stage kernel.

    Args (as produced by sweep._prep_common/_prep_al):
      op_bm: {"xs" [N,x,B], "us" [N,Pu,B], "t0" [1,B]}
      lamS [N,nS,B] or None, lamC [N,nC,B] or None, mu [1,B],
      gate [N,P,B] (extremal state gates).

    Returns the LQ kernel's operand dict:
      {"A" [N,x,x,B], "Bf" [N,x,Pu,B], "Qf" [N,P*x,x,B], "lf" [N,P*x,B],
       "Rf" [N,P*P*u,u,B], "rf" [N,P*P*u,B]}.
    """
    N = spec.num_time_steps
    P = spec.num_players
    x = spec.xdim
    u = spec.umax
    Pu = P * u
    B = op_bm["xs"].shape[-1]
    Bb = batch_block
    nb = B // Bb
    nS = lamS.shape[1] if lamS is not None else 0
    nC = lamC.shape[1] if lamC is not None else 0
    Tb = _TB
    Np = -(-N // Tb) * Tb
    nblk = Np // Tb

    xs = _pad_knots(op_bm["xs"], Np)
    us = _pad_knots(op_bm["us"], Np)
    gate_p = _pad_knots(gate, Np)
    lamS_p = _pad_knots(lamS, Np) if nS > 0 else None
    lamC_p = _pad_knots(lamC, Np) if nC > 0 else None
    ks = jnp.broadcast_to(
        jnp.arange(Np, dtype=jnp.float32)[:, None], (Np, B))

    blk = lambda shape: pl.BlockSpec(
        shape, lambda b, s: (s,) + (0,) * (len(shape) - 2) + (b,),
        memory_space=pltpu.VMEM)
    res = lambda shape: pl.BlockSpec(
        shape, lambda b, s: (0,) * (len(shape) - 1) + (b,),
        memory_space=pltpu.VMEM)

    in_specs = [blk((Tb, x, Bb)), blk((Tb, Pu, Bb))]
    operands = [xs, us]
    if nS > 0:
        in_specs.append(blk((Tb, nS, Bb)))
        operands.append(lamS_p)
    if nC > 0:
        in_specs.append(blk((Tb, nC, Bb)))
        operands.append(lamC_p)
    in_specs += [res((1, Bb)), res((1, Bb)), blk((Tb, P, Bb)),
                 blk((Tb, Bb))]
    operands += [mu, op_bm["t0"], gate_p, ks]

    kern = _make_kernel(dyn, player_costs, spec, nS, nC, Tb)

    def kernel(*refs):
        it = iter(refs)
        xs_r = next(it)
        us_r = next(it)
        lamS_r = next(it) if nS > 0 else _ZeroLam(Tb, 0, Bb)
        lamC_r = next(it) if nC > 0 else _ZeroLam(Tb, 0, Bb)
        mu_r = next(it)
        t0_r = next(it)
        gate_r = next(it)
        ks_r = next(it)
        kern(xs_r, us_r, lamS_r, lamC_r, mu_r, t0_r, gate_r, ks_r, *it)

    # Natural-rank outputs (no in-kernel flattening — see core's rationale).
    out_specs = [blk((Tb, x, x, Bb)), blk((Tb, x, Pu, Bb)),
                 blk((Tb, P, x, x, Bb)), blk((Tb, P, x, Bb)),
                 blk((Tb, P, P, u, u, Bb)), blk((Tb, P, P, u, Bb))]
    out_shape = [
        jax.ShapeDtypeStruct((Np, x, x, B), jnp.float32),
        jax.ShapeDtypeStruct((Np, x, Pu, B), jnp.float32),
        jax.ShapeDtypeStruct((Np, P, x, x, B), jnp.float32),
        jax.ShapeDtypeStruct((Np, P, x, B), jnp.float32),
        jax.ShapeDtypeStruct((Np, P, P, u, u, B), jnp.float32),
        jax.ShapeDtypeStruct((Np, P, P, u, B), jnp.float32),
    ]
    A, Bf, Q, l, R, r = pl.pallas_call(
        kernel,
        grid=(nb, nblk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    # Flatten to the LQ kernel's operand layout OUTSIDE the kernel: these
    # merge adjacent major dims with the lane axis untouched, which XLA
    # handles as pure relayout-free bitcasts.
    return {"A": A[:N], "Bf": Bf[:N],
            "Qf": Q[:N].reshape(N, P * x, x, B),
            "lf": l[:N].reshape(N, P * x, B),
            "Rf": R[:N].reshape(N, P * P * u, u, B),
            "rf": r[:N].reshape(N, P * P * u, B)}


class _ZeroLam:
    """Stand-in ref for an absent multiplier stream: [...] -> [Tb,0,B]."""

    def __init__(self, Tb, n, Bb):
        self._shape = (Tb, n, Bb)

    def __getitem__(self, _):
        return jnp.zeros(self._shape, jnp.float32)
