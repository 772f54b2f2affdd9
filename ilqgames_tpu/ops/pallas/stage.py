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
reimplemented: the dynamics' analytic sparse Jacobians
(`dynamics/base.linearize_core` — the same forward-Euler convention and
formulas as base.linearize) and `pcost.stage_quadraticize_core` are
double-vmapped inside the kernel, so semantics match the XLA path by
construction. The whole kernel trace is autodiff-free: jacfwd's
tangent-basis slicing does not lower on Mosaic (v5e).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.dynamics import base as dyn_base
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

    if dyn.ode_jac is None:
        raise ValueError(
            "lin_quad_pallas needs analytic Jacobians (dyn.ode_jac): "
            "jacfwd-in-kernel does not lower on Mosaic (v5e rejects the "
            "tangent-basis tpu.concatenate at mismatched vpad offsets — "
            "tools/tpu_stage_check.txt). Every model in dynamics/models.py "
            "and every flat/concatenated system provides ode_jac."
        )

    # Split a flat [Pu] control row into [P, u] without a reshape:
    # reshapes of non-batch dims inside the double-vmapped core lower to
    # Mosaic shape casts on the two minormost vector dims (the vmap
    # batching rule moves the lane axis in front of the reshaped dims),
    # which infer-vector-layout rejects. Slice + stack lowers to
    # supported ops (static slices + major-dim concats).
    def _split_u(uf):
        return jnp.stack([uf[i * u:(i + 1) * u] for i in range(P)])

    def core(t, xv, us_flat, lamS_row, lamC_row, mu, gate_p):
        """Per-instance, per-knot SPARSE entries: one dict with static
        keys ("A", r, c), ("Bf", r, col), ("Q", i, r, c), ("l", i, r),
        ("R", i, j, a, b), ("r", i, j, a) -> traced scalars. A dict IS a
        pytree with static structure, so the double vmap batches every
        value into a [Tb, B] tile and the kernel stores each tile
        directly — NO output assembly. This is the load-bearing Mosaic
        constraint: wide stacks of per-cell scalars (assemble_matrix
        under the double vmap) lower to tpu.concatenate of vregs at
        mismatched vpad offsets, which the v5e compiler rejects
        (tools/tpu_stage_check_r3.log); per-tile stores at static
        indices are the native formulation.

        Jacobians come from the model's ANALYTIC sparse entries
        (dynamics/base.linearize_entries — the same formulas as the
        reference's hand-written Linearize,
        src/single_player_car_6d.cpp:58-67): jacfwd's tangent-basis
        slicing also does not lower on Mosaic."""
        us = _split_u(us_flat)
        entries = dyn_base.linearize_entries(dyn, dt, u, t, xv, us)
        lamS = tuple(lamS_row[sc_off[i]:sc_off[i + 1]] for i in range(P))
        lamC = tuple(lamC_row[cc_off[i]:cc_off[i + 1]] for i in range(P))
        entries.update(pcost.stage_quadraticize_entries(
            player_costs, spec, lamS, lamC, mu, t, xv, us, gate_p))
        like = xv[0]
        return {k: jnp.zeros_like(like) + v for k, v in entries.items()}

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
        vals = outer(t, xs, us, lamS, lamC, mu, gate)  # key -> [Tb, B]

        # Entry-major output refs ([*entry dims, Tb, Bb]): each store
        # below writes one FULL (Tb, Bb) = (8, 128) tile at a static
        # entry index — aligned whole-vreg stores, no relayouts.
        refs = {"A": A_ref, "Bf": Bf_ref, "Q": Qf_ref, "l": lf_ref,
                "R": Rf_ref, "r": rf_ref}
        for name, ref in refs.items():
            ref[...] = jnp.zeros(ref.shape, jnp.float32)
        for key in sorted(vals.keys()):
            refs[key[0]][key[1:]] = vals[key]

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

    # ENTRY-MAJOR outputs ([*entry dims, Np, B]): the kernel writes one
    # full (Tb, Bb) tile per nonzero entry at static entry indices —
    # aligned whole-vreg stores. Knot-major refs would make every store
    # a sublane-strided scatter (the value's sublane axis is knots).
    em = lambda shape: pl.BlockSpec(
        shape, lambda b, s: (0,) * (len(shape) - 2) + (s, b),
        memory_space=pltpu.VMEM)
    out_specs = [em((x, x, Tb, Bb)), em((x, Pu, Tb, Bb)),
                 em((P, x, x, Tb, Bb)), em((P, x, Tb, Bb)),
                 em((P, P, u, u, Tb, Bb)), em((P, P, u, Tb, Bb))]
    out_shape = [
        jax.ShapeDtypeStruct((x, x, Np, B), jnp.float32),
        jax.ShapeDtypeStruct((x, Pu, Np, B), jnp.float32),
        jax.ShapeDtypeStruct((P, x, x, Np, B), jnp.float32),
        jax.ShapeDtypeStruct((P, x, Np, B), jnp.float32),
        jax.ShapeDtypeStruct((P, P, u, u, Np, B), jnp.float32),
        jax.ShapeDtypeStruct((P, P, u, Np, B), jnp.float32),
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
    # To the LQ kernel's knot-major operand layout OUTSIDE the kernel:
    # moveaxis pulls the knot axis in front (a major-dim transpose — the
    # lane axis stays minormost, so XLA relayouts without shuffling
    # lanes), then the entry-dim merges are relayout-free bitcasts.
    km = lambda a: jnp.moveaxis(a, -2, 0)[:N]
    return {"A": km(A), "Bf": km(Bf),
            "Qf": km(Q).reshape(N, P * x, x, B),
            "lf": km(l).reshape(N, P * x, B),
            "Rf": km(R).reshape(N, P * P * u, u, B),
            "rf": km(r).reshape(N, P * P * u, B)}


class _ZeroLam:
    """Stand-in ref for an absent multiplier stream: [...] -> [Tb,0,B]."""

    def __init__(self, Tb, n, Bb):
        self._shape = (Tb, n, Bb)

    def __getitem__(self, _):
        return jnp.zeros(self._shape, jnp.float32)
