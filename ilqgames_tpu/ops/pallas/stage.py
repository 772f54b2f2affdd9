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


_ALL_PARTS = ("lin", "qstate", "qctrl")


def _part_outs(part):
    """Output names a part produces (order = positional output refs).
    Parts: "lin"; "qstate" (all players) or "qstateI" (player I only);
    "qctrl" / "qctrlI"."""
    if part == "lin":
        return ("A", "Bf")
    if part.startswith("qstate"):
        return ("Q", "l")
    if part.startswith("qctrl"):
        return ("R", "r")
    raise ValueError(f"unknown stage-kernel part {part!r}")


def _players_of(parts, prefix):
    """True (all players) / tuple of player indices / () for a prefix."""
    if prefix in parts:
        return True
    sel = tuple(int(p[len(prefix):]) for p in parts
                if p.startswith(prefix) and p != prefix)
    return sel if sel else False


def _make_kernel(dyn, player_costs, spec: GameSpec, nS: int, nC: int,
                 Tb: int, parts=_ALL_PARTS):
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
        entries = {}
        if "lin" in parts:
            entries.update(
                dyn_base.linearize_entries(dyn, dt, u, t, xv, us))
        inc_state = _players_of(parts, "qstate")
        inc_ctrl = _players_of(parts, "qctrl")
        if inc_state is not False or inc_ctrl is not False:
            lamS = tuple(
                lamS_row[sc_off[i]:sc_off[i + 1]] for i in range(P))
            lamC = tuple(
                lamC_row[cc_off[i]:cc_off[i + 1]] for i in range(P))
            entries.update(pcost.stage_quadraticize_entries(
                player_costs, spec, lamS, lamC, mu, t, xv, us, gate_p,
                include_state=inc_state, include_ctrl=inc_ctrl))
        like = xv[0]
        return {k: jnp.zeros_like(like) + v for k, v in entries.items()}

    def kernel(xs_ref, us_ref, lamS_ref, lamC_ref, mu_ref, t0_ref,
               gate_ref, ks_ref, *out_refs):
        # ENTRY-MAJOR inputs ([*entry dims, Tb, Bb]): every per-dim
        # access inside the double-vmapped core (xv[j], us[af], ...) is
        # then one contiguous (Tb, Bb) = (8, 128) tile. Knot-major
        # inputs made each such access a sublane-strided gather across 8
        # knot subtiles — a relayout per use, which both bloated the
        # Mosaic op count (30+ min compiles that died) and would have
        # been slow. Same doctrine as the sweep kernel's state-major
        # slabs (ops/pallas/sweep.py integ_cb note).
        t = t0_ref[...][0][None, :] + ks_ref[...] * dt  # [Tb, B]
        xs = xs_ref[...]              # [x, Tb, B]
        us = us_ref[...]              # [Pu, Tb, B]
        lamS = (lamS_ref[...] if nS > 0
                else jnp.zeros((0, Tb, xs.shape[-1]), jnp.float32))
        lamC = (lamC_ref[...] if nC > 0
                else jnp.zeros((0, Tb, xs.shape[-1]), jnp.float32))
        mu = mu_ref[...][0]           # [B]
        gate = gate_ref[...]          # [P, Tb, B]

        inner = jax.vmap(core, in_axes=(-1, -1, -1, -1, -1, 0, -1),
                         out_axes=-1)
        outer = jax.vmap(inner, in_axes=(0, 1, 1, 1, 1, None, 1),
                         out_axes=0)
        vals = outer(t, xs, us, lamS, lamC, mu, gate)  # key -> [Tb, B]

        # Entry-major output refs ([*entry dims, Tb, Bb]): each store
        # below writes one FULL (Tb, Bb) = (8, 128) tile at a static
        # entry index — aligned whole-vreg stores, no relayouts.
        names = list(dict.fromkeys(
            n for p in parts for n in _part_outs(p)))
        refs = dict(zip(names, out_refs))
        for name, ref in refs.items():
            ref[...] = jnp.zeros(ref.shape, jnp.float32)
        for key in sorted(vals.keys()):
            refs[key[0]][key[1:]] = vals[key]

    return kernel


def _pad_knots_em(arr, Np):
    """Pad the second-to-last (knot) axis to Np by replicating the last
    knot (entry-major layout: [*entry dims, N, B])."""
    N = arr.shape[-2]
    if N == Np:
        return arr
    last = jax.lax.slice_in_dim(arr, N - 1, N, axis=arr.ndim - 2)
    reps = jnp.concatenate([last] * (Np - N), axis=arr.ndim - 2)
    return jnp.concatenate([arr, reps], axis=arr.ndim - 2)


def lin_quad_pallas(dyn, player_costs, spec: GameSpec, op_bm, lamS, lamC,
                    mu, gate, *, batch_block: int = 128,
                    interpret: bool = False, split=None):
    """Batch-minor fused stage kernel.

    Args (as produced by sweep._prep_common/_prep_al):
      op_bm: {"xs" [N,x,B], "us" [N,Pu,B], "t0" [1,B]}
      lamS [N,nS,B] or None, lamC [N,nC,B] or None, mu [1,B],
      gate [N,P,B] (extremal state gates).

    Returns the LQ kernel's operand dict:
      {"A" [N,x,x,B], "Bf" [N,x,Pu,B], "Qf" [N,P*x,x,B], "lf" [N,P*x,B],
       "Rf" [N,P*P*u,u,B], "rf" [N,P*P*u,B]}.

    split: optional tuple of part-groups, each a tuple drawn from
    {"lin", "qstate", "qctrl"}; every group becomes its OWN pallas_call
    (default one fused call). Splitting bounds the per-kernel trace the
    Mosaic compiler has to schedule — the fully fused kernel's compile
    was OOM-killed on the v5e compile helper (tools/tpu_stage_check_r3).
    """
    if split is None:
        split = (_ALL_PARTS,)
    out = {}
    for parts in split:
        part_out = _lin_quad_parts(
            dyn, player_costs, spec, op_bm, lamS, lamC, mu, gate,
            batch_block=batch_block, interpret=interpret,
            parts=tuple(parts))
        for k, v in part_out.items():
            # Per-player splits (e.g. ("qstate0",), ("qstate1",)) each
            # emit the full array with only their players' rows nonzero;
            # summing merges the disjoint supports.
            out[k] = out[k] + v if k in out else v
    return out


def _lin_quad_parts(dyn, player_costs, spec: GameSpec, op_bm, lamS, lamC,
                    mu, gate, *, batch_block: int, interpret: bool,
                    parts):
    """One pallas_call computing the selected parts (see lin_quad_pallas)."""
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

    # Entry-major operands ([*entry dims, Np, B]): the knot-major
    # containers are transposed once here at XLA level (lane axis stays
    # minormost — a cheap major-dim relayout) so every in-kernel per-dim
    # access is a whole (Tb, Bb) tile.
    em_in = lambda a: jnp.moveaxis(a, 0, -2)
    xs = _pad_knots_em(em_in(op_bm["xs"]), Np)
    us = _pad_knots_em(em_in(op_bm["us"]), Np)
    gate_p = _pad_knots_em(em_in(gate), Np)
    lamS_p = _pad_knots_em(em_in(lamS), Np) if nS > 0 else None
    lamC_p = _pad_knots_em(em_in(lamC), Np) if nC > 0 else None
    ks = jnp.broadcast_to(
        jnp.arange(Np, dtype=jnp.float32)[:, None], (Np, B))

    blk = lambda shape: pl.BlockSpec(
        shape, lambda b, s: (0,) * (len(shape) - 2) + (s, b),
        memory_space=pltpu.VMEM)
    res = lambda shape: pl.BlockSpec(
        shape, lambda b, s: (0,) * (len(shape) - 1) + (b,),
        memory_space=pltpu.VMEM)

    in_specs = [blk((x, Tb, Bb)), blk((Pu, Tb, Bb))]
    operands = [xs, us]
    if nS > 0:
        in_specs.append(blk((nS, Tb, Bb)))
        operands.append(lamS_p)
    if nC > 0:
        in_specs.append(blk((nC, Tb, Bb)))
        operands.append(lamC_p)
    in_specs += [res((1, Bb)), res((1, Bb)), blk((P, Tb, Bb)),
                 blk((Tb, Bb))]
    operands += [mu, op_bm["t0"], gate_p, ks]

    kern = _make_kernel(dyn, player_costs, spec, nS, nC, Tb, parts=parts)

    def kernel(*refs):
        it = iter(refs)
        xs_r = next(it)
        us_r = next(it)
        lamS_r = next(it) if nS > 0 else _ZeroLam(0, Tb, Bb)
        lamC_r = next(it) if nC > 0 else _ZeroLam(0, Tb, Bb)
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
    _out_dims = {
        "A": (x, x), "Bf": (x, Pu), "Q": (P, x, x), "l": (P, x),
        "R": (P, P, u, u), "r": (P, P, u),
    }
    names = list(dict.fromkeys(n for p in parts for n in _part_outs(p)))
    out_specs = [em(_out_dims[n] + (Tb, Bb)) for n in names]
    out_shape = [
        jax.ShapeDtypeStruct(_out_dims[n] + (Np, B), jnp.float32)
        for n in names
    ]
    outs = pl.pallas_call(
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
    outs = dict(zip(names, outs))
    # To the LQ kernel's knot-major operand layout OUTSIDE the kernel:
    # moveaxis pulls the knot axis in front (a major-dim transpose — the
    # lane axis stays minormost, so XLA relayouts without shuffling
    # lanes), then the entry-dim merges are relayout-free bitcasts.
    km = lambda a: jnp.moveaxis(a, -2, 0)[:N]
    post = {
        "A": lambda a: km(a),
        "Bf": lambda a: km(a),
        "Q": lambda a: km(a).reshape(N, P * x, x, B),
        "l": lambda a: km(a).reshape(N, P * x, B),
        "R": lambda a: km(a).reshape(N, P * P * u, u, B),
        "r": lambda a: km(a).reshape(N, P * P * u, B),
    }
    out_key = {"A": "A", "Bf": "Bf", "Q": "Qf", "l": "lf", "R": "Rf",
               "r": "rf"}
    return {out_key[n]: post[n](outs[n]) for n in names}


class _ZeroLam:
    """Stand-in ref for an absent multiplier stream: [...] -> [0,Tb,B]."""

    def __init__(self, n, Tb, Bb):
        self._shape = (n, Tb, Bb)

    def __getitem__(self, _):
        return jnp.zeros(self._shape, jnp.float32)
