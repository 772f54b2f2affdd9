"""Coupled feedback-LQ Nash recursion as Pallas TPU kernels.

Replaces `solver/lq_feedback.py`'s two `lax.scan`s (backward Riccati +
forward delta-x pass; reference src/lq_feedback_solver.cpp:110-244) with
two `pallas_call`s whose grids sweep the horizon. Per-knot stage data
(A, B, Q, l, R, r) streams HBM -> VMEM through the BlockSpec pipeline
(automatic double-buffering); the value-function carry (Z, zeta) lives in
VMEM scratch for the whole sweep. This removes the per-step XLA dispatch
overhead that dominates the scan version on tiny stage tensors.

Layout: batch-minor. The batch axis B sits in the TPU lane dimension
(last, 128-wide); state/control dims sit on sublanes. All heavy ops are
slab FMAs of shape [x, B] or [x, x, B].

The 6x6 coupling solve is an in-kernel unrolled LU with lane-wise partial
pivoting (each batch lane pivots independently) — numerically equivalent
to the XLA path's `jnp.linalg.solve`, not bitwise.

Semantics replicate the XLA path exactly (including the reference's
shipped forward pass that uses the open-loop A, not the closed-loop F —
src/lq_feedback_solver.cpp:216-241 — and Gershgorin regularization with
column circles).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ilqgames_tpu.ops.pallas.sweep import _time_block
from ilqgames_tpu.types import GameSpec, LinearDynamics, LQSolution, \
    QuadraticCosts, Strategy

_MIN_GERSHGORIN_EVAL = 1e-3


# ---------------------------------------------------------------------------
# In-kernel math helpers (operate on jnp values with lane-last layout).
# ---------------------------------------------------------------------------
def _lu_solve_rows(rows, n, rhs_w):
    """Solve the n x n system held in `rows` (list of [n + rhs_w, B]
    augmented slabs) by unrolled LU with lane-wise partial pivoting.
    Returns list of solution slabs X[k] of shape [rhs_w, B]."""
    rows = list(rows)
    for k in range(n):
        # Lane-wise pivot: first row >= k attaining the column max.
        absk = [jnp.abs(rows[r][k]) for r in range(k, n)]
        m = absk[0]
        for a in absk[1:]:
            m = jnp.maximum(m, a)
        taken = jnp.zeros_like(m, dtype=bool)
        sel = []
        for a in absk:
            hit = (a >= m) & ~taken
            sel.append(hit)
            taken = taken | hit
        # Gather the pivot row / scatter old row k, all with where-masks.
        pivotrow = rows[k]
        for off, s in enumerate(sel[1:], start=1):
            pivotrow = jnp.where(s[None, :], rows[k + off], pivotrow)
        for off, s in enumerate(sel[1:], start=1):
            rows[k + off] = jnp.where(s[None, :], rows[k], rows[k + off])
        rows[k] = pivotrow
        inv = 1.0 / pivotrow[k]
        for r in range(k + 1, n):
            f = rows[r][k] * inv
            rows[r] = rows[r] - f[None, :] * pivotrow
    X = [None] * n
    for k in reversed(range(n)):
        acc = rows[k][n:]
        for j in range(k + 1, n):
            acc = acc - rows[k][j][None, :] * X[j]
        X[k] = acc / rows[k][k][None, :]
    return X


def _backward_kernel(
    # streams (Tb knots per grid step, reversed in time)
    A_ref, Bf_ref, Qf_ref, lf_ref, Rf_ref, rf_ref,
    # terminal condition (resident)
    QT_ref, lT_ref,
    # outputs (per knot, reversed)
    Ps_ref, al_ref,
    # scratch carries
    Z_scr, zeta_scr,
    *, spec: GameSpec, adaptive_regularization: bool, Tb: int,
):
    P = spec.num_players
    x = spec.xdim
    u = spec.umax
    Pu = P * u
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        Z_scr[...] = QT_ref[...]
        zeta_scr[...] = lT_ref[...]

    def step(i, _):
        tt = Tb - 1 - i  # walk the block backward in time
        A = A_ref[pl.ds(tt, 1)][0]        # [x, x, B]
        Bf = Bf_ref[pl.ds(tt, 1)][0]      # [x, Pu, B]
        Qf = Qf_ref[pl.ds(tt, 1)][0]      # [P*x, x, B]
        lf = lf_ref[pl.ds(tt, 1)][0]      # [P*x, B]
        Rf = Rf_ref[pl.ds(tt, 1)][0]      # [P*P*u, u, B]
        rf = rf_ref[pl.ds(tt, 1)][0]      # [P*P*u, B]
        Z = Z_scr[...]      # [P*x, x, B]
        zeta = zeta_scr[...]  # [P*x, B]

        def player_of(af):
            return af // u

        def R_row(i, j, a):
            return Rf[(i * P + j) * u + a]  # [u, B]

        def r_entry(i, j, a):
            return rf[(i * P + j) * u + a]  # [B]

        # B_i^T Z_i, rows flattened over (i, a): BiZ[af] = [x(y), B].
        BiZ = []
        for af in range(Pu):
            i = player_of(af)
            acc = Bf[0, af][None, :] * Z[i * x + 0]
            for xx in range(1, x):
                acc = acc + Bf[xx, af][None, :] * Z[i * x + xx]
            BiZ.append(acc)

        # Coupling matrix S rows (+ own-control R on diagonal blocks, identity
        # on padded control entries), then Gershgorin column regularization.
        # NOTE: no `.at[]` anywhere in this kernel — jnp scatter has no Mosaic
        # lowering; block insertion uses concatenation, diagonal bumps use
        # iota masks.
        u_mask_np = np.zeros((P, u), np.float32)
        for _i, _d in enumerate(spec.udims):
            u_mask_np[_i, :_d] = 1.0
        pad_diag_np = 1.0 - u_mask_np.reshape(Pu)
        Bb = A.shape[-1]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (Pu, 1), 0)

        S_rows = []
        for af in range(Pu):
            i, a = player_of(af), af % u
            acc = BiZ[af][0][None, :] * Bf[0]
            for y in range(1, x):
                acc = acc + BiZ[af][y][None, :] * Bf[y]  # [Pu, B]
            rblk = R_row(i, i, a)  # [u, B] -> embed at rows i*u:(i+1)*u
            parts = []
            if i > 0:
                parts.append(jnp.zeros((i * u, Bb), jnp.float32))
            parts.append(rblk)
            if (i + 1) * u < Pu:
                parts.append(jnp.zeros((Pu - (i + 1) * u, Bb), jnp.float32))
            acc = acc + (jnp.concatenate(parts, axis=0)
                         if len(parts) > 1 else parts[0])
            pad_val = float(pad_diag_np[af])
            if pad_val != 0.0:
                acc = acc + jnp.where(col_ids == af, pad_val, 0.0)
            S_rows.append(acc)

        if adaptive_regularization:
            absS = jnp.abs(jnp.stack(S_rows))           # [Pu, Pu, B]
            colsum = jnp.sum(absS, axis=0)              # [Pu, B] column sums
            diag = jnp.stack([S_rows[aa][aa] for aa in range(Pu)])  # [Pu, B]
            radius = colsum - jnp.abs(diag)
            bump = jnp.where(diag - radius < _MIN_GERSHGORIN_EVAL,
                             radius + _MIN_GERSHGORIN_EVAL, 0.0)
            S_rows = [
                S_rows[aa]
                + jnp.where(col_ids == aa, bump[aa][None, :], 0.0)
                for aa in range(Pu)
            ]

        # RHS rows: [x gains | 1 affine].
        M_rows = []
        for af in range(Pu):
            i, a = player_of(af), af % u
            Yp = BiZ[af][0][None, :] * A[0]
            for y in range(1, x):
                Yp = Yp + BiZ[af][y][None, :] * A[y]    # [x, B]
            Ya = Bf[0, af] * zeta[i * x + 0]
            for xx in range(1, x):
                Ya = Ya + Bf[xx, af] * zeta[i * x + xx]
            Ya = Ya + r_entry(i, i, a)                  # [B]
            M_rows.append(jnp.concatenate([S_rows[af], Yp, Ya[None, :]], axis=0))

        X = _lu_solve_rows(M_rows, Pu, x + 1)
        Pmat = [X[af][:x] for af in range(Pu)]          # each [x, B]
        alpha = [X[af][x] for af in range(Pu)]          # each [B]

        Ps_ref[pl.ds(tt, 1)] = jnp.stack(Pmat)[None]    # [1, Pu, x, B]
        al_ref[pl.ds(tt, 1)] = jnp.stack(alpha)[None]   # [1, Pu, B]

        # Closed-loop transition and drift.
        F = A
        for af in range(Pu):
            F = F - Bf[:, af][:, None, :] * Pmat[af][None, :, :]
        beta = -(Bf[:, 0] * alpha[0][None, :])
        for af in range(1, Pu):
            beta = beta - Bf[:, af] * alpha[af][None, :]

        # Value updates, player by player (each touches only its own Z/zeta).
        for i in range(P):
            Zi = Z[i * x:(i + 1) * x]                   # [x, x, B]
            zi = zeta[i * x:(i + 1) * x]                # [x, B]

            Zb = Zi[:, 0] * beta[0][None, :]
            for y in range(1, x):
                Zb = Zb + Zi[:, y] * beta[y][None, :]
            w = zi + Zb                                  # [x, B]
            Ftw = F[0] * w[0][None, :]
            for xx in range(1, x):
                Ftw = Ftw + F[xx] * w[xx][None, :]       # [x, B]

            cross = jnp.zeros_like(w)
            for j in range(P):
                for a in range(u):
                    Rrow = R_row(i, j, a)                # [u, B]
                    Ra = Rrow[0] * alpha[j * u + 0]
                    for v in range(1, u):
                        Ra = Ra + Rrow[v] * alpha[j * u + v]
                    coef = Ra - r_entry(i, j, a)         # [B]
                    cross = cross + Pmat[j * u + a] * coef[None, :]

            zeta_new = Ftw + lf[i * x:(i + 1) * x] + cross

            T = Zi[:, 0][:, None, :] * F[0][None, :, :]
            for y in range(1, x):
                T = T + Zi[:, y][:, None, :] * F[y][None, :, :]  # [x, x, B]
            FtT = F[0][:, None, :] * T[0][None, :, :]
            for xx in range(1, x):
                FtT = FtT + F[xx][:, None, :] * T[xx][None, :, :]

            PRP = jnp.zeros_like(FtT)
            for j in range(P):
                for a in range(u):
                    Rrow = R_row(i, j, a)
                    RP = Rrow[0][None, :] * Pmat[j * u + 0]
                    for v in range(1, u):
                        RP = RP + Rrow[v][None, :] * Pmat[j * u + v]  # [x, B]
                    PRP = PRP + Pmat[j * u + a][:, None, :] * RP[None, :, :]

            Z_scr[i * x:(i + 1) * x] = FtT + Qf[i * x:(i + 1) * x] + PRP
            zeta_scr[i * x:(i + 1) * x] = zeta_new
        return 0

    jax.lax.fori_loop(0, Tb, step, 0)


def _forward_kernel(A_ref, Bf_ref, al_ref, dx0_ref, dxs_ref, xlast_ref,
                    x_scr, *, spec: GameSpec, Tb: int):
    x = spec.xdim
    Pu = spec.num_players * spec.umax
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        x_scr[...] = dx0_ref[...]

    def step(i, _):
        xs = x_scr[...]                              # [x, B]
        dxs_ref[pl.ds(i, 1)] = xs[None]

        A = A_ref[pl.ds(i, 1)][0]
        Bf = Bf_ref[pl.ds(i, 1)][0]
        al = al_ref[pl.ds(i, 1)][0]                  # [Pu, B]
        xn = A[:, 0] * xs[0][None, :]
        for y in range(1, x):
            xn = xn + A[:, y] * xs[y][None, :]
        for af in range(Pu):
            xn = xn - Bf[:, af] * al[af][None, :]
        x_scr[...] = xn
        return 0

    jax.lax.fori_loop(0, Tb, step, 0)
    xlast_ref[...] = x_scr[...]


# ---------------------------------------------------------------------------
# Host-side wrapper.
# ---------------------------------------------------------------------------
def _pad_batch(arr, Bb):
    """Pad the trailing batch axis up to a multiple of Bb by edge-replication."""
    B = arr.shape[-1]
    pad = (-B) % Bb
    if pad == 0:
        return arr
    return jnp.concatenate(
        [arr, jnp.broadcast_to(arr[..., -1:], arr.shape[:-1] + (pad,))], axis=-1
    )


def solve_lq_feedback_bm(
    spec: GameSpec,
    ops: dict,
    dx0m: jnp.ndarray,
    adaptive_regularization: bool = True,
    batch_block: int = 128,
    interpret: bool = False,
):
    """Raw batch-minor feedback-LQ solve (the kernel pair without any
    layout conversion): `ops` is the stage-kernel operand dict
    {"A" [N,x,x,B], "Bf" [N,x,Pu,B], "Qf" [N,P*x,x,B], "lf" [N,P*x,B],
    "Rf" [N,P*P*u,u,B], "rf" [N,P*P*u,B]}, dx0m [x,B]; all lane-padded.
    Returns (Ps_r [ns,Pu,x,B], al_r [ns,Pu,B], dxs [N,x,B])."""
    N = spec.num_time_steps
    P = spec.num_players
    x = spec.xdim
    u = spec.umax
    Pu = P * u
    A, Bf = ops["A"], ops["Bf"]
    Qf, lf, Rf, rf = ops["Qf"], ops["lf"], ops["Rf"], ops["rf"]
    B = A.shape[-1]
    nb = B // batch_block
    Bb = batch_block
    ns = N - 1
    Tb = _time_block(ns)
    nblk = ns // Tb

    # ---- backward sweep (Tb knots per grid step, blocks reversed) ----
    rev = lambda b, s: (nblk - 1 - s, 0, 0, b)
    rev3 = lambda b, s: (nblk - 1 - s, 0, b)
    kern = functools.partial(
        _backward_kernel, spec=spec,
        adaptive_regularization=adaptive_regularization, Tb=Tb,
    )
    Ps_r, al_r = pl.pallas_call(
        kern,
        grid=(nb, nblk),
        in_specs=[
            pl.BlockSpec((Tb, x, x, Bb), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((Tb, x, Pu, Bb), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((Tb, P * x, x, Bb), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((Tb, P * x, Bb), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((Tb, P * P * u, u, Bb), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tb, P * P * u, Bb), rev3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P * x, x, Bb), lambda b, s: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P * x, Bb), lambda b, s: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Tb, Pu, x, Bb), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((Tb, Pu, Bb), rev3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ns, Pu, x, B), jnp.float32),
            jax.ShapeDtypeStruct((ns, Pu, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((P * x, x, Bb), jnp.float32),
            pltpu.VMEM((P * x, Bb), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(A[:ns], Bf[:ns], Qf[:ns], lf[:ns], Rf[:ns], rf[:ns], Qf[N - 1],
      lf[N - 1])

    # ---- forward sweep ----
    fwd = lambda b, s: (s, 0, 0, b)
    fwd3 = lambda b, s: (s, 0, b)
    dxs_r, xlast = pl.pallas_call(
        functools.partial(_forward_kernel, spec=spec, Tb=Tb),
        grid=(nb, nblk),
        in_specs=[
            pl.BlockSpec((Tb, x, x, Bb), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((Tb, x, Pu, Bb), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((Tb, Pu, Bb), fwd3, memory_space=pltpu.VMEM),
            pl.BlockSpec((x, Bb), lambda b, s: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Tb, x, Bb), fwd3, memory_space=pltpu.VMEM),
            pl.BlockSpec((x, Bb), lambda b, s: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ns, x, B), jnp.float32),
            jax.ShapeDtypeStruct((x, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((x, Bb), jnp.float32)],
        interpret=interpret,
    )(A[:ns], Bf[:ns], al_r, dx0m)

    dxs = jnp.concatenate([dxs_r, xlast[None]], axis=0)  # [N, x, B]
    return Ps_r, al_r, dxs


@functools.partial(
    jax.jit,
    static_argnames=("spec", "adaptive_regularization", "batch_block",
                     "interpret"),
)
def solve_lq_feedback_pallas(
    spec: GameSpec,
    lin: LinearDynamics,
    quad: QuadraticCosts,
    dx0: jnp.ndarray,
    adaptive_regularization: bool = True,
    batch_block: int = 128,
    interpret: bool = False,
) -> LQSolution:
    """Batched feedback-LQ solve on TPU via Pallas.

    Args (batch-MAJOR, as produced by `jax.vmap`'d linearize/quadraticize):
      lin.A  [Bt, N, x, x], lin.Bs [Bt, N, P, x, u]
      quad.Q [Bt, N, P, x, x], .l [Bt, N, P, x],
      .R [Bt, N, P, P, u, u], .r [Bt, N, P, P, u]
      dx0    [Bt, x]

    Returns a batch-major LQSolution (costates are zeros: the production
    solver path never consumes them; see VERDICT/shipped-merit notes in
    solver/ilq.py).
    """
    N = spec.num_time_steps
    P = spec.num_players
    x = spec.xdim
    u = spec.umax
    Pu = P * u
    Bt = dx0.shape[0]

    # ---- to batch-minor, flattened leading dims ----
    bm = lambda a: jnp.moveaxis(a, 0, -1)
    ops = {
        "A": _pad_batch(bm(lin.A), batch_block),                # [N,x,x,B]
        "Bf": _pad_batch(
            bm(lin.Bs).transpose(0, 2, 1, 3, 4).reshape(N, x, Pu, -1),
            batch_block),                                       # [N,x,Pu,B]
        "Qf": _pad_batch(bm(quad.Q).reshape(N, P * x, x, -1), batch_block),
        "lf": _pad_batch(bm(quad.l).reshape(N, P * x, -1), batch_block),
        "Rf": _pad_batch(bm(quad.R).reshape(N, P * P * u, u, -1),
                         batch_block),
        "rf": _pad_batch(bm(quad.r).reshape(N, P * P * u, -1), batch_block),
    }
    dx0m = _pad_batch(bm(dx0), batch_block)                     # [x,B]
    Ps_r, al_r, dxs = solve_lq_feedback_bm(
        spec, ops, dx0m,
        adaptive_regularization=adaptive_regularization,
        batch_block=batch_block, interpret=interpret,
    )
    ns = N - 1

    # ---- back to batch-major containers ----
    mb = lambda a: jnp.moveaxis(a[..., :Bt], -1, 0)
    Ps = mb(Ps_r).reshape(Bt, ns, P, u, x)
    alphas = mb(al_r).reshape(Bt, ns, P, u)
    zerosP = jnp.zeros((Bt, 1, P, u, x), jnp.float32)
    zerosA = jnp.zeros((Bt, 1, P, u), jnp.float32)
    delta_xs = mb(dxs)
    return LQSolution(
        strategy=Strategy(
            Ps=jnp.concatenate([Ps, zerosP], axis=1),
            alphas=jnp.concatenate([alphas, zerosA], axis=1),
        ),
        delta_xs=delta_xs,
        costates=jnp.zeros((Bt, N, P, x), jnp.float32),
    )
