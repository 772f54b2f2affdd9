"""Isolate the XLA-consumption cost of the LQ kernel's 39 MB Ps output
(the missing ~44 ms of tools/profile_trip7.txt's trip decomposition).

One jit per variant, all consuming the SAME stage->LQ pallas chain:
  base      — reduce-only consumer (exempt per CLAUDE.md)
  concat    — st_bm-style concat with the terminal zero row (the
              batch-minor strategy build, consumed by a reduce)
  transpose — lq_strategy-style mb() transpose to batch-major
              (the per-trip carry build, consumed by a reduce)
  both      — concat + transpose (what every trip does)

Deltas vs base = the consumption cost of each XLA use of the emitted
Ps. Queued calls, one block. Output: tools/tax_probe_r5.txt.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.ops.pallas.layout import bm, mb, pad_batch
from ilqgames_tpu.ops.pallas import sweep as sweep_mod
from ilqgames_tpu.ops.pallas.lq import solve_lq_feedback_bm
from ilqgames_tpu.ops.pallas.stage import lin_quad_pallas
from ilqgames_tpu.solver import batched
from ilqgames_tpu.solver.params import SolverParams

OUT = "/root/repo/tools/tax_probe_r5.txt"


def rec(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


p = make_problem()
spec = p.spec
params = SolverParams(
    max_solver_iters=100, unconstrained_solver_max_iters=10,
    max_backtracking_steps=100, initial_alpha_scaling=0.1,
    convergence_tolerance=1.0, expected_decrease_fraction=0.001)
B = 1024
Bb = 128
N, x, P, u = spec.num_time_steps, spec.xdim, spec.num_players, spec.umax
Pu = P * u
ns = N - 1
rng = np.random.RandomState(0)
dyn, pcs = p.dynamics, p.player_costs

op_bm = {
    "xs": jnp.asarray(rng.randn(N, x, B).astype(np.float32)),
    "us": jnp.asarray(0.01 * rng.randn(N, Pu, B).astype(np.float32)),
    "t0": jnp.zeros((1, B), jnp.float32),
}
x0m = jnp.asarray(rng.randn(x, B).astype(np.float32))
al0 = jax.vmap(lambda _: pcost.ALState.init(pcs, spec))(jnp.arange(B))
gate = jnp.ones((B, N, P), jnp.float32)
lamS, lamC, mu_bm, gate_bm = sweep_mod._prep_al(spec, al0, gate, Bb)


def chain(op_bm, x0m, lamS, lamC, mu_bm, gate_bm):
    ops = lin_quad_pallas(dyn, pcs, spec, op_bm, lamS, lamC, mu_bm,
                          gate_bm, batch_block=Bb, interpret=False)
    return solve_lq_feedback_bm(
        spec, ops, x0m - op_bm["xs"][0],
        adaptive_regularization=params.adaptive_regularization,
        batch_block=Bb, interpret=False)


def variant(name):
    def f(op_bm, x0m, lamS, lamC, mu_bm, gate_bm):
        Ps_r, al_r, dxs = chain(op_bm, x0m, lamS, lamC, mu_bm, gate_bm)
        out = Ps_r.sum() + al_r.sum()
        if name in ("concat", "both"):
            st_Ps = jnp.concatenate(
                [Ps_r, jnp.zeros((1, Pu, x, B), jnp.float32)])
            st_al = jnp.concatenate(
                [al_r, jnp.zeros((1, Pu, B), jnp.float32)])
            out = out + st_Ps.sum() + st_al.sum()
        if name in ("transpose", "both"):
            Ps_major = mb(Ps_r, B).reshape(B, ns, P, u, x)
            al_major = mb(al_r, B).reshape(B, ns, P, u)
            out = out + Ps_major.sum() + al_major.sum()
        return out

    return jax.jit(f)


args = (op_bm, x0m, lamS, lamC, mu_bm, gate_bm)
for name in ("base", "concat", "transpose", "both", "base"):
    fn = variant(name)
    o = fn(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(20):
        o = fn(*args)
    jax.block_until_ready(o)
    rec(variant=name,
        ms=round((time.perf_counter() - t0) / 20 * 1e3, 3))
