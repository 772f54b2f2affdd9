"""tax_probe_r5 redux with the same-args dedupe defeated.

tools/tax_probe_r5.log showed identical-argument dispatch loops being
served from a cache somewhere in the axon stack after a few variants
(base measured 17 ms, then 0.049 ms for the SAME executable minutes
later) — the same artifact as the merit probe's transient 0.054 ms
reading. Here every timed call cycles through 8 argument sets that
differ in value, and each variant is measured at reps 16 and 48: the
reported per-call cost is (t48-t16)/32 (linearity-checked
differencing), which a cache hit cannot fake.

Output: tools/tax_probe_r5b.txt.
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
from ilqgames_tpu.ops.pallas.layout import mb
from ilqgames_tpu.ops.pallas import sweep as sweep_mod
from ilqgames_tpu.ops.pallas.lq import solve_lq_feedback_bm
from ilqgames_tpu.ops.pallas.stage import lin_quad_pallas
from ilqgames_tpu.solver.params import SolverParams

OUT = "/root/repo/tools/tax_probe_r5b.txt"


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

al0 = jax.vmap(lambda _: pcost.ALState.init(pcs, spec))(jnp.arange(B))
gate = jnp.ones((B, N, P), jnp.float32)
lamS, lamC, mu_bm, gate_bm = sweep_mod._prep_al(spec, al0, gate, Bb)

NSETS = 8
argsets = []
for i in range(NSETS):
    op_bm = {
        "xs": jnp.asarray(rng.randn(N, x, B).astype(np.float32)),
        "us": jnp.asarray(0.01 * rng.randn(N, Pu, B).astype(np.float32)),
        "t0": jnp.zeros((1, B), jnp.float32),
    }
    x0m = jnp.asarray(rng.randn(x, B).astype(np.float32))
    argsets.append((op_bm, x0m))
argsets = jax.block_until_ready(argsets)


def chain(op_bm, x0m):
    ops = lin_quad_pallas(dyn, pcs, spec, op_bm, lamS, lamC, mu_bm,
                          gate_bm, batch_block=Bb, interpret=False)
    return solve_lq_feedback_bm(
        spec, ops, x0m - op_bm["xs"][0],
        adaptive_regularization=params.adaptive_regularization,
        batch_block=Bb, interpret=False)


def variant(name):
    def f(op_bm, x0m):
        Ps_r, al_r, dxs = chain(op_bm, x0m)
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


def timed(name, fn):
    for a in argsets:
        jax.block_until_ready(fn(*a))  # compile + warm every set

    def loop(reps):
        t0 = time.perf_counter()
        o = None
        for i in range(reps):
            o = fn(*argsets[i % NSETS])
        jax.block_until_ready(o)
        return time.perf_counter() - t0

    t16 = loop(16)
    t48 = loop(48)
    rec(variant=name, ms=round((t48 - t16) / 32 * 1e3, 3),
        t16_s=round(t16, 3), t48_s=round(t48, 3))


for name in ("base", "concat", "transpose", "both", "base"):
    timed(name, variant(name))
