"""Compile + parity check of the fused stage kernel alone on real TPU.

Isolates ops/pallas/stage.py from the full trip program: compiles
lin_quad_pallas on the flagship problem at one batch block and compares
against the vmapped XLA linearize + quadraticize. Writes JSON lines to
stdout; Mosaic errors print with full traceback.
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.ops.pallas.layout import bm, pad_batch
from ilqgames_tpu.ops.pallas.stage import lin_quad_pallas
from ilqgames_tpu.ops.pallas.sweep import _prep_al
from ilqgames_tpu.solver.batched import _extreme_gate_b


def main():
    problem = make_problem()
    spec = problem.spec
    dyn = problem.dynamics
    pcs = problem.player_costs
    B = 128
    N = spec.num_time_steps
    P = spec.num_players
    Pu = P * spec.umax

    rng = np.random.RandomState(0)
    x0 = np.tile(np.asarray(problem.x0)[None], (B, 1))
    x0 += 0.1 * rng.randn(*x0.shape).astype(np.float32)
    op0 = problem.initial_operating_point()
    op = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), op0)
    # Perturb the later knots off the zero operating point so the
    # quadraticization sees non-degenerate inputs, then pin the initial
    # row to x0 exactly; both paths consume the same op, so parity is
    # unaffected by the perturbation.
    op = op.replace(xs=(op.xs + 0.01).at[:, 0].set(jnp.asarray(x0)))
    al = jax.vmap(lambda _: pcost.ALState.init(pcs, spec))(jnp.arange(B))
    ek = jnp.zeros((B, P), jnp.int32)
    gate = _extreme_gate_b(pcs, spec, ek)

    def run_pallas(op, al, gate):
        op_bm = {
            "xs": pad_batch(bm(op.xs), B),
            "us": pad_batch(bm(op.us).reshape(N, Pu, -1), B),
            "t0": pad_batch(bm(op.t0)[None], B),
        }
        lamS, lamC, mu_bm, gate_bm = _prep_al(spec, al, gate, B)
        return lin_quad_pallas(dyn, pcs, spec, op_bm, lamS, lamC, mu_bm,
                               gate_bm, batch_block=B)

    t0 = time.time()
    outs = jax.jit(run_pallas)(op, al, gate)
    jax.block_until_ready(outs["A"])
    print(json.dumps({"stage": "stage_kernel_compile_run",
                      "s": round(time.time() - t0, 1)}), flush=True)

    lin = jax.vmap(lambda o: dyn_base.linearize(dyn, spec, o))(op)
    quad = jax.vmap(
        lambda o, a, e: pcost.quadraticize(pcs, spec, o, a, e))(op, al, ek)
    x, u = spec.xdim, spec.umax

    def mx(a, b):
        return float(jnp.max(jnp.abs(a - b)))

    # batch-minor refs: bm(t) moves batch last.
    d = {
        "dA": mx(outs["A"], bm(lin.A)),
        "dBf": mx(outs["Bf"],
                  bm(lin.Bs).transpose(0, 2, 1, 3, 4).reshape(N, x, Pu, -1)),
        "dQ": mx(outs["Qf"], bm(quad.Q).reshape(N, P * x, x, -1)),
        "dl": mx(outs["lf"], bm(quad.l).reshape(N, P * x, -1)),
        "dR": mx(outs["Rf"], bm(quad.R).reshape(N, P * P * u, u, -1)),
        "dr": mx(outs["rf"], bm(quad.r).reshape(N, P * P * u, -1)),
    }
    print(json.dumps({"stage": "parity", **{k: round(v, 6)
                                            for k, v in d.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
