"""Compile + parity + timing check of the fused stage kernel on real TPU.

Bisects over kernel splits: the fully fused lin+quad kernel's Mosaic
compile was repeatedly OOM-killed on the v5e compile helper, so each
part ({lin, qstate, qctrl}) is compiled separately first (small traces,
fast compiles), then pairwise/fused. For every config that compiles,
records numeric parity vs the vmapped XLA linearize+quadraticize and a
queued-reps timing. Appends JSON lines to tools/tpu_stage_check.txt.

Run ALONE on the TPU (PYTHONPATH=/root/repo:$PYTHONPATH).
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
for _i in range(20):
    try:
        jax.devices()
        break
    except RuntimeError as _e:
        print(f"init retry {_i}: {_e}", flush=True)
        time.sleep(15)

import jax.numpy as jnp
import numpy as np

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.ops.pallas.layout import bm, pad_batch
from ilqgames_tpu.ops.pallas.stage import lin_quad_pallas
from ilqgames_tpu.ops.pallas.sweep import _prep_al
from ilqgames_tpu.solver.batched import _extreme_gate_b

OUT = os.path.join(os.path.dirname(__file__), "tpu_stage_check.txt")


def rec(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


SPLITS = {
    "lin": (("lin",),),
    "qctrl": (("qctrl",),),
    "qstate": (("qstate",),),
    "qstate0": (("qstate0",),),
    "qstate1": (("qstate1",),),
    "qstate2": (("qstate2",),),
    "lin+qctrl|qstate": (("lin", "qctrl"), ("qstate",)),
    "perplayer": (("lin", "qctrl"), ("qstate0",), ("qstate1",),
                  ("qstate2",)),
    "fused": (("lin", "qstate", "qctrl"),),
}


def main():
    problem = make_problem()
    spec = problem.spec
    dyn = problem.dynamics
    pcs = problem.player_costs
    B = int(os.environ.get("SC_BATCH", "128"))
    reps = int(os.environ.get("SC_REPS", "10"))
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

    # XLA references, batch-minor (bm moves batch last).
    lin = jax.vmap(lambda o: dyn_base.linearize(dyn, spec, o))(op)
    quad = jax.vmap(
        lambda o, a, e: pcost.quadraticize(pcs, spec, o, a, e))(op, al, ek)
    x, u = spec.xdim, spec.umax
    ref = {
        "A": bm(lin.A),
        "Bf": bm(lin.Bs).transpose(0, 2, 1, 3, 4).reshape(N, x, Pu, -1),
        "Qf": bm(quad.Q).reshape(N, P * x, x, -1),
        "lf": bm(quad.l).reshape(N, P * x, -1),
        "Rf": bm(quad.R).reshape(N, P * P * u, u, -1),
        "rf": bm(quad.r).reshape(N, P * P * u, -1),
    }
    jax.block_until_ready(ref["A"])

    which = os.environ.get(
        "SC_SPLITS", "lin,qctrl,qstate,lin+qctrl|qstate,fused").split(",")
    for name in which:
        split = SPLITS[name.strip()]

        def run_pallas(op, al, gate):
            op_bm = {
                "xs": pad_batch(bm(op.xs), B),
                "us": pad_batch(bm(op.us).reshape(N, Pu, -1), B),
                "t0": pad_batch(bm(op.t0)[None], B),
            }
            lamS, lamC, mu_bm, gate_bm = _prep_al(spec, al, gate, B)
            return lin_quad_pallas(dyn, pcs, spec, op_bm, lamS, lamC,
                                   mu_bm, gate_bm, batch_block=B,
                                   split=split)

        try:
            t0 = time.time()
            fn = jax.jit(run_pallas)
            outs = fn(op, al, gate)
            jax.block_until_ready(list(outs.values()))
            compile_s = time.time() - t0
        except Exception as e:
            rec(stage=f"stage_kernel_{name}", status="compile_failed",
                detail=str(e)[:300])
            continue

        d = {k: round(float(jnp.max(jnp.abs(outs[k] - ref[k]))), 6)
             for k in outs}
        t0 = time.time()
        for _ in range(reps):
            outs = fn(op, al, gate)
        jax.block_until_ready(list(outs.values()))
        run_s = (time.time() - t0) / reps
        rec(stage=f"stage_kernel_{name}", status="ok",
            compile_s=round(compile_s, 1), run_s=round(run_s, 4),
            B=B, **{f"d{k}": v for k, v in d.items()})
    rec(stage="stage_check_done")


if __name__ == "__main__":
    main()
