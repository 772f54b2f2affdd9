"""Decompose the merit-sweep kernel's per-knot cost by COST FAMILY.

The sweep kernel (ops/pallas/sweep.py) dominates the batched trip
(profile_glue.txt: sweep8 = 32 ms vs 3-6 ms for every other stage), and
its per-knot cost is ~40x the bare RK4+feedback step (kernel_floor.txt).
This harness ablates the flagship's player costs family-by-family and
times the REAL sweep kernel on each subset, so the difference attributes
per-knot microseconds to each family. Methodology: queued repeated calls
with ONE block_until_ready (the ~25-30 ms axon dispatch round trip
amortizes across reps); the 'none' row is the rollout+loop floor.

Writes JSON lines to stdout and tools/grads_floor3.txt.
"""

import dataclasses
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

OUT = os.path.join(os.path.dirname(__file__), "grads_floor3.txt")


def rec(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    from ilqgames_tpu.costs import player_cost as pcost
    from ilqgames_tpu.examples.three_player_intersection import make_problem
    from ilqgames_tpu.ops.pallas.sweep import sweep_merits_pallas
    from ilqgames_tpu.solver import batched

    p = make_problem()
    spec = p.spec
    Bt = int(os.environ.get("GF_BATCH", "256"))
    reps = int(os.environ.get("GF_REPS", "10"))
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(
        np.tile(np.asarray(p.x0)[None], (Bt, 1))
        + 0.1 * rng.randn(Bt, spec.xdim).astype(np.float32))
    bc = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (Bt,) + a.shape), t)
    wop = bc(p.initial_operating_point())
    wst = bc(p.initial_strategy())

    def subset(keep_state=lambda c: True, keep_sc=True, keep_cc=True,
               keep_ctrl=lambda c: True):
        pcs = []
        for pc in p.player_costs:
            pcs.append(dataclasses.replace(
                pc,
                state_costs=tuple(c for c in pc.state_costs
                                  if keep_state(c)),
                state_constraints=(pc.state_constraints if keep_sc
                                   else ()),
                control_costs=tuple((j, c) for j, c in pc.control_costs
                                    if keep_ctrl(c)),
                control_constraints=(pc.control_constraints if keep_cc
                                     else ()),
            ))
        return tuple(pcs)

    VARIANTS = {
        "full": subset(),
        "none": subset(lambda c: False, False, False, lambda c: False),
        "lane_only": subset(lambda c: c.name == "LaneCenter", False,
                            False, lambda c: False),
        "nominalv_only": subset(lambda c: c.name == "NominalV", False,
                                False, lambda c: False),
        "prox_only": subset(lambda c: False, True, False,
                            lambda c: False),
        "controls_only": subset(lambda c: False, False, False,
                                lambda c: True),
    }

    scal8 = 0.1 * (0.5 ** jnp.arange(8, dtype=jnp.float32))
    for name, pcs in VARIANTS.items():
        al0 = jax.vmap(lambda _: pcost.ALState.init(pcs, spec))(
            jnp.arange(Bt))
        c0 = batched._init_inner_batched(
            p.dynamics, pcs, spec, x0, wop, wst, al0,
            jnp.full((Bt,), jnp.inf, jnp.float32),
            batch_block=128, interpret=False)
        jax.block_until_ready(c0.op.xs)
        gate = batched._extreme_gate_b(pcs, spec, c0.extreme_ks)

        def call():
            return sweep_merits_pallas(
                p.dynamics, pcs, spec, x0, c0.op, c0.strategy, scal8,
                al0, gate, batch_block=128, cand_chunk=8)

        t0 = time.time()
        m = call()
        jax.block_until_ready(m)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            m = call()
        jax.block_until_ready(m)
        run_s = (time.time() - t0) / reps
        # per-knot-per-block microseconds (Bt/128 blocks x N knots)
        us_knot = run_s / (spec.num_time_steps * (Bt // 128)) * 1e6
        rec(stage=f"sweep8_{name}", compile_s=round(compile_s, 1),
            run_s=round(run_s, 4), us_per_knot_block=round(us_knot, 2))
    rec(stage="grads_floor3_done", B=Bt, reps=reps)


if __name__ == "__main__":
    main()
