"""Merit-sweep kernel cost vs candidate-chunk width.

Two questions: (a) does one chunk's cost scale with C or is it per-knot
fixed-overhead dominated (kernel_floor.txt's rk4_feedback_c26 suggests
the latter for the rollout)? (b) what's the best ladder shape — one
narrow first chunk (steady state: most lanes accept candidate 0) plus
wide later chunks, or uniform width?

Times the FULL C=104 ladder at each chunk width (13/7/4/2 calls) and one
SINGLE chunk at each width. Methodology: queued repeated calls, one
block_until_ready. Appends JSON lines to tools/sweep_width.txt.

SW_CHUNKS env (default "2,4,8,16") picks widths; 26/52 are the widest
known to compile in reasonable time (a C=104 single kernel blew past 20
minutes of Mosaic compile in round 2).
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

OUT = os.path.join(os.path.dirname(__file__), "sweep_width.txt")


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
    Bt = int(os.environ.get("SW_BATCH", "256"))
    reps = int(os.environ.get("SW_REPS", "10"))
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(
        np.tile(np.asarray(p.x0)[None], (Bt, 1))
        + 0.1 * rng.randn(Bt, spec.xdim).astype(np.float32))
    bc = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (Bt,) + a.shape), t)
    al0 = jax.vmap(
        lambda _: pcost.ALState.init(p.player_costs, spec))(jnp.arange(Bt))
    c0 = batched._init_inner_batched(
        p.dynamics, p.player_costs, spec, x0, bc(p.initial_operating_point()),
        bc(p.initial_strategy()), al0, jnp.full((Bt,), jnp.inf, jnp.float32),
        batch_block=128, interpret=False)
    jax.block_until_ready(c0.op.xs)
    gate = batched._extreme_gate_b(p.player_costs, spec, c0.extreme_ks)
    scal104 = 0.1 * (0.5 ** jnp.arange(104, dtype=jnp.float32))

    chunks = [int(c) for c in
              os.environ.get("SW_CHUNKS", "2,4,8,16").split(",")]
    ref = None
    for chunk in chunks:
        def ladder():
            return sweep_merits_pallas(
                p.dynamics, p.player_costs, spec, x0, c0.op, c0.strategy,
                scal104, al0, gate, batch_block=128, cand_chunk=chunk)

        def single():
            return sweep_merits_pallas(
                p.dynamics, p.player_costs, spec, x0, c0.op, c0.strategy,
                scal104[:chunk], al0, gate, batch_block=128,
                cand_chunk=chunk)

        t0 = time.time()
        m = ladder()
        jax.block_until_ready(m)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            m = ladder()
        jax.block_until_ready(m)
        ladder_s = (time.time() - t0) / reps
        if ref is None:
            ref = m
        d = float(jnp.nanmax(jnp.abs(m - ref)))

        s = single()
        jax.block_until_ready(s)
        t0 = time.time()
        for _ in range(reps):
            s = single()
        jax.block_until_ready(s)
        single_s = (time.time() - t0) / reps
        rec(stage=f"sweep104_chunk{chunk}", compile_s=round(compile_s, 1),
            ladder104_s=round(ladder_s, 4), single_chunk_s=round(single_s, 4),
            dref=d, B=Bt)
    rec(stage="sweep_width_done", chunks=chunks, reps=reps)


if __name__ == "__main__":
    main()
