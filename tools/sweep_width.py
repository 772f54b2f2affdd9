"""Does candidate width cost anything? Merit-sweep kernel at C=8 (13
chunked calls) vs one call at C=32 / C=104, B=256. JSON lines."""
import json, time, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
for _i in range(20):
    try:
        jax.devices(); break
    except RuntimeError:
        time.sleep(15)
import jax.numpy as jnp, numpy as np

OUT = "/root/repo/tools/sweep_width.txt"
def rec(**kw):
    line = json.dumps(kw); print(line, flush=True)
    with open(OUT, "a") as f: f.write(line + "\n")

from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.ops.pallas.sweep import sweep_merits_pallas
from ilqgames_tpu.solver import batched

p = make_problem(); spec = p.spec
Bt = 256
rng = np.random.RandomState(0)
x0 = jnp.asarray(np.tile(np.asarray(p.x0)[None], (Bt, 1)) + 0.1*rng.randn(Bt, spec.xdim).astype(np.float32))
wop = jax.tree_util.tree_map(lambda a: jnp.broadcast_to(a[None], (Bt,)+a.shape), p.initial_operating_point())
wst = jax.tree_util.tree_map(lambda a: jnp.broadcast_to(a[None], (Bt,)+a.shape), p.initial_strategy())
al0 = jax.vmap(lambda _: pcost.ALState.init(p.player_costs, spec))(jnp.arange(Bt))
c0 = batched._init_inner_batched(p.dynamics, p.player_costs, spec, x0, wop, wst, al0,
                                 jnp.full((Bt,), jnp.inf, jnp.float32), batch_block=128, interpret=False)
jax.block_until_ready(c0.op.xs)
gate = batched._extreme_gate_b(p.player_costs, spec, c0.extreme_ks)
scal104 = 0.1 * (0.5 ** jnp.arange(104, dtype=jnp.float32))

ref = None
for chunk in (8, 32, 104):
    t0 = time.time()
    m = sweep_merits_pallas(p.dynamics, p.player_costs, spec, x0, c0.op, c0.strategy,
                            scal104, al0, gate, batch_block=128, cand_chunk=chunk)
    jax.block_until_ready(m)
    compile_s = time.time() - t0
    t0 = time.time(); reps = 5
    for _ in range(reps):
        m = sweep_merits_pallas(p.dynamics, p.player_costs, spec, x0, c0.op, c0.strategy,
                                scal104, al0, gate, batch_block=128, cand_chunk=chunk)
    jax.block_until_ready(m)
    run_s = (time.time() - t0) / reps
    if ref is None: ref = m
    d = float(jnp.nanmax(jnp.abs(m - ref)))
    rec(stage=f"sweep104_chunk{chunk}", compile_s=round(compile_s,1), run_s=round(run_s,4), dref=d)
rec(stage="done")
