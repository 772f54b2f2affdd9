"""Round-4 trip re-measurement at B=1024 after the destacked core +
emit/XLA-merit sweep (profile_trip4 methodology, trip_full only, plus
the in-kernel escape hatch for A/B)."""
import dataclasses, functools, json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
for _i in range(20):
    try:
        jax.devices(); break
    except RuntimeError:
        time.sleep(15)
import jax.numpy as jnp
import numpy as np
from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.solver import batched
from ilqgames_tpu.solver.params import SolverParams
from ilqgames_tpu.examples.three_player_intersection import make_problem

OUT = "/root/repo/tools/profile_trip5.txt"
def rec(**kw):
    line = json.dumps(kw); print(line, flush=True)
    with open(OUT, "a") as f: f.write(line + "\n")

p = make_problem(); spec = p.spec
params = SolverParams(
    max_solver_iters=100, unconstrained_solver_max_iters=10,
    max_backtracking_steps=100, initial_alpha_scaling=0.1,
    convergence_tolerance=1.0, expected_decrease_fraction=0.001)
B = int(os.environ.get("PT_BATCH", "1024"))
Bb = 128
rng = np.random.RandomState(0)
x0 = np.tile(np.asarray(p.x0)[None], (B, 1))
x0 += 0.1 * rng.randn(*x0.shape).astype(np.float32)
x0 = jnp.asarray(x0)
dyn, pcs = p.dynamics, p.player_costs
rec(stage="start", B=B, merit=os.environ.get("ILQ_SWEEP_MERIT", "xla"))

def init(x0_b):
    Bt = x0_b.shape[0]
    al0 = jax.vmap(lambda _: pcost.ALState.init(pcs, spec))(jnp.arange(Bt))
    wop = p.initial_operating_point()
    wst = p.initial_strategy()
    bc = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (Bt,) + a.shape), t)
    return batched._carry0(dyn, pcs, spec, x0_b, bc(wop), bc(wst), al0,
                           Bb, False, fuse_stages=True)

def steps_fn(prm, K):
    def f(x0_b, fc):
        def body(fc, _):
            fc2 = batched._trip_batched(dyn, pcs, spec, prm, x0_b, fc,
                                        batch_block=Bb, interpret=False,
                                        fuse_stages=True)
            return batched._bwhere(fc.done, fc, fc2), None
        fc, _ = jax.lax.scan(body, fc, None, length=K)
        return fc
    return jax.jit(f)

fc = jax.jit(init)(x0)
adv = steps_fn(params, 30)
fc30 = adv(x0, fc)
jax.block_until_ready(fc30.done)
rec(stage="advanced30")

def trip_time(prm, label, ks=(5, 25)):
    t_by_k = {}
    for K in ks:
        f = steps_fn(prm, K)
        r = f(x0, fc30).done; jax.block_until_ready(r)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(x0, fc30).done; jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        t_by_k[K] = best
    ms = (t_by_k[ks[1]] - t_by_k[ks[0]]) / (ks[1] - ks[0]) * 1e3
    rec(stage=label, per_rep_ms=round(ms, 2),
        t_low_s=round(t_by_k[ks[0]], 2), t_high_s=round(t_by_k[ks[1]], 2))

trip_time(params, "trip_full")
rec(stage="done")
