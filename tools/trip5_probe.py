import dataclasses, json, os, sys, time
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

p = make_problem(); spec = p.spec
params = SolverParams(
    max_solver_iters=100, unconstrained_solver_max_iters=10,
    max_backtracking_steps=100, initial_alpha_scaling=0.1,
    convergence_tolerance=1.0, expected_decrease_fraction=0.001)
B = 1024; Bb = 128
rng = np.random.RandomState(0)
x0 = np.tile(np.asarray(p.x0)[None], (B, 1))
x0 += 0.1 * rng.randn(*x0.shape).astype(np.float32)
x0 = jnp.asarray(x0)
dyn, pcs = p.dynamics, p.player_costs

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
print("done frac after 30:", float(jnp.mean(fc30.done.astype(jnp.float32))))
print("merit sample:", np.asarray(fc30.c.last_merit[:5]))
print("xs finite frac:", float(jnp.isfinite(fc30.c.op.xs).mean()))
fc5 = steps_fn(params, 5)(x0, fc30)
jax.block_until_ready(fc5.done)
print("done frac after 35:", float(jnp.mean(fc5.done.astype(jnp.float32))))
print("iters sample:", np.asarray(fc5.c.iteration[:5]) if hasattr(fc5.c, "iteration") else "n/a")
