"""Verify the startling kernel-backend C=8 timing (0.054 ms at B=1024,
tools/merit_probe_r5.txt) before believing it — CLAUDE.md's chaotic-
timing protocol. Same-process measurements:

  * kernel C=8 at reps=20/100/400 (wall must scale linearly with reps
    if the timing is real; a constant wall means an artifact),
  * VALUE parity kernel-vs-xla at C=1 and C=8 (the in-kernel fold is
    the ground truth the XLA path replicates),
  * kernel/xla at the compact deep-round shape (Bc=128, C=8, per-lane
    scal windows),
  * pallas-consumer mismatch magnitude (merit_probe_r5 reported
    parity=false with no magnitude).

Output: tools/merit_probe_r5c.txt (one JSON line per measurement).
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
from ilqgames_tpu.ops.pallas import sweep as sweep_mod
from ilqgames_tpu.types import OperatingPoint, Strategy

OUT = open("/root/repo/tools/merit_probe_r5c.txt", "a")


def emit(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    OUT.write(line + "\n")
    OUT.flush()


B = 1024
problem = make_problem()
dyn, costs, spec = problem.dynamics, problem.player_costs, problem.spec
N, x, P, u = spec.num_time_steps, spec.xdim, spec.num_players, spec.umax

rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.randn(B, x).astype(np.float32))
op = OperatingPoint(
    xs=jnp.asarray(rng.randn(B, N, x).astype(np.float32)),
    us=jnp.asarray(0.01 * rng.randn(B, N, P, u).astype(np.float32)),
    t0=jnp.zeros((B,), jnp.float32),
)
st = Strategy(
    Ps=jnp.asarray(0.01 * rng.randn(B, N, P, u, x).astype(np.float32)),
    alphas=jnp.asarray(0.01 * rng.randn(B, N, P, u).astype(np.float32)),
)
al0 = jax.vmap(lambda _: pcost.ALState.init(costs, spec))(jnp.arange(B))
gate = jnp.ones((B, N, P), jnp.float32)


def make_fn(backend, C):
    scal = jnp.asarray(0.1 * 0.5 ** np.arange(C, dtype=np.float32))
    return jax.jit(lambda a, b, c_, d, e: sweep_mod.sweep_merits_pallas(
        dyn, costs, spec, a, b, c_, scal, d, e,
        batch_block=128, merit_backend=backend)), (x0, op, st, al0, gate)


def timed(backend, C, reps):
    fn, args = make_fn(backend, C)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    emit(backend=backend, C=C, reps=reps, wall_s=round(wall, 4),
         ms_per_call=round(wall / reps * 1e3, 4))
    return np.asarray(out)


def relerr(a, b):
    fin = np.isfinite(a) & np.isfinite(b)
    if not fin.any():
        return None, 0
    d = np.abs(a[fin] - b[fin]) / (np.abs(b[fin]) + 1e-6)
    return float(d.max()), int(fin.sum())


# 1. Linearity check on the kernel C=8 timing.
for reps in (20, 100, 400):
    timed("kernel", 8, reps)

# 2. Value parity (kernel is ground-truth fold).
for C in (1, 8):
    mk = timed("kernel", C, 20)
    mx = timed("xla", C, 20)
    mp = timed("pallas", C, 20)
    ek, nk = relerr(mx, mk)
    ep, np_ = relerr(mp, mk)
    same_finite_x = bool((np.isfinite(mx) == np.isfinite(mk)).all())
    same_finite_p = bool((np.isfinite(mp) == np.isfinite(mk)).all())
    emit(C=C, max_relerr_xla_vs_kernel=ek, n_finite=nk,
         same_finite_xla=same_finite_x,
         max_relerr_pallas_vs_kernel=ep,
         same_finite_pallas=same_finite_p)

# 3. Compact deep-round shape: one 128-lane block, per-lane windows.
Bc = 128
sel = jnp.arange(Bc)
g = lambda t: jax.tree_util.tree_map(lambda a: a[sel], t)
scal_w = jnp.broadcast_to(
    jnp.asarray(0.1 * 0.5 ** np.arange(8, dtype=np.float32))[None],
    (Bc, 8))
for backend in ("xla", "kernel", "xla"):
    fn = jax.jit(lambda a, b, c_, d, e, s: sweep_mod.sweep_merits_pallas(
        dyn, costs, spec, a, b, c_, s, d, e,
        batch_block=Bc, merit_backend=backend))
    args = (x0[sel], g(op), g(st), g(al0), gate[sel], scal_w)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(50):
        out = fn(*args)
    jax.block_until_ready(out)
    emit(shape="compact_Bc128_C8", backend=backend,
         ms_per_call=round((time.perf_counter() - t0) / 50 * 1e3, 4))
OUT.close()
