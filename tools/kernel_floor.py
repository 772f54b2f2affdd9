"""Microbenchmarks: what does one in-kernel horizon step actually cost?

Four kernels, all VMEM-resident (grid=(1,), no streaming), 100 fori
steps each, B=128 lanes:
  fma50   - 50 chained FMAs on [16,128] per step (issue-rate floor)
  rk4     - RK4 with the real 3-player ode, fixed controls
  rk4_fb  - + affine feedback law from resident Ps/alphas
  rk4_c26 - rk4_fb at 26 candidates ([x, 26, 128] state)

JSON lines to tools/kernel_floor.txt.
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

for _i in range(20):
    try:
        jax.devices()
        break
    except RuntimeError:
        time.sleep(15)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT = "/root/repo/tools/kernel_floor.txt"
Bb = 128
N = 100


def record(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def timeit(fn, *args, reps=20):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return compile_s, (time.perf_counter() - t0) / reps


def run_kernel(kern, operands, out_shape, scratch=()):
    f = jax.jit(lambda *a: pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in operands],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(scratch),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*a))
    return timeit(f, *operands)


def main():
    from ilqgames_tpu.examples.three_player_intersection import make_problem
    from ilqgames_tpu.dynamics import base as dyn_base

    problem = make_problem()
    dyn, spec = problem.dynamics, problem.spec
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(16, Bb).astype(np.float32))

    # ---- fma50 ----
    def fma50(x_ref, o_ref):
        def step(i, x):
            for _ in range(50):
                x = x * 1.000001 + 0.000001
            return x

        o_ref[...] = jax.lax.fori_loop(0, N, step, x_ref[...])

    cs, rs = run_kernel(fma50, [x0],
                        jax.ShapeDtypeStruct((16, Bb), jnp.float32))
    record(stage="fma50", compile_s=round(cs, 1),
           us_per_step=round(rs / N * 1e6, 2))

    # ---- rk4, fixed controls ----
    us_fix = jnp.asarray(0.01 * rng.randn(3, 2, Bb).astype(np.float32))

    def integ1(t, xx, uu):
        one = lambda tt, x_, u_: dyn_base.integrate(dyn, tt, spec.dt, x_, u_)
        return jax.vmap(one, in_axes=(None, -1, -1), out_axes=-1)(t, xx, uu)

    def rk4(x_ref, u_ref, o_ref):
        def step(i, x):
            return integ1(0.1, x, u_ref[...])

        o_ref[...] = jax.lax.fori_loop(0, N, step, x_ref[...])

    cs, rs = run_kernel(rk4, [x0, us_fix],
                        jax.ShapeDtypeStruct((16, Bb), jnp.float32))
    record(stage="rk4_fixed_u", compile_s=round(cs, 1),
           us_per_step=round(rs / N * 1e6, 2))

    # ---- rk4 + feedback law (resident strategy) ----
    Ps = jnp.asarray(0.01 * rng.randn(N, 6, 16, Bb).astype(np.float32))
    al = jnp.asarray(0.01 * rng.randn(N, 6, Bb).astype(np.float32))
    xs_ref_traj = jnp.asarray(rng.randn(N, 16, Bb).astype(np.float32))

    def rk4_fb(x_ref, Ps_ref, al_ref, xr_ref, o_ref):
        def step(i, x):
            P_k = Ps_ref[pl.ds(i, 1)][0]
            a_k = al_ref[pl.ds(i, 1)][0]
            xr = xr_ref[pl.ds(i, 1)][0]
            delta = x - xr
            rows = []
            for af in range(6):
                acc = P_k[af, 0][None, :] * delta[0]
                for xx in range(1, 16):
                    acc = acc + P_k[af, xx][None, :] * delta[xx]
                rows.append(acc + a_k[af][None, :])
            uu = jnp.stack(rows, 0).reshape(3, 2, x.shape[-1])
            return integ1(0.1, x, uu)

        o_ref[...] = jax.lax.fori_loop(0, N, step, x_ref[...])

    cs, rs = run_kernel(rk4_fb, [x0, Ps, al, xs_ref_traj],
                        jax.ShapeDtypeStruct((16, Bb), jnp.float32))
    record(stage="rk4_feedback", compile_s=round(cs, 1),
           us_per_step=round(rs / N * 1e6, 2))

    # ---- rk4 + feedback at 26 candidates ----
    C = 26
    x0c = jnp.asarray(rng.randn(16, C, Bb).astype(np.float32))

    def integC(t, xx, uu):
        one = lambda tt, x_, u_: dyn_base.integrate(dyn, tt, spec.dt, x_, u_)
        inner = jax.vmap(one, in_axes=(None, -1, -1), out_axes=-1)
        return jax.vmap(inner, in_axes=(None, 1, 2), out_axes=1)(t, xx, uu)

    def rk4_c(x_ref, Ps_ref, al_ref, xr_ref, o_ref):
        def step(i, x):
            P_k = Ps_ref[pl.ds(i, 1)][0]
            a_k = al_ref[pl.ds(i, 1)][0]
            xr = xr_ref[pl.ds(i, 1)][0]
            delta = x - xr[:, None, :]
            rows = []
            for af in range(6):
                acc = P_k[af, 0][None, :] * delta[0]
                for xx in range(1, 16):
                    acc = acc + P_k[af, xx][None, :] * delta[xx]
                rows.append(acc + a_k[af][None, :])
            uu = jnp.stack(rows, 0).reshape(3, 2, C, x.shape[-1])
            return integC(0.1, x, uu)

        o_ref[...] = jax.lax.fori_loop(0, N, step, x_ref[...])

    cs, rs = run_kernel(rk4_c, [x0c, Ps, al, xs_ref_traj],
                        jax.ShapeDtypeStruct((16, C, Bb), jnp.float32))
    record(stage="rk4_feedback_c26", compile_s=round(cs, 1),
           us_per_step=round(rs / N * 1e6, 2))

    record(stage="done")


if __name__ == "__main__":
    main()
