"""Multi-device scaling: structural and (where measurable) timing checks.

BASELINE.md demands >=80% weak-scaling efficiency from 1 chip to N. The
workload is data-parallel over instances with NO cross-instance traffic
(docs/scaling.md), so the scaling argument has two parts:

1. STRUCTURAL (always asserted): the compiled per-step program of the
   mesh-sharded solver contains no cross-device collectives — every
   device advances its local lanes independently, so per-step wall time
   is independent of device count (weak scaling is exactly linear up to
   host dispatch overhead, which the host-outer-loop design amortizes
   over trips_per_call in-device steps).

2. TIMING (asserted when the host has enough cores to make virtual
   CPU devices meaningful): throughput/device at 1 vs 4 devices with a
   fixed per-device batch and fixed trip count must stay >= 80%.
"""

import multiprocessing
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.solver import fused
from ilqgames_tpu.types import OperatingPoint, Strategy

N = 11
PER_DEVICE_BATCH = 2


def _params():
    from ilqgames_tpu.solver.params import SolverParams

    return SolverParams(
        max_solver_iters=6,
        unconstrained_solver_max_iters=3,
        max_backtracking_steps=8,
        initial_alpha_scaling=0.1,
        convergence_tolerance=1.0,
        expected_decrease_fraction=0.001,
        linesearch_chunk=4,
    )


def _steps_fn(problem, params, mesh, n_steps=4):
    """Jitted fixed-trip-count advance of the fused machine, sharded on
    the mesh (mirrors the host-outer-loop driver's steps program)."""
    dyn, costs, spec = problem.dynamics, problem.player_costs, problem.spec
    warm_op = OperatingPoint.zeros(spec)
    warm_strategy = Strategy.zeros(spec)
    al0 = pcost.ALState.init(costs, spec)
    shard = NamedSharding(mesh, PartitionSpec("batch"))

    def init_one(x0):
        from ilqgames_tpu.dynamics import base as dyn_base
        from ilqgames_tpu.solver import ilq

        last_op = warm_op.replace(xs=warm_op.xs.at[0].set(x0))
        op = dyn_base.rollout(dyn, spec, x0, last_op, warm_strategy)
        _, ek = pcost.total_costs(costs, spec, op)
        quad = pcost.quadraticize(costs, spec, op, al0, ek)
        c0 = ilq._SolveCarry(
            op=op, strategy=warm_strategy, quad=quad, extreme_ks=ek,
            last_merit=jnp.asarray(jnp.inf, jnp.float32),
            iteration=jnp.asarray(0, jnp.int32),
            converged=jnp.asarray(False), failed=jnp.asarray(False),
        )
        return fused._FusedCarry(
            c=c0, al=al0, warm_op=c0.op, warm_strategy=c0.strategy,
            inner_iters=jnp.asarray(0, jnp.int32),
            cum_iters=jnp.asarray(0, jnp.int32),
            violation=jnp.asarray(jnp.inf, jnp.float32),
            success=jnp.asarray(True), done=jnp.asarray(False),
        )

    def steps(x0_b, fc):
        def body(fc, _):
            fc2 = jax.vmap(
                lambda x0, f: fused._trip(dyn, costs, spec, params, x0, f)
            )(x0_b, fc)
            return fc2, None

        fc, _ = jax.lax.scan(body, fc, None, length=n_steps)
        return fc

    init_b = jax.jit(jax.vmap(init_one), in_shardings=(shard,))
    steps_b = jax.jit(steps)
    return init_b, steps_b, shard


def _x0_batch(problem, B):
    rng = np.random.RandomState(0)
    return jnp.asarray(
        np.tile(np.asarray(problem.x0)[None], (B, 1))
        + 0.1 * rng.randn(B, problem.spec.xdim).astype(np.float32)
    )


def test_no_cross_device_collectives():
    """The sharded steps program must be collective-free: instances never
    communicate, so scaling out adds no interconnect traffic."""
    problem = make_problem(num_time_steps=N)
    params = _params()
    devices = jax.devices()[:4]
    mesh = Mesh(np.asarray(devices), ("batch",))
    init_b, steps_b, shard = _steps_fn(problem, params, mesh)
    x0 = jax.device_put(_x0_batch(problem, 4 * PER_DEVICE_BATCH), shard)
    fc = init_b(x0)
    compiled = steps_b.lower(x0, fc).compile()
    hlo = compiled.as_text()
    for collective in ("all-reduce", "all-gather", "collective-permute",
                      "all-to-all", "reduce-scatter"):
        for line in hlo.splitlines():
            if f"%{collective}" not in line and f" {collective}(" not in line:
                continue
            # The ONLY permitted cross-device traffic: scalar predicate
            # votes for while-loop termination (O(1) bytes per tranche,
            # from the vmapped linesearch/while conds under GSPMD). Any
            # collective moving tensor data indicates a sharding bug.
            if "pred[]" in line:
                continue
            raise AssertionError(
                f"unexpected data-moving collective in steps program: "
                f"{line.strip()}"
            )


@pytest.mark.skipif(
    multiprocessing.cpu_count() < 8,
    reason="weak-scaling timing needs >= 2 cores per virtual device "
           "(oversubscribed virtual CPU devices measure host contention, "
           "not scaling)",
)
def test_weak_scaling_efficiency():
    problem = make_problem(num_time_steps=N)
    params = _params()

    def throughput(n_dev):
        mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("batch",))
        init_b, steps_b, shard = _steps_fn(problem, params, mesh)
        x0 = jax.device_put(
            _x0_batch(problem, n_dev * PER_DEVICE_BATCH), shard)
        fc = init_b(x0)
        out = steps_b(x0, fc)
        jax.block_until_ready(out.cum_iters)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = steps_b(x0, fc)
            jax.block_until_ready(out.cum_iters)
            best = min(best, time.perf_counter() - t0)
        return (n_dev * PER_DEVICE_BATCH) / best / n_dev

    t1 = throughput(1)
    t4 = throughput(4)
    efficiency = t4 / t1
    assert efficiency >= 0.8, (
        f"weak-scaling efficiency {efficiency:.2f} < 0.8 "
        f"(per-device throughput {t1:.2f} -> {t4:.2f})"
    )
