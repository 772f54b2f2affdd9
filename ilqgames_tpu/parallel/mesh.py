"""Scale-out: batched game solving sharded over a TPU device mesh.

The reference is single-threaded C++ (SURVEY.md §2.14) — every parallel
axis here is net-new capability. The parallelism that fits this workload
is *data parallel over problem instances*: per-stage matrices are tiny
(x <= ~20, u <= ~6), so tensor-parallel within a matrix is pointless;
instead thousands of independent game instances (different x0, different
cost parameters via AL multipliers/warm starts) are stacked along a
leading batch axis, vmapped, and row-partitioned across chips with
jax.sharding. XLA maps the batched small matmuls onto MXU tiles and the
only collectives are result gathers / convergence reductions over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ilqgames_tpu.problem import Problem
from ilqgames_tpu.solver import al as al_solver
from ilqgames_tpu.solver.params import SolverParams

BATCH_AXIS = "batch"


def make_mesh(devices=None, axis_name: str = BATCH_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices; instances shard over it.

    On multi-host pods the same call spans hosts: the batch axis rides ICI
    within a slice and DCN across slices, which is the right layout because
    instances never communicate except at result-gather time.
    """
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_shardings(mesh: Mesh, treedef_example, axis_name: str = BATCH_AXIS):
    """NamedSharding that row-partitions every leaf's leading batch axis."""
    spec = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda _: spec, treedef_example)


def solve_batched(
    problem: Problem,
    params: SolverParams,
    x0_batch: jnp.ndarray,
    mesh: Optional[Mesh] = None,
    donate: bool = False,
):
    """Solve a batch of instances of `problem` (varying x0), sharded over
    the mesh. Returns a batched ALResult with leaves sharded on axis 0.

    The batch size must divide the mesh size's multiple (pad externally if
    not). Compilation is cached per (problem, params, batch shape).
    """
    if mesh is None:
        mesh = make_mesh()

    batched = make_batched_solver(problem, params, mesh)
    return batched(x0_batch)


def make_batched_solver(
    problem: Problem, params: SolverParams, mesh: Optional[Mesh] = None,
    host_outer_loop: bool = False, backend: str = "auto",
    batch_block: int = 128, interpret: bool = False,
):
    """Build a batched solver fn: x0 [B, xdim] -> ALResult (batched).

    Warm starts are the problem's defaults broadcast across the batch; use
    `make_batched_warm_solver` to thread per-instance warm starts
    (receding-horizon batched replanning).

    host_outer_loop=True drives the AL outer loop from the host (one
    device program per inner iLQ solve) — same results, measured ~4x
    faster per iteration on TPU than the nested device-side while loops,
    and robust against long-program device faults. The batch sharding is
    preserved across host steps because every jitted piece is closed over
    sharded inputs.

    backend: "pallas" = the production batch-level Pallas machine
    (solver/batched.py) shard_mapped over the mesh; "xla" = the vmapped
    fused machine; "auto" = pallas on TPU (feedback-LQ problems), xla
    otherwise. The pallas path pads each device's local batch to a
    multiple of `batch_block` lanes internally.
    """
    if mesh is None:
        mesh = make_mesh()
    x0_sharding = NamedSharding(mesh, P(BATCH_AXIS))

    if backend == "auto":
        # The batched Pallas machine serves feedback AND open-loop
        # problems (open-loop uses the vmapped XLA LQ kernel inside it;
        # solver/batched.py module note).
        backend = "pallas" if jax.default_backend() != "cpu" else "xla"

    if backend == "pallas":
        from ilqgames_tpu.solver import batched

        return batched.make_host_batched_solver(
            problem.dynamics, problem.player_costs, problem.spec, params,
            warm_op=problem.initial_operating_point(),
            warm_strategy=problem.initial_strategy(),
            batch_block=batch_block, interpret=interpret, mesh=mesh,
        )

    if host_outer_loop:
        from ilqgames_tpu.solver import fused

        run = fused.make_host_batched_solver(
            problem.dynamics, problem.player_costs, problem.spec, params,
            warm_op=problem.initial_operating_point(),
            warm_strategy=problem.initial_strategy(),
        )

        def sharded_run(x0_batch):
            return run(jax.device_put(x0_batch, x0_sharding))

        return sharded_run

    def solve_one(x0):
        return al_solver.solve(
            problem.dynamics,
            problem.player_costs,
            problem.spec,
            params,
            x0,
            problem.initial_operating_point(),
            problem.initial_strategy(),
            problem.initial_al_state(),
        )

    return jax.jit(jax.vmap(solve_one), in_shardings=(x0_sharding,))


def make_batched_warm_solver(
    problem: Problem, params: SolverParams, mesh: Optional[Mesh] = None
):
    """Batched solver threading per-instance warm starts and AL multipliers:
    (x0 [B,x], warm_op, warm_strategy, al_state) -> batched ALResult."""
    if mesh is None:
        mesh = make_mesh()
    shard = NamedSharding(mesh, P(BATCH_AXIS))

    def solve_one(x0, op, strategy, al_state):
        return al_solver.solve(
            problem.dynamics, problem.player_costs, problem.spec, params,
            x0, op, strategy, al_state,
        )

    # A single sharding is a valid pytree prefix: every leaf of every
    # argument shards its leading (batch) axis.
    return jax.jit(jax.vmap(solve_one), in_shardings=shard)
