"""Checkpoint / resume for batched solver state.

The reference's only durable state is SolverLog text dumps; its 'resume'
story is in-memory warm-starting (SURVEY.md §5). For large batched runs
(thousands of receding-horizon agents) this module adds real checkpoints:
any solver-state pytree (ALResult, SimState, warm starts, AL multipliers)
round-trips through a single .npz file, so a preempted run restarts from
the last solve instead of from zeros. Pytree structure is rebuilt from a
caller-provided example tree, which keeps the format dependency-free."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def save(path: str, tree: Any) -> None:
    """Write a pytree of arrays to `path` (.npz, compressed)."""
    leaves = jax.tree_util.tree_leaves(tree)
    np.savez_compressed(
        path, **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    )


def load(path: str, example: Any) -> Any:
    """Read a pytree saved by `save`, shaped like `example` (same treedef)."""
    data = np.load(path)
    treedef = jax.tree_util.tree_structure(example)
    n = treedef.num_leaves
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def reshard(tree: Any, mesh) -> Any:
    """Re-place a batched solver-state pytree on `mesh` (batch axis
    sharded over the mesh's devices). Instances never communicate
    (parallel/mesh.py), so a topology change is pure data movement:
    checkpoints taken on an N-device mesh resume bit-identically on any
    M-device mesh whose size divides the batch. This is the elasticity
    story — shrink or grow the fleet between (not during) solves."""
    from jax.sharding import NamedSharding, PartitionSpec

    from ilqgames_tpu.parallel.mesh import BATCH_AXIS

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    B = leaves[0].shape[0] if leaves and jnp.ndim(leaves[0]) else None
    if B is None:
        raise ValueError("reshard needs a pytree of batched arrays "
                         "(leading axis = batch); got a scalar first leaf")
    # Validate EVERY leaf up front: a scalar or unbatched aux leaf would
    # otherwise shard the wrong axis / die in an opaque device_put error.
    for (path, leaf) in paths:
        if jnp.ndim(leaf) < 1 or leaf.shape[0] != B:
            raise ValueError(
                f"reshard: leaf {jax.tree_util.keystr(path)} has shape "
                f"{jnp.shape(leaf)}; every leaf must carry the batch "
                f"axis (leading dim {B}) to be sharded over the mesh")
    n_dev = mesh.devices.size
    if B % n_dev != 0:
        raise ValueError(
            f"batch {B} does not divide over {n_dev} devices; pad or "
            f"trim the batch before resharding")
    sharding = NamedSharding(mesh, PartitionSpec(BATCH_AXIS))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), tree)


def resume_on_mesh(path: str, example: Any, mesh) -> Any:
    """Load a checkpoint written by `save` and place it on `mesh` —
    the mesh need NOT match the topology the checkpoint was taken on."""
    return reshard(load(path, example), mesh)
