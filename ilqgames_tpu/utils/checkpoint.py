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
