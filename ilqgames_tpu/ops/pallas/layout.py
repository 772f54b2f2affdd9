"""Batch-major <-> batch-minor layout helpers for the Pallas kernels.

Kernels take batch-minor arrays ([..., B], batch in the TPU lane dim);
the rest of the framework is batch-major ([B, ...], vmap convention).
"""

from __future__ import annotations

import jax.numpy as jnp


def bm(a: jnp.ndarray) -> jnp.ndarray:
    """Batch-major -> batch-minor: move the leading batch axis last."""
    return jnp.moveaxis(a, 0, -1)


def mb(a: jnp.ndarray, Bt: int) -> jnp.ndarray:
    """Batch-minor -> batch-major, trimming padded lanes to Bt."""
    return jnp.moveaxis(a[..., :Bt], -1, 0)


def pad_batch(arr: jnp.ndarray, Bb: int) -> jnp.ndarray:
    """Pad the trailing batch axis to a multiple of Bb by edge-replication
    (replicated real lanes can never produce NaNs/infs that zero-padding
    might, e.g. in lane divisions)."""
    B = arr.shape[-1]
    pad = (-B) % Bb
    if pad == 0:
        return arr
    return jnp.concatenate(
        [arr, jnp.broadcast_to(arr[..., -1:], arr.shape[:-1] + (pad,))],
        axis=-1,
    )
