"""Pallas TPU kernels: the production fast path for the hot solver loops.

Each kernel runs a whole horizon recursion as an in-kernel grid sweep with
VMEM-resident carries and automatically double-buffered per-knot streams,
eliminating the per-step dispatch overhead of `lax.scan` on tiny tensors
(measured ~0.5-1 ms/step at batch 256, vs ~5 us/step in-kernel).

Layout convention: batch-minor (`[..., B]`), so the batch axis fills the
128-wide TPU lane dimension; small solver dims (state 16, controls 6) live
on sublanes.
"""

from ilqgames_tpu.ops.pallas.lq import solve_lq_feedback_pallas  # noqa: F401
