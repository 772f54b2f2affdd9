"""Cross-language oracle: the native C++ coupled-Riccati kernel and the JAX
scan kernel must agree on gains, affine terms, and delta-x trajectories —
two independent implementations of the same recursion (the reference's
analogous cross-validation is Lyapunov iterations, test_lq_solver.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ilqgames_tpu.ops.native import solve_lq_feedback_native
from ilqgames_tpu.solver.lq_feedback import solve_lq_feedback
from ilqgames_tpu.types import GameSpec, LinearDynamics, QuadraticCosts


def random_game(seed, N=20, P=3, xdim=6, udims=(2, 1, 2)):
    rng = np.random.RandomState(seed)
    umax = max(udims)
    spec = GameSpec(xdims=(xdim,) + (0,) * (P - 1), udims=udims,
                    num_time_steps=N)

    A = np.eye(xdim, dtype=np.float32)[None] + 0.1 * rng.randn(
        N, xdim, xdim
    ).astype(np.float32) * 0.1
    Bs = np.zeros((N, P, xdim, umax), np.float32)
    for i, d in enumerate(udims):
        Bs[:, i, :, :d] = 0.1 * rng.randn(N, xdim, d)

    Q = np.zeros((N, P, xdim, xdim), np.float32)
    l = 0.1 * rng.randn(N, P, xdim).astype(np.float32)
    R = np.zeros((N, P, P, umax, umax), np.float32)
    r = np.zeros((N, P, P, umax), np.float32)
    for i in range(P):
        M = rng.randn(xdim, xdim).astype(np.float32)
        Q[:, i] = (M @ M.T)[None] / xdim
        for j in range(P):
            d = udims[j]
            W = rng.randn(d, d).astype(np.float32)
            R[:, i, j, :d, :d] = (W @ W.T + np.eye(d))[None]
            r[:, i, j, :d] = 0.1 * rng.randn(N, d)
    x0 = rng.randn(xdim).astype(np.float32)
    return spec, A, Bs, Q, l, R, r, x0


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("adaptive", [True, False])
def test_native_matches_jax(seed, adaptive):
    spec, A, Bs, Q, l, R, r, x0 = random_game(seed)

    Ps_n, alphas_n, dxs_n = solve_lq_feedback_native(
        spec, A, Bs, Q, l, R, r, x0, adaptive_regularization=adaptive
    )
    sol = solve_lq_feedback(
        spec,
        LinearDynamics(A=jnp.asarray(A), Bs=jnp.asarray(Bs)),
        QuadraticCosts(Q=jnp.asarray(Q), l=jnp.asarray(l),
                       R=jnp.asarray(R), r=jnp.asarray(r)),
        jnp.asarray(x0),
        adaptive_regularization=adaptive,
    )
    np.testing.assert_allclose(
        Ps_n, np.asarray(sol.strategy.Ps), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        alphas_n, np.asarray(sol.strategy.alphas), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        dxs_n, np.asarray(sol.delta_xs), rtol=5e-3, atol=5e-4
    )
    # Padded control entries are exactly zero in both.
    assert np.abs(Ps_n[:, 1, 1:]).max() == 0.0
    assert np.abs(np.asarray(sol.strategy.Ps)[:, 1, 1:]).max() == 0.0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_open_loop_matches_jax(seed):
    from ilqgames_tpu.ops.native import solve_lq_open_loop_native
    from ilqgames_tpu.solver.lq_open_loop import solve_lq_open_loop

    spec, A, Bs, Q, l, R, r, x0 = random_game(seed)

    alphas_n, dxs_n, costates_n = solve_lq_open_loop_native(
        spec, A, Bs, Q, l, R, r, x0
    )
    sol = solve_lq_open_loop(
        spec,
        LinearDynamics(A=jnp.asarray(A), Bs=jnp.asarray(Bs)),
        QuadraticCosts(Q=jnp.asarray(Q), l=jnp.asarray(l),
                       R=jnp.asarray(R), r=jnp.asarray(r)),
        jnp.asarray(x0),
    )
    np.testing.assert_allclose(
        alphas_n, np.asarray(sol.strategy.alphas), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        dxs_n, np.asarray(sol.delta_xs), rtol=5e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        costates_n, np.asarray(sol.costates), rtol=5e-3, atol=5e-4
    )
    # Open-loop strategies carry no feedback gains; padded alphas zero.
    assert np.abs(np.asarray(sol.strategy.Ps)).max() == 0.0
    assert np.abs(alphas_n[:, 1, 1:]).max() == 0.0
