"""LQ kernel oracles, mirroring the reference test suite
(test/test_lq_solver.cpp):

  1. Feedback solver's first-stage gains match independent Lyapunov
     iterations to 1e-4 on a time-invariant 2-player point-mass game
     (test_lq_solver.cpp:292-317).
  2. Feedback solution is a local Nash in closed loop and NOT in open loop;
     open-loop solution is a local Nash in open loop (:319-387).
  3. Single-player open-loop and feedback controls agree at k=0 within 1%
     (:389-434).
"""

import jax.numpy as jnp
import numpy as np

from ilqgames_tpu.costs import atoms
from ilqgames_tpu.costs.player_cost import ALState, PlayerCost, quadraticize
from ilqgames_tpu.dynamics.base import MultiPlayerDynamics
from ilqgames_tpu.solver.lq_feedback import solve_lq_feedback
from ilqgames_tpu.solver.lq_open_loop import solve_lq_open_loop
from ilqgames_tpu.types import GameSpec, LinearDynamics, OperatingPoint, QuadraticCosts
from ilqgames_tpu.utils.check_nash import numerical_check_local_nash

DT = 0.1
N = 100


def two_player_point_mass_1d():
    """The reference's TwoPlayerPointMass1D test system
    (test/test_lq_solver.cpp:146-186)."""
    A_cont = np.array([[0.0, 1.0], [0.0, 0.0]], np.float32)
    B1 = np.array([0.05, 1.0], np.float32)
    B2 = np.array([0.032, 0.11], np.float32)

    def ode(t, x, us):
        return A_cont @ x + B1 * us[0, 0] + B2 * us[1, 0]

    dyn = MultiPlayerDynamics(
        name="two_player_point_mass_1d",
        xdims=(2, 0),
        udims=(1, 1),
        ode=ode,
    )
    A = np.eye(2, dtype=np.float32) + DT * A_cont
    Bs = np.zeros((2, 2, 1), np.float32)
    Bs[0, :, 0] = DT * B1
    Bs[1, :, 0] = DT * B2
    return dyn, A, Bs


def make_player_costs(nominal=0.0):
    """Costs from the reference fixture (test_lq_solver.cpp:227-248)."""
    scale = 0.1
    pc1 = PlayerCost(
        state_costs=(atoms.quadratic(1.0, None, nominal),),
        control_costs=(
            (0, atoms.quadratic(1.0, None, nominal)),
            (1, atoms.quadratic(scale, None, nominal)),
        ),
    )
    pc2 = PlayerCost(
        state_costs=(atoms.quadratic(scale, None, nominal),),
        control_costs=(
            (0, atoms.quadratic(scale, None, nominal)),
            (1, atoms.quadratic(1.0, None, nominal)),
        ),
    )
    return (pc1, pc2)


def build_quads(player_costs, spec):
    """Quadraticize at the zero operating point, replicated over time."""
    op = OperatingPoint.zeros(spec)
    al = ALState.init(player_costs, spec)
    extreme = jnp.zeros((spec.num_players,), jnp.int32)
    return quadraticize(player_costs, spec, op, al, extreme)


def lyapunov_iterations(A, B1, B2, Q1, Q2, R11, R12, R21, R22, iters=100):
    """Independent fixed-point method (test_lq_solver.cpp:72-110)."""
    Z1, Z2 = Q1.copy(), Q2.copy()
    P1 = np.linalg.solve(R11 + B1.T @ Z1 @ B1, B1.T @ Z1 @ A)
    P2 = np.linalg.solve(R22 + B2.T @ Z2 @ B2, B2.T @ Z2 @ A)
    for _ in range(iters):
        oP1, oP2 = P1, P2
        P1 = np.linalg.solve(R11 + B1.T @ Z1 @ B1, B1.T @ Z1 @ (A - B2 @ oP2))
        P2 = np.linalg.solve(R22 + B2.T @ Z2 @ B2, B2.T @ Z2 @ (A - B1 @ oP1))
        F = A - B1 @ P1 - B2 @ P2
        Z1 = F.T @ Z1 @ F + P1.T @ R11 @ P1 + P2.T @ R12 @ P2 + Q1
        Z2 = F.T @ Z2 @ F + P1.T @ R21 @ P1 + P2.T @ R22 @ P2 + Q2
    return P1, P2


def test_feedback_matches_lyapunov_iterations():
    dyn, A, Bs = two_player_point_mass_1d()
    spec = dyn.spec(dt=DT, num_time_steps=N)
    player_costs = make_player_costs(0.0)
    quad = build_quads(player_costs, spec)

    lin = LinearDynamics(
        A=jnp.broadcast_to(jnp.asarray(A), (N, 2, 2)),
        Bs=jnp.broadcast_to(jnp.asarray(Bs), (N, 2, 2, 1)),
    )
    x0 = jnp.ones((2,), jnp.float32)
    sol = solve_lq_feedback(spec, lin, quad, x0, adaptive_regularization=False)

    Q1 = np.asarray(quad.Q[0, 0])
    Q2 = np.asarray(quad.Q[0, 1])
    R = np.asarray(quad.R[0])  # [P, P, u, u]
    P1_ref, P2_ref = lyapunov_iterations(
        A, Bs[0], Bs[1], Q1, Q2, R[0, 0], R[0, 1], R[1, 0], R[1, 1]
    )
    P1 = np.asarray(sol.strategy.Ps[0, 0])  # [umax, x]
    P2 = np.asarray(sol.strategy.Ps[0, 1])
    assert np.max(np.abs(P1 - P1_ref)) < 1e-4
    assert np.max(np.abs(P2 - P2_ref)) < 1e-4


def _solve_both(nominal):
    dyn, A, Bs = two_player_point_mass_1d()
    spec = dyn.spec(dt=DT, num_time_steps=N)
    player_costs = make_player_costs(nominal)
    quad = build_quads(player_costs, spec)
    lin = LinearDynamics(
        A=jnp.broadcast_to(jnp.asarray(A), (N, 2, 2)),
        Bs=jnp.broadcast_to(jnp.asarray(Bs), (N, 2, 2, 1)),
    )
    x0 = jnp.ones((2,), jnp.float32)
    fb = solve_lq_feedback(spec, lin, quad, x0, adaptive_regularization=False)
    ol = solve_lq_open_loop(spec, lin, quad, x0)
    return dyn, spec, player_costs, x0, fb, ol


def test_feedback_is_closed_loop_nash_not_open_loop():
    dyn, spec, player_costs, x0, fb, _ = _solve_both(0.0)
    op = OperatingPoint.zeros(spec)
    assert bool(
        numerical_check_local_nash(
            dyn, player_costs, spec, fb.strategy, op, x0, 0.1, open_loop=False
        )
    )
    assert not bool(
        numerical_check_local_nash(
            dyn, player_costs, spec, fb.strategy, op, x0, 0.1, open_loop=True
        )
    )


def test_feedback_nash_with_linear_cost_terms():
    dyn, spec, player_costs, x0, fb, _ = _solve_both(0.5)
    op = OperatingPoint.zeros(spec)
    assert bool(
        numerical_check_local_nash(
            dyn, player_costs, spec, fb.strategy, op, x0, 0.1, open_loop=False
        )
    )


def test_open_loop_is_open_loop_nash():
    dyn, spec, player_costs, x0, _, ol = _solve_both(0.5)
    op = OperatingPoint.zeros(spec)
    assert bool(
        numerical_check_local_nash(
            dyn, player_costs, spec, ol.strategy, op, x0, 0.1, open_loop=True
        )
    )


def test_single_player_open_loop_matches_feedback():
    """Double integrator regulation (test_lq_solver.cpp:389-434)."""
    A = np.eye(2, dtype=np.float32)
    A[0, 1] = DT
    B = DT * 0.41 * np.eye(2, dtype=np.float32)

    spec = GameSpec(xdims=(2,), udims=(2,), dt=DT, num_time_steps=N)
    lin = LinearDynamics(
        A=jnp.broadcast_to(jnp.asarray(A), (N, 2, 2)),
        Bs=jnp.broadcast_to(jnp.asarray(B)[None], (N, 1, 2, 2)),
    )
    quad = QuadraticCosts(
        Q=jnp.broadcast_to(jnp.eye(2), (N, 1, 2, 2)).astype(jnp.float32),
        l=jnp.zeros((N, 1, 2), jnp.float32),
        R=jnp.broadcast_to(jnp.eye(2), (N, 1, 1, 2, 2)).astype(jnp.float32),
        r=jnp.zeros((N, 1, 1, 2), jnp.float32),
    )
    x0 = jnp.ones((2,), jnp.float32)
    fb = solve_lq_feedback(spec, lin, quad, x0, adaptive_regularization=False)
    ol = solve_lq_open_loop(spec, lin, quad, x0)

    u_ol = -np.asarray(ol.strategy.alphas[0, 0])
    u_fb = -(
        np.asarray(fb.strategy.Ps[0, 0]) @ np.asarray(x0)
        + np.asarray(fb.strategy.alphas[0, 0])
    )
    assert np.max(np.abs(u_ol - u_fb)) < 0.01 * np.max(np.abs(u_fb))
