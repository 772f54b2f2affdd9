"""Parity: batch-level Pallas solver vs the vmapped fused machine.

The batched machine (solver/batched.py) must make the SAME decisions
(linesearch accepts, convergence, AL boundaries) as fused._trip under
vmap, with arrays at float tolerance — kernels change op order (LU vs
linalg.solve, slab-sum order), not semantics. Runs on CPU in interpret
mode with a shortened horizon.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.solver import batched, fused, ilq
from ilqgames_tpu.solver.params import SolverParams
from ilqgames_tpu.types import OperatingPoint, Strategy

pytestmark = pytest.mark.slow  # full-solve / interpret-mode parity tier (~26 min total); fast gate: pytest -m "not slow"

B = 4
N = 11


@pytest.fixture(scope="module")
def setup():
    problem = make_problem(num_time_steps=N)
    params = SolverParams(
        max_solver_iters=30,
        unconstrained_solver_max_iters=5,
        max_backtracking_steps=20,
        initial_alpha_scaling=0.1,
        convergence_tolerance=1.0,
        expected_decrease_fraction=0.001,
        linesearch_chunk=4,
    )
    rng = np.random.RandomState(0)
    x0b = jnp.asarray(
        np.tile(np.asarray(problem.x0)[None], (B, 1))
        + 0.1 * rng.randn(B, problem.spec.xdim).astype(np.float32)
    )
    return problem, params, x0b


def _init_ref(problem, x0b):
    dyn, costs, spec = problem.dynamics, problem.player_costs, problem.spec
    warm_op = OperatingPoint.zeros(spec)
    warm_strategy = Strategy.zeros(spec)
    al0 = pcost.ALState.init(costs, spec)

    def init_one(x0):
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

    return jax.vmap(init_one)(x0b)


def test_trip_parity(setup):
    problem, params, x0b = setup
    dyn, costs, spec = problem.dynamics, problem.player_costs, problem.spec

    fc_ref = _init_ref(problem, x0b)
    # Batched init must agree with the vmapped init.
    wop = OperatingPoint.zeros(spec)
    wst = Strategy.zeros(spec)
    Bt = B
    al0 = jax.vmap(lambda _: pcost.ALState.init(costs, spec))(jnp.arange(Bt))
    wop_b = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (Bt,) + a.shape), wop
    )
    wst_b = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (Bt,) + a.shape), wst
    )
    c0_b = batched._init_inner_batched(
        dyn, costs, spec, x0b, wop_b, wst_b, al0,
        jnp.full((Bt,), jnp.inf, jnp.float32), batch_block=4, interpret=True,
    )
    np.testing.assert_allclose(c0_b.op.xs, fc_ref.c.op.xs, rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_array_equal(c0_b.extreme_ks, fc_ref.c.extreme_ks)

    fc_b = fused._FusedCarry(
        c=c0_b, al=al0, warm_op=c0_b.op, warm_strategy=c0_b.strategy,
        inner_iters=jnp.zeros((Bt,), jnp.int32),
        cum_iters=jnp.zeros((Bt,), jnp.int32),
        violation=jnp.full((Bt,), jnp.inf, jnp.float32),
        success=jnp.ones((Bt,), bool), done=jnp.zeros((Bt,), bool),
    )

    trip_ref = jax.jit(jax.vmap(
        lambda x0, fc: fused._trip(dyn, costs, spec, params, x0, fc)
    ))
    for trip_idx in range(6):
        fc_ref = trip_ref(x0b, fc_ref)
        fc_b = batched._trip_batched(
            dyn, costs, spec, params, x0b, fc_b, batch_block=4,
            interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(fc_b.c.failed), np.asarray(fc_ref.c.failed),
            err_msg=f"trip {trip_idx}: linesearch accept decisions diverged",
        )
        np.testing.assert_array_equal(
            np.asarray(fc_b.c.converged), np.asarray(fc_ref.c.converged),
            err_msg=f"trip {trip_idx}: convergence flags diverged",
        )
        np.testing.assert_array_equal(
            np.asarray(fc_b.done), np.asarray(fc_ref.done))
        np.testing.assert_allclose(
            fc_b.c.last_merit, fc_ref.c.last_merit, rtol=2e-3, atol=2e-3,
            err_msg=f"trip {trip_idx}: merits diverged",
        )
        np.testing.assert_allclose(
            fc_b.c.op.xs, fc_ref.c.op.xs, rtol=2e-3, atol=2e-3,
            err_msg=f"trip {trip_idx}: trajectories diverged",
        )
        np.testing.assert_allclose(
            fc_b.al.mu, fc_ref.al.mu, rtol=1e-6,
            err_msg=f"trip {trip_idx}: AL mu diverged",
        )


def test_shard_map_parity(setup):
    """The mesh-sharded pallas solver (shard_map over a 4-device CPU mesh)
    must equal the single-shard batched solver exactly — instances never
    communicate, so sharding cannot change any lane's math."""
    import numpy as onp
    from jax.sharding import Mesh

    problem, params, x0b = setup
    dyn, costs, spec = problem.dynamics, problem.player_costs, problem.spec
    mesh = Mesh(onp.asarray(jax.devices()[:4]), ("batch",))
    run_mesh = batched.make_host_batched_solver(
        dyn, costs, spec, params, trips_per_call=10, batch_block=1,
        interpret=True, mesh=mesh,
    )
    run_flat = batched.make_host_batched_solver(
        dyn, costs, spec, params, trips_per_call=10, batch_block=1,
        interpret=True,
    )
    res_m = run_mesh(x0b)
    res_f = run_flat(x0b)
    np.testing.assert_array_equal(
        np.asarray(res_m.converged), np.asarray(res_f.converged))
    np.testing.assert_allclose(res_m.op.xs, res_f.op.xs, rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(
        res_m.total_costs, res_f.total_costs, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("fuse_stages", [False, True],
                         ids=["xla-stages", "fused-stages"])
def test_full_solve_parity(setup, fuse_stages):
    problem, params, x0b = setup
    dyn, costs, spec = problem.dynamics, problem.player_costs, problem.spec
    run_ref = fused.make_host_batched_solver(
        dyn, costs, spec, params, trips_per_call=10
    )
    run_b = batched.make_host_batched_solver(
        dyn, costs, spec, params, trips_per_call=10, batch_block=4,
        interpret=True, fuse_stages=fuse_stages,
    )
    res_ref = run_ref(x0b)
    res_b = run_b(x0b)
    np.testing.assert_array_equal(
        np.asarray(res_b.converged), np.asarray(res_ref.converged))
    np.testing.assert_array_equal(
        np.asarray(res_b.cumulative_iterations),
        np.asarray(res_ref.cumulative_iterations))
    np.testing.assert_allclose(
        res_b.total_costs, res_ref.total_costs, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(res_b.op.xs, res_ref.op.xs, rtol=5e-3,
                               atol=5e-3)


def test_fused_stage_extremal_problem():
    """Fused-stage machine on an extremal-structure problem (MAX players,
    control constraints): must match the XLA-stage machine bitwise on CPU
    interpret — covers the stage kernel's extremal gating and control-
    constraint AL quadraticization."""
    from ilqgames_tpu.examples.reachability import (
        make_three_player_collision_avoidance,
    )

    prob = make_three_player_collision_avoidance(num_time_steps=9)
    params = SolverParams(
        max_solver_iters=12,
        unconstrained_solver_max_iters=4,
        max_backtracking_steps=12,
        initial_alpha_scaling=0.5,
        convergence_tolerance=1.0,
        expected_decrease_fraction=0.001,
    )
    rng = np.random.RandomState(3)
    Bt = 3
    x0b = jnp.asarray(
        np.tile(np.asarray(prob.x0)[None], (Bt, 1))
        + 0.05 * rng.randn(Bt, prob.spec.xdim).astype(np.float32)
    )
    run_f = batched.make_host_batched_solver(
        prob.dynamics, prob.player_costs, prob.spec, params,
        trips_per_call=6, batch_block=3, interpret=True, fuse_stages=True,
    )
    run_x = batched.make_host_batched_solver(
        prob.dynamics, prob.player_costs, prob.spec, params,
        trips_per_call=6, batch_block=3, interpret=True, fuse_stages=False,
    )
    rf = run_f(x0b)
    rx = run_x(x0b)
    np.testing.assert_array_equal(
        np.asarray(rf.converged), np.asarray(rx.converged))
    np.testing.assert_array_equal(
        np.asarray(rf.cumulative_iterations),
        np.asarray(rx.cumulative_iterations))
    np.testing.assert_allclose(rf.total_costs, rx.total_costs,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(rf.op.xs, rx.op.xs, rtol=1e-6, atol=1e-6)


def test_open_loop_batched_parity():
    """Open-loop problems on the batched machine (vmapped XLA LQ kernel
    inside the Pallas rollout/sweep machinery) vs the vmapped fused
    machine — dubins_origin, the reference's open-loop example."""
    from ilqgames_tpu.examples.dubins_origin import make_problem

    prob = make_problem(num_time_steps=10)
    params = SolverParams(
        max_solver_iters=8,
        max_backtracking_steps=10,
        initial_alpha_scaling=0.5,
        convergence_tolerance=1.0,
        expected_decrease_fraction=0.001,
        open_loop=True,
    )
    rng = np.random.RandomState(5)
    Bt = 3
    x0b = jnp.asarray(
        np.tile(np.asarray(prob.x0)[None], (Bt, 1))
        + 0.05 * rng.randn(Bt, prob.spec.xdim).astype(np.float32)
    )
    run_ref = fused.make_host_batched_solver(
        prob.dynamics, prob.player_costs, prob.spec, params,
        trips_per_call=8,
    )
    run_b = batched.make_host_batched_solver(
        prob.dynamics, prob.player_costs, prob.spec, params,
        trips_per_call=8, batch_block=3, interpret=True,
    )
    res_ref = run_ref(x0b)
    res_b = run_b(x0b)
    np.testing.assert_array_equal(
        np.asarray(res_b.converged), np.asarray(res_ref.converged))
    np.testing.assert_array_equal(
        np.asarray(res_b.cumulative_iterations),
        np.asarray(res_ref.cumulative_iterations))
    np.testing.assert_allclose(res_b.op.xs, res_ref.op.xs,
                               rtol=1e-5, atol=1e-5)
    # Open-loop strategies must come back with P == 0.
    assert float(jnp.max(jnp.abs(res_b.strategy.Ps))) == 0.0


def test_tiered_compact_ladder_parity(setup):
    """Multiple compact tiers (batch_block=2, Bt=8 -> tiers [2, 4]):
    the tier gathers must not change any decision vs the reference
    machine."""
    problem, params, x0b = setup
    dyn, costs, spec = problem.dynamics, problem.player_costs, problem.spec
    Bt = 8
    rng = np.random.RandomState(11)
    x0w = jnp.asarray(
        np.tile(np.asarray(x0b[0])[None], (Bt, 1))
        + 0.1 * rng.randn(Bt, spec.xdim).astype(np.float32))
    run_ref = fused.make_host_batched_solver(
        dyn, costs, spec, params, trips_per_call=10)
    run_b = batched.make_host_batched_solver(
        dyn, costs, spec, params, trips_per_call=10, batch_block=2,
        interpret=True, fuse_stages=False,
    )
    res_ref = run_ref(x0w)
    res_b = run_b(x0w)
    np.testing.assert_array_equal(
        np.asarray(res_b.converged), np.asarray(res_ref.converged))
    np.testing.assert_array_equal(
        np.asarray(res_b.cumulative_iterations),
        np.asarray(res_ref.cumulative_iterations))
    np.testing.assert_allclose(res_b.op.xs, res_ref.op.xs,
                               rtol=5e-3, atol=5e-3)


def test_fuse_stages_guards():
    """_resolve_fuse_for: the production default (True) must fall back
    to the XLA stage path for dynamics without analytic Jacobians
    (lin_quad_pallas cannot lower jacfwd on Mosaic) and for open-loop
    problems, instead of erroring at kernel-build time."""
    import dataclasses

    from ilqgames_tpu.examples.three_player_intersection import (
        make_problem as make_flagship)
    from ilqgames_tpu.examples.two_player_point_mass import (
        make_problem as make_pm)
    from ilqgames_tpu.solver.batched import _resolve_fuse_for
    from ilqgames_tpu.solver.params import SolverParams

    params = SolverParams()
    flagship = make_flagship()
    assert _resolve_fuse_for(params, True, flagship.dynamics) is True

    # The point-mass game ships an analytic Jacobian now (fast path)...
    pm = make_pm()
    assert pm.dynamics.ode_jac is not None
    assert _resolve_fuse_for(params, True, pm.dynamics) is True
    # ...and any jac-less dynamics falls back instead of raising.
    nojac = dataclasses.replace(pm.dynamics, ode_jac=None)
    assert _resolve_fuse_for(params, True, nojac) is False

    # Open-loop always disables the (feedback-only) fused stage kernel.
    ol = dataclasses.replace(params, open_loop=True)
    assert _resolve_fuse_for(ol, True, flagship.dynamics) is False


def test_sweep_merit_backends_agree(setup):
    """The emit+XLA merit path (production default) and the in-kernel
    accumulation (ILQ_SWEEP_MERIT=kernel escape hatch) compute the same
    formula in the same fold order — pin them against each other on a
    mid-solve state so the escape hatch cannot rot. The backend is
    passed as the EXPLICIT static argument (not the env var): it is part
    of the jit cache key, so both backends genuinely trace and run —
    the env-var version of this test silently compared one backend
    against its own jit-cached self (advisor r4, medium)."""
    from ilqgames_tpu.ops.pallas import sweep as sweep_mod

    problem, params, x0b = setup
    dyn, costs, spec = problem.dynamics, problem.player_costs, problem.spec

    fc = _init_ref(problem, x0b)
    for _ in range(2):
        fc = jax.jit(jax.vmap(
            lambda x0, f: fused._trip(dyn, costs, spec, params, x0, f)
        ))(x0b, fc)
    c = fc.c
    # Build a real LQ strategy for the sweep via the scan-path pieces.
    lin = jax.vmap(lambda o: dyn_base.linearize(dyn, spec, o))(c.op)
    from ilqgames_tpu.ops.pallas.lq import solve_lq_feedback_pallas
    lqsol = solve_lq_feedback_pallas(
        spec, lin, c.quad, x0b - c.op.xs[:, 0],
        adaptive_regularization=params.adaptive_regularization,
        batch_block=B, interpret=True)
    gate = batched._extreme_gate_b(costs, spec, c.extreme_ks)
    scalings = jnp.asarray([0.1, 0.05, 0.025, 0.0125], jnp.float32)

    def run(backend):
        return sweep_mod.sweep_merits_pallas(
            dyn, costs, spec, x0b, c.op, lqsol.strategy, scalings,
            fc.al, gate, batch_block=B, interpret=True,
            merit_backend=backend)

    m_kernel = np.asarray(run("kernel"))
    m_xla = np.asarray(run("xla"))
    m_pallas = np.asarray(run("pallas"))
    finite = np.isfinite(m_kernel)
    assert finite.any()
    np.testing.assert_allclose(m_xla[finite], m_kernel[finite],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.isfinite(m_xla), finite)
    # The reduce-style pallas consumer (emit + in-pallas merit) shares
    # the in-kernel fold order exactly.
    np.testing.assert_allclose(m_pallas[finite], m_kernel[finite],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.isfinite(m_pallas), finite)


@pytest.mark.parametrize("harvest_block", [None, 1],
                         ids=["harvest=block", "harvest<block"])
def test_queue_solver_matches_plain(setup, harvest_block):
    """Wave-refill queue solver == plain batched solver, per instance,
    BITWISE. Instances are lane-elementwise throughout the machine, so
    which lane (and which refill wave) an instance rides must not
    change its arithmetic; 10 instances through 4 device lanes
    (block=2) exercises initial fill, mid-run refill chunks, the
    ragged final chunk, lane retirement, and drain compaction.
    harvest_block=1 < batch_block covers the production configuration
    shape (bench.py runs harvest 32 under block 128)."""
    problem, params, _ = setup
    dyn, costs, spec = problem.dynamics, problem.player_costs, problem.spec
    rng = np.random.RandomState(3)
    Btot = 10
    x0b = jnp.asarray(
        np.tile(np.asarray(problem.x0)[None], (Btot, 1))
        + 0.1 * rng.randn(Btot, spec.xdim).astype(np.float32)
    )
    p = dataclasses.replace(params, max_solver_iters=12)

    run_plain = batched.make_host_batched_solver(
        dyn, costs, spec, p, trips_per_call=3, batch_block=2,
        interpret=True,
    )
    run_queue = batched.make_host_batched_queue_solver(
        dyn, costs, spec, p, device_batch=4, trips_per_call=3,
        batch_block=2, harvest_block=harvest_block, interpret=True,
    )
    res_p = run_plain(x0b)
    res_q = run_queue(x0b)
    for name in ("converged", "cumulative_iterations", "max_violation",
                 "total_costs"):
        np.testing.assert_array_equal(
            np.asarray(getattr(res_q, name)),
            np.asarray(getattr(res_p, name)), err_msg=name)
    np.testing.assert_array_equal(np.asarray(res_q.op.xs),
                                  np.asarray(res_p.op.xs))
    np.testing.assert_array_equal(np.asarray(res_q.strategy.alphas),
                                  np.asarray(res_p.strategy.alphas))
    # The bitwise claim above must actually cover the drain-compaction
    # branch (the production bench config compacts 4x per run,
    # tools/bench_r5f.log) — pin that this shape really triggered it.
    stats = run_queue.last_stats
    assert stats is not None and stats.get("compactions", 0) >= 1, stats


def test_xs_only_emission_bitwise(setup):
    """emit_us=False (default: kernel emits states only, controls are
    rebuilt in XLA with the kernel's fold order) vs the legacy
    both-arrays emission. The rebuild is the same f32 multiply/add
    chain but XLA's FMA contraction may fuse it differently, so the
    guarantee is ulp-level, not bitwise (see
    test_phase1_traj_reuse_bitwise); on this platform/jit the merits
    come out exactly equal, asserted at tight tolerance."""
    from ilqgames_tpu.ops.pallas import sweep as sweep_mod

    problem, params, x0b = setup
    dyn, costs, spec = problem.dynamics, problem.player_costs, problem.spec

    fc = _init_ref(problem, x0b)
    for _ in range(2):
        fc = jax.jit(jax.vmap(
            lambda x0, f: fused._trip(dyn, costs, spec, params, x0, f)
        ))(x0b, fc)
    c = fc.c
    lin = jax.vmap(lambda o: dyn_base.linearize(dyn, spec, o))(c.op)
    from ilqgames_tpu.ops.pallas.lq import solve_lq_feedback_pallas
    lqsol = solve_lq_feedback_pallas(
        spec, lin, c.quad, x0b - c.op.xs[:, 0],
        adaptive_regularization=params.adaptive_regularization,
        batch_block=B, interpret=True)
    gate = batched._extreme_gate_b(costs, spec, c.extreme_ks)
    scalings = jnp.asarray([0.1, 0.05, 0.025, 0.0125], jnp.float32)

    def run(emit_us):
        return np.asarray(sweep_mod.sweep_merits_pallas(
            dyn, costs, spec, x0b, c.op, lqsol.strategy, scalings,
            fc.al, gate, batch_block=B, interpret=True,
            merit_backend="xla", emit_us=emit_us))

    np.testing.assert_allclose(run(False), run(True),
                               rtol=1e-6, atol=1e-6)


def test_phase1_traj_reuse_bitwise(setup):
    """The claims under reroll_from_phase1: (1) the phase-1 sweep's
    emitted candidate states equal the rollout kernel's output at the
    same stepsize BITWISE (same kernel template), and (2) _us_from_xs
    rebuilds the kernel's controls to ULP accuracy — the same f32
    multiply/add chain, but XLA's FMA contraction can fuse it
    differently between compilations, so exact bit equality is not
    guaranteed (measured: ulp-level diffs on ~1/3 of elements). That
    is the recompile-class difference this project already documents
    and accepts for the fuse-stage modes (docs/scaling.md)."""
    from ilqgames_tpu.ops.pallas import sweep as sweep_mod

    problem, params, x0b = setup
    dyn, costs, spec = problem.dynamics, problem.player_costs, problem.spec

    fc = _init_ref(problem, x0b)
    for _ in range(2):
        fc = jax.jit(jax.vmap(
            lambda x0, f: fused._trip(dyn, costs, spec, params, x0, f)
        ))(x0b, fc)
    c = fc.c
    lin = jax.vmap(lambda o: dyn_base.linearize(dyn, spec, o))(c.op)
    from ilqgames_tpu.ops.pallas.lq import solve_lq_feedback_pallas
    lqsol = solve_lq_feedback_pallas(
        spec, lin, c.quad, x0b - c.op.xs[:, 0],
        adaptive_regularization=params.adaptive_regularization,
        batch_block=B, interpret=True)

    op, st, x0m = sweep_mod._prep_common(
        spec, x0b, c.op, lqsol.strategy, B)
    Bp = op["xs"].shape[-1]
    scal_cb = jnp.full((1, Bp), 0.1, jnp.float32)

    (xs_c,) = sweep_mod._run(
        dyn, None, spec, x0m, op, st, scal_cb, None, None, None, None,
        compute_merit=False, emit_traj="xs", batch_block=B,
        interpret=True)
    xs_r, us_r = sweep_mod.rollout_bm(
        dyn, spec, x0m, op, st, scal_cb, batch_block=B, interpret=True)
    np.testing.assert_array_equal(np.asarray(xs_c[:, :, 0, :]),
                                  np.asarray(xs_r))
    us_x = sweep_mod._us_from_xs(spec, xs_c, op, st, scal_cb)[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(us_x), np.asarray(us_r),
                               rtol=1e-6, atol=1e-7)
    # sweep_merits_bm(return_traj=True) hands back the same emission.
    gate = batched._extreme_gate_b(costs, spec, c.extreme_ks)
    lamS, lamC, mu, gate_bm = sweep_mod._prep_al(spec, fc.al, gate, B)
    _, xs_t = sweep_mod.sweep_merits_bm(
        dyn, costs, spec, x0m, op, st,
        jnp.asarray([0.1], jnp.float32), lamS, lamC, mu, gate_bm,
        batch_block=B, interpret=True, return_traj=True)
    np.testing.assert_array_equal(np.asarray(xs_t), np.asarray(xs_c))
