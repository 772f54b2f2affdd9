"""Observability + persistence utilities: SolverLog round trip and text
format (reference src/solver_log.cpp:113-170), interpolation accessors,
PlayerCostCache, LoopTimer bound, checkpoint round trip, viz smoke."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from ilqgames_tpu.examples.skeleton import make_problem
from ilqgames_tpu.solver.params import SolverParams
from ilqgames_tpu.utils import checkpoint
from ilqgames_tpu.utils.cost_cache import PlayerCostCache
from ilqgames_tpu.utils.timing import LoopTimer

PARAMS = SolverParams(
    max_solver_iters=5,
    max_backtracking_steps=10,
    initial_alpha_scaling=0.5,
    convergence_tolerance=0.1,
    expected_decrease_fraction=0.1,
)


def solved_log():
    prob = make_problem(num_time_steps=20)
    res, log = prob.solve_logged(PARAMS)
    return prob, res, log


def test_solver_log_records_and_saves():
    prob, res, log = solved_log()
    # Iterate 0 is the initial rollout; at least one solver iterate follows.
    assert log.num_iterates >= 2
    # Final logged op matches the solver result.
    np.testing.assert_allclose(
        np.asarray(log.final_operating_point.xs), np.asarray(res.op.xs),
        atol=1e-6,
    )
    # Interpolation: halfway between knots 0 and 1.
    x_half = log.interpolate_state(0, 0.5 * prob.spec.dt)
    expected = 0.5 * (log.state(0, 0) + log.state(0, 1))
    np.testing.assert_allclose(x_half, expected, atol=1e-6)

    with tempfile.TemporaryDirectory() as d:
        base = log.save("exp", log_dir=d)
        xs0 = np.loadtxt(os.path.join(base, "0", "xs.txt"))
        assert xs0.shape == (20, 4)
        u0 = np.loadtxt(os.path.join(base, "0", "u0.txt"))
        assert u0.shape == (20, 2)
        log.to_npz(os.path.join(d, "log.npz"))
        data = np.load(os.path.join(d, "log.npz"))
        assert data["xs"].shape[0] == log.num_iterates


def test_player_cost_cache():
    prob, res, log = solved_log()
    cache = PlayerCostCache(prob, log)
    names = cache.names(0)
    assert "GoalX" in names and "Control" in names
    vals = cache.evaluate(log.num_iterates - 1, 0, "GoalX")
    assert vals.shape == (20,)
    # Goal cost decreases from start toward the end of the trajectory.
    assert vals[-1] < vals[0]


def test_loop_timer_bound():
    t = LoopTimer(max_samples=3, initial_guess_s=0.5)
    assert t.runtime_upper_bound() == 0.5
    for _ in range(3):
        t.tic()
        t.toc()
    assert 0.0 <= t.runtime_upper_bound() < 0.5


def test_checkpoint_roundtrip_solver_state():
    prob, res, log = solved_log()
    tree = {"op": res.op, "strategy": res.strategy, "merit": res.merit}
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "state.npz")
        checkpoint.save(path, tree)
        back = checkpoint.load(path, tree)
    np.testing.assert_array_equal(
        np.asarray(back["op"].xs), np.asarray(res.op.xs)
    )


def test_viz_smoke():
    import matplotlib

    matplotlib.use("Agg")

    from ilqgames_tpu import viz

    prob, res, log = solved_log()
    ax = viz.plot_top_down(prob, log)
    assert ax is not None
    ax2 = viz.plot_costs(prob, log, player=0)
    assert ax2 is not None


def test_viz_html_artifact():
    """The scrubable HTML animation (reference GUI capability as a
    headless artifact: iterate + time sliders over the full history)."""
    from ilqgames_tpu import viz_html

    prob, res, log = solved_log()
    with tempfile.TemporaryDirectory() as d:
        path = viz_html.render_html(
            prob, log, os.path.join(d, "anim.html"),
            lanes=[np.array([[0.0, -5.0], [0.0, 5.0]])],
        )
        html = open(path).read()
    assert "<canvas" in html and "iterate" in html
    # Embedded data covers every iterate and knot.
    assert f'"dt": {float(prob.spec.dt)}' in html
    assert html.count('"x":') == log.num_iterates * prob.spec.num_players
    # Cost-inspector payload: every named cost of every player at every
    # iterate (reference gui/cost_inspector.h:62-100 capability).
    assert '"stage_costs":' in html
    for pc in prob.player_costs:
        for c in pc.state_costs:
            assert f'"{c.name}"' in html
