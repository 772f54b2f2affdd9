"""The sweep kernel's scoped-VMEM guard (ops/pallas/sweep.py).

Why this exists: at B=1024 a wide-candidate sweep variant died at RUNTIME
with a Mosaic scoped-VMEM allocation failure (117.4 MiB > 100 MiB limit,
tools/tpu_bench_b1024c.log) after minutes of compilation. The guard
models the kernel's resident footprint from (batch_block, N, xdim,
candidates) and either auto-splits the candidate chunk or fails fast
with an actionable message.
"""

import dataclasses

import pytest

from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.ops.pallas import sweep


@pytest.fixture(scope="module")
def spec():
    return make_problem().spec


def test_flagship_config_fits(spec):
    # The production config (C=8, Bb=128) must pass with >2x headroom.
    got = sweep.check_vmem(spec, C=8, Bb=128, nS=8, nC=8)
    assert got < sweep._VMEM_RESIDENT_BUDGET / 2


def test_wide_candidate_launch_rejected(spec):
    # A single launch at the recorded-OOM scale (very wide candidate
    # block with trajectory emission) must be rejected up front.
    with pytest.raises(ValueError, match="VMEM"):
        sweep.check_vmem(spec, C=104, Bb=512, nS=8, nC=8,
                         emit_traj=True)


def test_autosplit_shrinks_chunk(spec):
    # Trajectory-emitting sweeps (rollout_candidates) pay ~1 MiB/lane-
    # block per candidate; at Bb=512 the fitter must shrink the chunk
    # below the requested cap rather than launching into an OOM.
    cc = sweep._fit_cand_chunk(spec, C=104, Bb=512, nS=8, nC=8, cap=8,
                               emit_traj=True)
    assert cc < 8
    # And the chunk it picks actually fits.
    sweep.check_vmem(spec, C=cc, Bb=512, nS=8, nC=8, emit_traj=True)


def test_autosplit_raises_when_nothing_fits(spec):
    huge = dataclasses.replace(
        spec, xdims=(400, 400, 400), num_time_steps=400)
    with pytest.raises(ValueError, match="batch_block"):
        sweep._fit_cand_chunk(huge, C=8, Bb=1024, nS=8, nC=8, cap=8)


def test_model_matches_run_specs(spec):
    # The byte model must track the BlockSpecs in sweep._run: a merit
    # sweep through the public API still works (interpret mode) — i.e.
    # the guard neither miscounts nor rejects valid production shapes.
    import jax.numpy as jnp
    import numpy as np

    from ilqgames_tpu.costs import player_cost as pcost
    from ilqgames_tpu.types import OperatingPoint, Strategy

    problem = make_problem(num_time_steps=10)
    sp = problem.spec
    Bt = 8
    x0 = jnp.tile(jnp.asarray(problem.x0)[None], (Bt, 1))
    op = OperatingPoint.zeros(sp)
    op = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (Bt,) + a.shape), op)
    st = Strategy.zeros(sp)
    st = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (Bt,) + a.shape), st)
    al = jax.vmap(
        lambda _: pcost.ALState.init(problem.player_costs, sp)
    )(jnp.arange(Bt))
    gate = jnp.ones((Bt, sp.num_time_steps, sp.num_players), jnp.float32)
    merits = sweep.sweep_merits_pallas(
        problem.dynamics, problem.player_costs, sp, x0, op, st,
        jnp.asarray([0.5, 0.25], jnp.float32), al, gate,
        batch_block=8, interpret=True)
    assert merits.shape == (Bt, 2)
    assert bool(np.all(np.isfinite(np.asarray(merits))))


import jax  # noqa: E402  (used inside test_model_matches_run_specs)
