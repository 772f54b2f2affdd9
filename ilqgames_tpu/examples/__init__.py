"""Example problem registry (reference: 18 example classes under
include/ilqgames/examples/, SURVEY.md §2.8). Each entry maps a name
(matching the reference exec binaries) to "module:function"; functions
have signature (dt=None, num_time_steps=None, **problem_kwargs) -> Problem."""

from __future__ import annotations

import importlib
from typing import Dict

_REGISTRY: Dict[str, str] = {
    "three_player_intersection":
        "ilqgames_tpu.examples.three_player_intersection:make_problem",
    "three_player_flat_intersection":
        "ilqgames_tpu.examples.three_player_flat_intersection:make_problem",
    "two_player_collision":
        "ilqgames_tpu.examples.two_player_collision:make_problem",
    "air_3d": "ilqgames_tpu.examples.air_3d:make_problem",
    "dubins_origin": "ilqgames_tpu.examples.dubins_origin:make_problem",
    "one_player_reachability":
        "ilqgames_tpu.examples.reachability:make_one_player",
    "two_player_reachability":
        "ilqgames_tpu.examples.reachability:make_two_player",
    "three_player_collision_avoidance_reachability":
        "ilqgames_tpu.examples.reachability:make_three_player_collision_avoidance",
    "three_player_overtaking":
        "ilqgames_tpu.examples.three_player_overtaking:make_problem",
    "roundabout_merging":
        "ilqgames_tpu.examples.roundabout_merging:make_problem",
    "three_player_flat_overtaking":
        "ilqgames_tpu.examples.three_player_flat_overtaking:make_problem",
    "modified_three_player_intersection":
        "ilqgames_tpu.examples.modified_intersection:make_problem",
    "three_player_intersection_reachability":
        "ilqgames_tpu.examples.modified_intersection:make_reachability",
    "modified_air_3d":
        "ilqgames_tpu.examples.more_reachability:make_modified_air_3d",
    "two_player_collision_avoidance_reachability":
        "ilqgames_tpu.examples.more_reachability:make_two_player_collision_avoidance",
    "flat_roundabout_merging":
        "ilqgames_tpu.examples.flat_roundabout_merging:make_problem",
    "skeleton": "ilqgames_tpu.examples.skeleton:make_problem",
    "two_player_point_mass":
        "ilqgames_tpu.examples.two_player_point_mass:make_problem",
}


def get(name: str):
    """Return the named example's builder (lazily imported)."""
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown example '{name}'; available: {sorted(_REGISTRY)}"
        )
    module, fn = _REGISTRY[name].split(":")
    return getattr(importlib.import_module(module), fn)


def names():
    return sorted(_REGISTRY)
