"""Example problem registry (reference: 18 example classes under
include/ilqgames/examples/, SURVEY.md §2.8). Each module exposes
`make_problem(dt=None, num_time_steps=None) -> Problem`; this registry
maps names (matching the reference exec binaries) to builders."""

from __future__ import annotations

import importlib
from typing import Callable, Dict

# name -> module path; modules are imported lazily so one bad example
# doesn't break the package, and import cost stays proportional to use.
_REGISTRY: Dict[str, str] = {
    "three_player_intersection": "ilqgames_tpu.examples.three_player_intersection",
    "three_player_flat_intersection": "ilqgames_tpu.examples.three_player_flat_intersection",
    "two_player_collision": "ilqgames_tpu.examples.two_player_collision",
}


def get(name: str):
    """Build the named example problem with default discretization."""
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown example '{name}'; available: {sorted(_REGISTRY)}"
        )
    module = importlib.import_module(_REGISTRY[name])
    return module.make_problem


def names():
    return sorted(_REGISTRY)
