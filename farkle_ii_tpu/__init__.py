"""Farkle II TPU: TPU-native Monte-Carlo tournament + statistical pipeline.

Lazy top-level exports (reference ``src/farkle/__init__.py:78-98`` pattern):
importing the package stays cheap; submodules load on attribute access.
"""

from __future__ import annotations

import importlib
from typing import Any

__version__ = "0.1.0"

_LAZY_EXPORTS: dict[str, tuple[str, str]] = {
    "AppConfig": ("farkle_ii_tpu.config", "AppConfig"),
    "load_app_config": ("farkle_ii_tpu.config", "load_app_config"),
    "apply_dot_overrides": ("farkle_ii_tpu.config", "apply_dot_overrides"),
    "ThresholdStrategy": ("farkle_ii_tpu.simulation.strategies", "ThresholdStrategy"),
    "build_strategy_grid": ("farkle_ii_tpu.simulation.strategies", "build_strategy_grid"),
    "parse_strategy": ("farkle_ii_tpu.simulation.strategies", "parse_strategy"),
    "TournamentSpec": ("farkle_ii_tpu.simulation.tournament", "TournamentSpec"),
    "play_and_aggregate": ("farkle_ii_tpu.simulation.tournament", "play_and_aggregate"),
    "run_simulation": ("farkle_ii_tpu.simulation.runner", "run_simulation"),
    "simulate_many_games": ("farkle_ii_tpu.simulation.simulation", "simulate_many_games"),
    "play_games": ("farkle_ii_tpu.ops.game_kernel", "play_games"),
    "RandomPurpose": ("farkle_ii_tpu.ops.rng", "RandomPurpose"),
    "coordinate_key": ("farkle_ii_tpu.ops.rng", "coordinate_key"),
    "run_all": ("farkle_ii_tpu.analysis.stage_runner", "run_all"),
    "run_pipeline": ("farkle_ii_tpu.orchestration.two_seed_pipeline", "run_pipeline"),
}

__all__ = sorted(_LAZY_EXPORTS) + ["__version__"]


def __getattr__(name: str) -> Any:
    try:
        module_name, attr = _LAZY_EXPORTS[name]
    except KeyError as exc:
        raise AttributeError(f"module 'farkle_ii_tpu' has no attribute {name!r}") from exc
    return getattr(importlib.import_module(module_name), attr)


def __dir__() -> list[str]:
    return __all__
