"""Declarative stage registry: keys, dependencies, cache scopes, layout.

Reference parity (``/root/reference/src/farkle/analysis/stage_registry.py``):
each stage declares its key, group, dependencies, the config sections that
scope its cache identity (see ``config.STAGE_CACHE_SCOPES``), a cache-key
version, and an optional disable predicate. The numbered ``NN_key`` folder
layout and dependency validation follow the same rules.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from farkle_ii_tpu.config import STAGE_CACHE_SCOPES, AppConfig


@dataclass(frozen=True)
class StageDefinition:
    key: str
    group: str
    run: Callable[[AppConfig], None]
    depends_on: tuple[str, ...] = ()
    cache_key_version: int = 1
    disabled: Callable[[AppConfig], bool] = field(default=lambda cfg: False)


def _stage(key: str, group: str, module: str, depends_on=(), disabled=None):
    """``module`` may be ``"mod"`` (calls mod.run) or ``"mod:function"``."""
    mod_name, _, fn_name = module.partition(":")
    fn_name = fn_name or "run"

    def run(cfg: AppConfig, *, force: bool = False) -> None:
        import importlib

        mod = importlib.import_module(f"farkle_ii_tpu.analysis.{mod_name}")
        getattr(mod, fn_name)(cfg, force=force)

    return StageDefinition(
        key=key,
        group=group,
        run=run,
        depends_on=tuple(depends_on),
        disabled=disabled or (lambda cfg: False),
    )


ROOT_STAGES: tuple[StageDefinition, ...] = (
    _stage("ingest", "preprocess", "ingest"),
    _stage("curate", "preprocess", "curate", depends_on=("ingest",)),
    _stage("combine", "preprocess", "combine", depends_on=("curate",)),
    _stage("metrics", "metrics", "metrics", depends_on=("curate",)),
    _stage("game_stats", "descriptive", "game_stats", depends_on=("curate",)),
    _stage(
        "rng_diagnostics", "descriptive", "rng_diagnostics",
        depends_on=("curate",),
        disabled=lambda cfg: not cfg.analysis.run_rng_diagnostics,
    ),
    _stage("trueskill", "rating", "run_trueskill", depends_on=("curate",)),
    _stage("hgb", "exploration", "hgb", depends_on=("metrics",)),
    _stage("screening", "screening", "screening", depends_on=("metrics",)),
)

H2H_TAIL_STAGES: tuple[StageDefinition, ...] = (
    _stage(
        "candidate_freeze", "h2h", "candidate_family",
        depends_on=("metrics", "trueskill"),
    ),
    _stage("h2h_power", "h2h", "h2h_schedule:run_power", depends_on=("candidate_freeze",)),
    _stage("h2h_execute", "h2h", "h2h_schedule:run_execute", depends_on=("h2h_power",)),
    _stage("h2h_inference", "h2h", "h2h_inference", depends_on=("h2h_execute",)),
    _stage("h2h_digest", "h2h", "h2h_digest", depends_on=("h2h_inference",)),
    _stage("dominance", "h2h", "dominance", depends_on=("h2h_inference",)),
    _stage("agreement", "h2h", "structure_agreement", depends_on=("h2h_inference",)),
    _stage(
        "reporting", "h2h", "structure_reporting",
        depends_on=("dominance", "agreement"),
    ),
)


def validate_plan(stages: tuple[StageDefinition, ...]) -> None:
    """In-plan dependencies must precede their dependents.

    Dependencies absent from the plan are treated as satisfied externally
    (e.g. the pair workflow runs the H2H tail against root-stage outputs
    produced by the per-seed plans).
    """
    keys = {s.key for s in stages}
    seen: set[str] = set()
    for stage in stages:
        late = [d for d in stage.depends_on if d in keys and d not in seen]
        if late:
            raise ValueError(
                f"stage {stage.key!r} depends on {late} which do not precede it"
            )
        seen.add(stage.key)
        if stage.key not in STAGE_CACHE_SCOPES:
            raise ValueError(f"stage {stage.key!r} lacks a declared cache scope")


def stage_folder_name(index: int, key: str) -> str:
    return f"{index:02d}_{key}"


def resolve_stage_layout(stages: tuple[StageDefinition, ...]) -> dict[str, str]:
    """Numbered NN_key folder names in plan order."""
    return {s.key: stage_folder_name(i + 1, s.key) for i, s in enumerate(stages)}
