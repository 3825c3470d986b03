"""Declarative stage registry: keys, dependencies, cache scopes, layout.

Reference parity (``/root/reference/src/farkle/analysis/stage_registry.py``):
each stage declares its key, group, dependencies, the config sections that
scope its cache identity (see ``config.STAGE_CACHE_SCOPES``), a cache-key
version, and an optional disable predicate. The numbered ``NN_key`` folder
layout and dependency validation follow the same rules.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

from farkle_ii_tpu.config import STAGE_CACHE_SCOPES, AppConfig

# A stamp coordinate: (directory, stamp stage-name) as consumed by
# utils.stage_completion.resolve_stage_state.
StampCoords = tuple[Path, str]


@dataclass(frozen=True)
class StageDefinition:
    key: str
    group: str
    run: Callable[[AppConfig], None]
    depends_on: tuple[str, ...] = ()
    cache_key_version: int = 1
    disabled: Callable[[AppConfig], bool] = field(default=lambda cfg: False)
    # completion stamps the stage must leave COMPLETE_VALID; validated by
    # the StageRunner after the action runs (reference stage_runner.py:151-179)
    stamps: Callable[[AppConfig], list[StampCoords]] = field(
        default=lambda cfg: []
    )
    # config-sha scope the stage's stamps were written under (defaults to key)
    sha_scope: str | None = None


def _ks(cfg: AppConfig) -> list[int]:
    return [int(k) for k in cfg.sim.n_players_list]


def _ingest_stamps(cfg: AppConfig) -> list[StampCoords]:
    return [(cfg.ingested_rows_raw(k).parent, f"ingest_{k}p") for k in _ks(cfg)]


def _curate_stamps(cfg: AppConfig) -> list[StampCoords]:
    return [(cfg.curated_rows_path(k).parent, f"curate_{k}p") for k in _ks(cfg)]


def _combine_stamps(cfg: AppConfig) -> list[StampCoords]:
    return [(cfg.combined_rows_path().parent, "combine")]


def _metrics_stamps(cfg: AppConfig) -> list[StampCoords]:
    out = [(cfg.batch_metrics_path(k).parent, f"batch_metrics_{k}p") for k in _ks(cfg)]
    out.append((cfg.performance_dir(), "canonical_performance"))
    out.append((cfg.seat_analysis_dir(), "canonical_seat_analysis"))
    return out


def _game_stats_stamps(cfg: AppConfig) -> list[StampCoords]:
    from farkle_ii_tpu.analysis.game_stats import stats_dir

    return [(stats_dir(cfg), "game_stats")]


def _rng_stamps(cfg: AppConfig) -> list[StampCoords]:
    return [(cfg.scope_dir("diagnostics"), "rng_diagnostics")]


def _trueskill_stamps(cfg: AppConfig) -> list[StampCoords]:
    return [(cfg.trueskill_dir(), "trueskill")]


def _hgb_stamps(cfg: AppConfig) -> list[StampCoords]:
    from farkle_ii_tpu.analysis.hgb import hgb_dir

    return [(hgb_dir(cfg), "hgb")]


def _screening_stamps(cfg: AppConfig) -> list[StampCoords]:
    return [(cfg.screening_path().parent, "screening")]


def _h2h_stamp(name: str) -> Callable[[AppConfig], list[StampCoords]]:
    def stamps(cfg: AppConfig) -> list[StampCoords]:
        return [(cfg.h2h_dir(), name)]

    return stamps


def _stage(
    key: str, group: str, module: str, depends_on=(), disabled=None, stamps=None,
    sha_scope=None,
):
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
        stamps=stamps or (lambda cfg: []),
        sha_scope=sha_scope,
    )


ROOT_STAGES: tuple[StageDefinition, ...] = (
    _stage("ingest", "preprocess", "ingest", stamps=_ingest_stamps),
    _stage("curate", "preprocess", "curate", depends_on=("ingest",), stamps=_curate_stamps),
    _stage("combine", "preprocess", "combine", depends_on=("curate",), stamps=_combine_stamps),
    _stage("metrics", "metrics", "metrics", depends_on=("curate",), stamps=_metrics_stamps),
    _stage(
        "game_stats", "descriptive", "game_stats",
        depends_on=("curate",), stamps=_game_stats_stamps,
    ),
    _stage(
        "rng_diagnostics", "descriptive", "rng_diagnostics",
        depends_on=("curate",),
        disabled=lambda cfg: not cfg.analysis.run_rng_diagnostics,
        stamps=_rng_stamps,
    ),
    _stage(
        "trueskill", "rating", "run_trueskill",
        depends_on=("curate",), stamps=_trueskill_stamps,
    ),
    _stage("hgb", "exploration", "hgb", depends_on=("metrics",), stamps=_hgb_stamps),
    _stage(
        "screening", "screening", "screening",
        depends_on=("metrics",), stamps=_screening_stamps,
    ),
)

H2H_TAIL_STAGES: tuple[StageDefinition, ...] = (
    _stage(
        "candidate_freeze", "h2h", "candidate_family",
        depends_on=("metrics", "trueskill"), stamps=_h2h_stamp("candidate_freeze"),
    ),
    _stage(
        "h2h_power", "h2h", "h2h_schedule:run_power",
        depends_on=("candidate_freeze",), stamps=_h2h_stamp("h2h_power"),
    ),
    _stage(
        "h2h_execute", "h2h", "h2h_schedule:run_execute",
        depends_on=("h2h_power",), stamps=_h2h_stamp("h2h_execute"),
    ),
    _stage(
        "h2h_inference", "h2h", "h2h_inference",
        depends_on=("h2h_execute",), stamps=_h2h_stamp("h2h_inference"),
    ),
    _stage(
        "h2h_digest", "h2h", "h2h_digest",
        depends_on=("h2h_inference",), stamps=_h2h_stamp("h2h_digest"),
        sha_scope="h2h_inference",
    ),
    _stage(
        "dominance", "h2h", "dominance",
        depends_on=("h2h_inference",), stamps=_h2h_stamp("dominance"),
    ),
    _stage(
        "agreement", "h2h", "structure_agreement",
        depends_on=("h2h_inference",), stamps=_h2h_stamp("agreement"),
    ),
    _stage(
        "reporting", "h2h", "structure_reporting",
        depends_on=("dominance", "agreement"), stamps=_h2h_stamp("reporting"),
    ),
)


# Pair-scope plan head (reference analysis/__init__.py:262 root-pair plan):
# two-root stability, then a pair-scope TrueSkill *refit* over pair-combined
# curated rows, then the shared H2H tail.
PAIR_STAGES: tuple[StageDefinition, ...] = (
    _stage(
        "root_stability", "pair", "root_stability",
        stamps=lambda cfg: [(cfg.scope_dir("cross_seed"), "root_stability")],
    ),
    _stage(
        "pair_trueskill", "pair", "run_trueskill:run_root_pair",
        stamps=lambda cfg: [(cfg.trueskill_dir(), "pair_trueskill")],
    ),
)


def build_root_pair_stage_plan() -> tuple[StageDefinition, ...]:
    return PAIR_STAGES + H2H_TAIL_STAGES


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
