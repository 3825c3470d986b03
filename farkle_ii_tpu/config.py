"""Typed application configuration: YAML loading, validation, identity, paths.

Config-surface parity with the reference (``/root/reference/src/farkle/config.py``):
the YAML section/key names match, so a reference user's config files load
unchanged. Features preserved:

* typed dataclass sections with defaults (reference config.py:140-392);
* deep-merge YAML overlays + dotted-key expansion (:1231, :1374);
* strict unknown-key rejection with difflib suggestions (:1267-1280) and a
  retired-key migration map (:62-119);
* inline ``--set a.b=c`` overrides with type coercion (:1541-1569);
* canonical-JSON config sha plus per-stage *scoped* shas over each stage's
  declared cache-scope keys, so unrelated config edits never invalidate a
  stage (:1830-1843);
* statistical ``freshness_key`` binding all contract versions (:461-504);
* seed-suffixed results root, six canonical artifact scopes, and concrete
  path helpers (:417-426, :548-641).

TPU-native additions live under ``sim`` (device batch sizing) and ``tpu``
(mesh/runtime knobs); they default sensibly so reference configs stay valid.
"""

from __future__ import annotations

import dataclasses
import difflib
import hashlib
import json
from dataclasses import dataclass, field, fields
from pathlib import Path
from typing import Any, Mapping

import yaml

CONFIG_SHA_VERSION = 1

# Canonical artifact scopes (reference config.py:45 ArtifactScope)
ARTIFACT_SCOPES = ("by_k", "concat_ks", "across_k", "cross_seed", "diagnostics", "h2h_2p")

# Retired keys -> migration guidance (reference config.py:62-119 parity)
RETIRED_CONFIG_KEYS: dict[str, str] = {
    "sim.num_shuffles": "workload is resolved from screening.resolution_delta",
    "sim.n_games": "workload is resolved from screening.resolution_delta",
    "sim.power_method": "replaced by screening.resolution_delta",
    "sim.recompute_num_shuffles": "replaced by screening.resolution_delta",
    "sim.power_design": "replaced by screening and head2head settings",
    "sim.n_players": "replaced by sim.n_players_list",
    "sim.collect_metrics": "replaced by sim.expanded_metrics",
    "sim.seed_pair": "replaced by sim.seed_list",
    "analysis.trueskill_beta": "moved to trueskill.beta",
    "analysis.tier_z_star": "replaced by screening bootstrap summaries",
    "analysis.tier_min_gap": "replaced by screening.practical_delta_by_k",
    "analysis.frequentist_weights_by_k": "replaced by k_aggregation.k_weights",
    "analysis.meta_random_if_I2_gt": "replaced by cross-seed stability diagnostics",
    "analysis.meta_max_other_seeds": "replaced by sim.seed_list",
    "analysis.meta_comparison_seed": "replaced by sim.seed_list",
    "analysis.pooling_weights": "moved to k_aggregation.method",
    "analysis.pooling_weights_by_k": "moved to k_aggregation.k_weights",
    "trueskill.pooled_weights_by_k": "replaced by canonical root/k TrueSkill ratings",
    "analysis.k_aggregation_method": "moved to k_aggregation.method",
    "analysis.k_weights": "moved to k_aggregation.k_weights",
    "analysis.agreement_include_combined": "replaced by selection-conditioned agreement",
    "analysis.agreement_include_across_k": "replaced by selection-conditioned agreement",
    "analysis.agreement_strategies": "replaced by the frozen H2H candidate family",
    "head2head.fdr_q": "replaced by head2head.family_alpha",
    "head2head.bonferroni_total_games_safeguard": "replaced by head2head.total_game_cap",
    "head2head.bonferroni_design": "replaced by typed head2head settings",
    "head2head.games_per_pair": "replaced by head2head target power and practical effect",
    "head2head.tie_break_policy": "replaced by dominance front display rules",
    "head2head.tie_break_seed": "replaced by stable strategy-id display ordering",
    "head2head.use_tier_elites": "replaced by the frozen canonical candidate family",
    "io.analysis_dir": "renamed to io.analysis_subdir",
    "io.results_dir": "renamed to io.results_dir_prefix",
    "io.append_seed": "results root is always seed-suffixed",
    "io.meta_analysis_dir": "replaced by canonical cross_seed artifacts under the pair root",
    "io.interseed_input_dir": "replaced by explicit root-pair run context",
    "io.interseed_input_layout": "replaced by the canonical root stage layout",
}
RETIRED_CONFIG_KEYS.update(
    {
        f"analysis.{key}": "replaced by stage preconditions and canonical orchestration"
        for key in (
            "run_interseed",
            "disable_game_stats",
            "disable_trueskill",
            "disable_head2head",
            "disable_hgb",
            "disable_frequentist",
            "disable_agreement",
            "run_trueskill",
            "run_head2head",
            "run_rng",
            "run_game_stats",
            "run_hgb",
            "run_frequentist",
            "run_post_h2h_analysis",
            "run_agreement",
            "run_report",
        )
    }
)

# per-command expected root-seed-list lengths (reference config.py:125-136)
SEED_LIST_LENGTHS_BY_COMMAND: dict[str, int] = {
    "run": 1,
    "analyze": 1,
    "two-seed-pipeline": 2,
}


def expected_seed_list_length(command: str) -> int | None:
    """Expected root-list length for a CLI command (None = unconstrained)."""
    return SEED_LIST_LENGTHS_BY_COMMAND.get(command)


# ─────────────────────────────────────────────────────────────────────────────
# Sections
# ─────────────────────────────────────────────────────────────────────────────


@dataclass
class IOConfig:
    results_dir_prefix: str = "results"
    analysis_subdir: str = "analysis"


@dataclass
class RNGConfig:
    scheme_version: int = 2
    # accepted for reference-config compatibility; this framework's streams
    # are counter-based threefry2x32 regardless (see ops/rng.py)
    bit_generator: str = "threefry2x32"


@dataclass
class ScreeningConfig:
    resolution_delta: float = 0.03
    interval_confidence: float = 0.95
    practical_delta_by_k: dict[int, float] = field(default_factory=dict)
    delta_across_k: float = 0.03
    bootstrap_replicates: int = 2000
    candidate_contribution_size: int = 75
    controls: list[int] = field(default_factory=list)
    mandatory_diagnostics: list[int] = field(default_factory=list)
    max_shuffles_per_root_k: int | None = None
    projected_games_per_second: float | None = None


@dataclass
class BatchingConfig:
    target_batches: int = 100
    min_shuffles_per_batch: int = 30


@dataclass
class RobustnessConfig:
    report_pareto: bool = True
    report_maximin: bool = True
    delta_seed_stability: float = 0.03
    joint_discrepancy_alpha: float = 0.05
    matched_count_fractions: list[float] = field(
        default_factory=lambda: [0.25, 0.50, 0.75, 1.0]
    )


@dataclass
class ArtifactContractConfig:
    artifact_contract_version: int = 2
    estimand_version: int = 1
    schema_version: int = 1


@dataclass
class KAggregationConfig:
    method: str = "equal-k"
    k_weights: dict[int, float] | None = None


@dataclass
class SimConfig:
    n_players_list: list[int] = field(default_factory=lambda: [5])
    seed: int = 0
    seed_list: list[int] | None = field(default_factory=lambda: [0])
    expanded_metrics: bool = False
    row_dir: str | None = None
    per_n: dict[str, Any] = field(default_factory=dict)
    # run this many (root, k) cells concurrently on host threads: overlaps
    # per-cell fixed costs (tracing, executable loads) with device work;
    # results are bit-identical by construction
    cell_concurrency: int = 1
    # parquet row-shard writer threads (row-export path only): each batch id
    # pins to one worker, preserving the per-batch "rows before block npz"
    # resume invariant; ~120k games/s per writer measured, so the default
    # keeps the writers off the row path's critical path
    row_writer_threads: int = 4
    n_jobs: int | None = None
    mp_start_method: str | None = None
    desired_sec_per_chunk: int = 10
    ckpt_every_sec: int = 30
    score_thresholds: list[int] | None = None
    dice_thresholds: list[int] | None = None
    smart_five_opts: list[bool] | None = None
    smart_one_opts: list[bool] | None = None
    consider_score_opts: list[bool] | None = field(default_factory=lambda: [True, False])
    consider_dice_opts: list[bool] | None = field(default_factory=lambda: [True, False])
    auto_hot_dice_opts: list[bool] | None = field(default_factory=lambda: [True, False])
    run_up_score_opts: list[bool] | None = field(default_factory=lambda: [True, False])
    include_stop_at: bool = False
    include_stop_at_heuristic: bool = False
    progress_logging: dict[str, Any] = field(default_factory=dict)
    # TPU-native additions (ignored by nothing; defaults match device limits)
    shuffles_per_device_batch: int = 64
    # publish per-batch unconditional sufficient statistics during row export
    # (the metrics stage then resolves COMPLETE_VALID and skips its row scan)
    emit_batch_metrics: bool = True


@dataclass
class AnalysisConfig:
    n_jobs: int = 1
    mp_start_method: str | None = None
    log_level: str = "INFO"
    results_glob: str = "*_players"
    outputs: dict[str, Any] = field(default_factory=dict)
    progress_logging: dict[str, Any] = field(default_factory=dict)
    run_rng_diagnostics: bool = True
    rng_lags: list[int] = field(default_factory=lambda: [1, 2, 3, 5, 10])
    rng_max_matchup_groups: int = 2000
    margin_thresholds: list[int] = field(default_factory=lambda: [50, 100, 250])
    rare_event_target: int = 10_000
    rare_event_margin_quantile: float = 0.001
    rare_event_target_rate: float = 1e-4
    rare_event_detail: bool = False


@dataclass
class IngestConfig:
    row_group_size: int = 64000
    parquet_codec: str = "snappy"
    batch_rows: int = 100000
    n_jobs: int = 1


@dataclass
class CombineConfig:
    max_players: int = 12


@dataclass
class TrueSkillConfig:
    beta: float = 25.0
    tau: float = 0.1
    draw_probability: float = 0.0


@dataclass
class Head2HeadConfig:
    n_jobs: int = 4
    family_alpha: float = 0.02
    target_power: float = 0.80
    practical_delta: float = 0.03
    sensitivity_deltas: list[float] = field(default_factory=lambda: [0.03, 0.04])
    seat1_advantage_scenarios: list[float] = field(
        default_factory=lambda: [0.0, 0.03, 0.06]
    )
    delta_equivalence: float | None = None
    candidate_cap: int | None = None
    candidate_cap_policy: str = "balanced-tail"
    min_candidate_completion_rate: float = 0.99
    max_attempt_multiplier: float = 2.0
    total_game_cap: int = 100_000_000
    allow_single_root: bool = True


@dataclass
class HGBConfig:
    max_depth: int = 6
    n_estimators: int = 300
    heldout_folds: int = 5
    permutation_repeats: int = 10
    future_proposal_limit: int = 100


@dataclass
class OrchestrationConfig:
    parallel_seeds: bool = False


@dataclass
class TPUConfig:
    """TPU-native runtime knobs (no reference equivalent)."""

    mesh_devices: int | None = None  # None = all available
    aot_cache: bool = True
    donate_state: bool = True
    profile_dir: str | None = None  # jax.profiler trace output for one cell run
    # straggler compaction inside the game kernel: ~2-3x faster on long-tail
    # games, but some irregular batch shapes have triggered hard TPU-runtime
    # faults in the partition/gather path; disable for affected workloads.
    # True means *allowed*: with a probed fault envelope the runner picks the
    # measured-fastest (chunk, compaction) shape per k, which may be a larger
    # compaction-off chunk where the compacted shape faults. False forces off.
    straggler_compaction: bool = True
    # deserialize the next cell's executables on a background thread while
    # the current cell executes. Off by default on remote-tunneled backends:
    # measured NET-NEGATIVE there (the deserialize/trace storm contended
    # with the first cell's execution, mega warm 275 s vs 175 s); candidates
    # for locally attached chips where deserialization is cheap
    prewarm_executables: bool = False
    # compacted batches are padded to a multiple of this (fault-safe shapes);
    # probe with scripts/probe_fault_envelope.py before changing
    compact_pad_multiple: int = 4096
    # cap on games per H2H execution dispatch (fault envelope + XLA
    # constant-folding guard); 0 = auto: the fastest probed-fault-free batch
    # from fault_envelope_path (conservative 16384 when never probed)
    h2h_games_per_dispatch: int = 0
    # optional probed-envelope artifact (scripts/probe_fault_envelope.py
    # output) recording which (k, chunk, compaction) shapes are fault-free
    fault_envelope_path: str | None = None
    # straggler-compaction thresholds (active < B/ratio triggers a re-gather)
    # and roll-steps between while-condition checks; tuned empirically with
    # scripts/sweep_kernel_variants.py — execution-only knobs, can never
    # change results
    compact_ratios: list[int] = field(default_factory=lambda: [8, 64, 512])
    cond_check_every: int = 8
    # recovery blocks played per device dispatch (aggregate-only path). The
    # roll-step is latency-bound on its dependency chain, so one block is
    # far too small a batch to fill the pipeline (results/step_cost_k2.json);
    # grouping m blocks into one play batch with per-block exact aggregation
    # multiplies throughput. None = auto from the probed fault envelope's
    # block-group speeds; 1 = per-block dispatch (round-2 behavior).
    blocks_per_dispatch: int | None = None
    # game-kernel implementation: "xla" = the while-loop kernel with
    # straggler compaction (ops/game_kernel.play_games), "pallas" = the
    # gridded VMEM-resident mega-kernel (ops/pallas_kernel, tile-granular
    # straggler isolation, no compaction fault surface), "auto" = per-k
    # measured choice (pallas wins from k >= 5 on production-size
    # batches; 1.5-1.8x at k >= 10 — runner.PALLAS_MIN_K). Execution-only: the kernels are bit-identical
    # (tests/unit/test_pallas_kernel.py proves it on-device and interpreted).
    game_impl: str = "auto"
    # pallas grid tile height in 128-lane rows; 16 is the measured sweet
    # spot (results/impl_race.json); large k needs <= 16 to fit VMEM
    pallas_tile_rows: int = 16


@dataclass
class AppConfig:
    io: IOConfig = field(default_factory=IOConfig)
    sim: SimConfig = field(default_factory=SimConfig)
    analysis: AnalysisConfig = field(default_factory=AnalysisConfig)
    ingest: IngestConfig = field(default_factory=IngestConfig)
    combine: CombineConfig = field(default_factory=CombineConfig)
    trueskill: TrueSkillConfig = field(default_factory=TrueSkillConfig)
    head2head: Head2HeadConfig = field(default_factory=Head2HeadConfig)
    hgb: HGBConfig = field(default_factory=HGBConfig)
    rng: RNGConfig = field(default_factory=RNGConfig)
    screening: ScreeningConfig = field(default_factory=ScreeningConfig)
    batching: BatchingConfig = field(default_factory=BatchingConfig)
    robustness: RobustnessConfig = field(default_factory=RobustnessConfig)
    artifact_contract: ArtifactContractConfig = field(default_factory=ArtifactContractConfig)
    k_aggregation: KAggregationConfig = field(default_factory=KAggregationConfig)
    orchestration: OrchestrationConfig = field(default_factory=OrchestrationConfig)
    tpu: TPUConfig = field(default_factory=TPUConfig)
    data_dir: str = "data"
    config_sha: str | None = field(default=None, init=False, repr=False, compare=False)
    # runtime context only (orchestration redirects); never part of config
    # identity — excluded from to_dict/sha
    results_root_override: str | None = field(
        default=None, init=False, repr=False, compare=False
    )

    def validate_statistical_contract(self, *, require_two_roots: bool = False) -> None:
        """Validate locked production settings before expensive work is scheduled.

        Reference parity: ``config.py:1694 _validate_statistical_contract``,
        adapted to this framework's RNG family (counter-based threefry2x32
        instead of PCG64DXSM — the addressability contract, not the bit
        generator, is what is locked).
        """
        _validate_statistical_contract(self, require_two_roots=require_two_roots)

    # ── Paths ────────────────────────────────────────────────────────────
    @property
    def results_root(self) -> Path:
        """Seed-suffixed results root (reference config.py:417-426)."""
        if self.results_root_override is not None:
            return Path(self.results_root_override)
        base = Path(self.io.results_dir_prefix)
        if not base.is_absolute():
            base = Path(self.data_dir) / base
        suffix = f"_seed_{self.sim.seed}"
        if base.name.endswith(suffix):
            return base
        return base.parent / f"{base.name}{suffix}"

    @property
    def analysis_dir(self) -> Path:
        return self.results_root / self.io.analysis_subdir

    def scope_dir(self, scope: str) -> Path:
        """Directory for one of the six canonical artifact scopes."""
        if scope not in ARTIFACT_SCOPES:
            raise ValueError(f"unknown artifact scope: {scope!r} (not in {ARTIFACT_SCOPES})")
        return self.analysis_dir / scope

    def n_players_dir(self, n: int) -> Path:
        return self.results_root / f"{n}_players"

    def rows_dir(self, n: int) -> Path:
        if self.sim.row_dir is None:
            raise ValueError("sim.row_dir is null: row writing is disabled")
        return self.n_players_dir(n) / self.sim.row_dir

    def checkpoint_path(self, n: int) -> Path:
        return self.n_players_dir(n) / f"{n}p_checkpoint.parquet"

    def metrics_path(self, n: int) -> Path:
        return self.n_players_dir(n) / f"{n}p_metrics.parquet"

    def workload_plan_path(self) -> Path:
        return self.results_root / "simulation_workload_plan.json"

    def strategy_manifest_path(self) -> Path:
        return self.results_root / "strategy_manifest.parquet"

    def simulation_done_path(self) -> Path:
        return self.results_root / "simulation.done.json"

    def sim_checkpoint_state_path(self, n: int) -> Path:
        return self.n_players_dir(n) / f"{n}p_sim_state.json"

    def manifest_path(self) -> Path:
        return self.results_root / "manifest.ndjson"

    def ingested_rows_raw(self, n: int) -> Path:
        return self.scope_dir("by_k") / f"{n}p" / f"{n}p_ingested_rows.raw.parquet"

    def curated_rows_path(self, n: int) -> Path:
        return self.scope_dir("by_k") / f"{n}p" / f"{n}p_rows.parquet"

    def combined_rows_path(self) -> Path:
        return self.scope_dir("concat_ks") / "all_ingested_rows.parquet"

    def batch_metrics_path(self, n: int) -> Path:
        return self.scope_dir("by_k") / f"{n}p" / f"{n}p_batch_metrics.parquet"

    def performance_dir(self) -> Path:
        return self.scope_dir("across_k") / "performance"

    def performance_by_k_path(self, k: int) -> Path:
        return self.performance_dir() / f"performance_by_k_{k}p.parquet"

    def performance_across_k_path(self) -> Path:
        return self.performance_dir() / "performance_across_k.parquet"

    def performance_bootstrap_path(self) -> Path:
        return self.performance_dir() / "performance_bootstrap.parquet"

    def performance_control_contrasts_path(self) -> Path:
        return self.performance_dir() / "performance_control_contrasts.parquet"

    def performance_player_count_effects_path(self) -> Path:
        return self.performance_dir() / "performance_player_count_effects.parquet"

    def seat_analysis_dir(self) -> Path:
        return self.scope_dir("across_k") / "seat_analysis"

    def seat_batch_counts_path(self, k: int) -> Path:
        return self.scope_dir("by_k") / f"{k}p" / f"{k}p_seat_batch_counts.parquet"

    def seat_effects_by_k_path(self, k: int) -> Path:
        return self.scope_dir("by_k") / f"{k}p" / f"{k}p_seat_effects.parquet"

    def seat_population_by_k_path(self, k: int) -> Path:
        return self.scope_dir("by_k") / f"{k}p" / f"{k}p_seat_population_effects.parquet"

    def seat_standardized_across_k_path(self) -> Path:
        return self.seat_analysis_dir() / "seat_standardized_across_k.parquet"

    def seat_exposure_mixture_diagnostic_path(self) -> Path:
        return self.scope_dir("diagnostics") / "seat_exposure_mixture.parquet"

    def seat_selfplay_diagnostic_path(self) -> Path:
        return self.scope_dir("diagnostics") / "seat_selfplay_p1.parquet"

    def seat_mirrored_diagnostic_path(self) -> Path:
        return self.scope_dir("diagnostics") / "seat_mirrored_games.parquet"

    def trueskill_dir(self) -> Path:
        return self.scope_dir("by_k") / "trueskill"

    def screening_path(self) -> Path:
        return self.scope_dir("across_k") / "screening.parquet"

    def h2h_dir(self) -> Path:
        return self.scope_dir("h2h_2p")

    # ── Identity ─────────────────────────────────────────────────────────
    def to_dict(self) -> dict[str, Any]:
        out: dict[str, Any] = {}
        for f_ in fields(self):
            if f_.name in ("config_sha", "results_root_override"):
                continue
            value = getattr(self, f_.name)
            out[f_.name] = dataclasses.asdict(value) if dataclasses.is_dataclass(value) else value
        return out

    def freshness_key(self) -> dict[str, Any]:
        """Statistical contract fingerprint (reference config.py:461-504)."""
        return {
            "rng_scheme_version": self.rng.scheme_version,
            "artifact_contract_version": self.artifact_contract.artifact_contract_version,
            "estimand_version": self.artifact_contract.estimand_version,
            "schema_version": self.artifact_contract.schema_version,
            "chance_rate_by_k": {int(k): 1.0 / int(k) for k in self.sim.n_players_list},
            "k_support": sorted(int(k) for k in self.sim.n_players_list),
            "k_aggregation_method": self.k_aggregation.method,
            "k_weights": self.k_aggregation.k_weights,
            "resolution_delta": self.screening.resolution_delta,
            "interval_confidence": self.screening.interval_confidence,
            "practical_delta_by_k": {
                int(k): v for k, v in self.screening.practical_delta_by_k.items()
            },
            "delta_across_k": self.screening.delta_across_k,
            "multiplicity": "holm_h2h",
            "conditioning": "unconditional_default",
        }


# ─────────────────────────────────────────────────────────────────────────────
# Loading / merging / validation
# ─────────────────────────────────────────────────────────────────────────────


class ConfigKeyError(ValueError):
    """Unknown or retired configuration key."""


def _deep_merge(base: dict, overlay: Mapping) -> dict:
    out = dict(base)
    for key, value in overlay.items():
        if key in out and isinstance(out[key], dict) and isinstance(value, Mapping):
            out[key] = _deep_merge(out[key], value)
        else:
            out[key] = value
    return out


_SECTION_TYPES: dict[str, type] = {
    f.name: f.default_factory  # type: ignore[misc]
    for f in fields(AppConfig)
    if f.name not in ("config_sha", "data_dir", "results_root_override")
}


def _validate_section_keys(section_name: str, section_type: type, data: Mapping) -> None:
    valid = {f.name for f in fields(section_type)}
    for key in data:
        dotted = f"{section_name}.{key}"
        if dotted in RETIRED_CONFIG_KEYS:
            raise ConfigKeyError(
                f"retired config key {dotted!r}: {RETIRED_CONFIG_KEYS[dotted]}"
            )
        if key not in valid:
            suggestion = difflib.get_close_matches(key, valid, n=1)
            hint = f"; did you mean {suggestion[0]!r}?" if suggestion else ""
            raise ConfigKeyError(f"unknown config key {dotted!r}{hint}")


def _coerce_section(section_type: type, data: Mapping) -> Any:
    kwargs = {}
    for f_ in fields(section_type):
        if f_.name in data:
            kwargs[f_.name] = data[f_.name]
    return section_type(**kwargs)


def config_from_dict(data: Mapping[str, Any]) -> AppConfig:
    """Build a validated AppConfig from a (merged) plain dict."""
    data = expand_dotted_keys(data)
    valid_sections = set(_SECTION_TYPES) | {"data_dir"}
    for key in data:
        if key not in valid_sections:
            suggestion = difflib.get_close_matches(key, valid_sections, n=1)
            hint = f"; did you mean {suggestion[0]!r}?" if suggestion else ""
            raise ConfigKeyError(f"unknown config section {key!r}{hint}")
    kwargs: dict[str, Any] = {}
    for name, section_type in _SECTION_TYPES.items():
        section_data = data.get(name, {})
        if not isinstance(section_data, Mapping):
            raise ConfigKeyError(f"config section {name!r} must be a mapping")
        _validate_section_keys(name, section_type, section_data)
        kwargs[name] = _coerce_section(section_type, section_data)
    cfg = AppConfig(**kwargs)
    if "data_dir" in data:
        cfg.data_dir = str(data["data_dir"])
    # normalize int-keyed mappings parsed from YAML strings
    cfg.screening.practical_delta_by_k = {
        int(k): float(v) for k, v in cfg.screening.practical_delta_by_k.items()
    }
    return cfg


def expand_dotted_keys(data: Mapping[str, Any]) -> dict[str, Any]:
    """Expand ``{"sim.seed": 7}`` into ``{"sim": {"seed": 7}}`` recursively.

    Reference parity: ``utils/yaml_helpers.py:12`` — YAML presets may use
    dotted keys as shorthand for nested sections.
    """
    out: dict[str, Any] = {}
    for key, value in data.items():
        if isinstance(value, Mapping):
            value = expand_dotted_keys(value)
        node = out
        parts = str(key).split(".")
        for part in parts[:-1]:
            nxt = node.setdefault(part, {})
            if not isinstance(nxt, dict):
                raise ConfigKeyError(
                    f"dotted key {key!r} collides with scalar at {part!r}"
                )
            node = nxt
        if isinstance(value, dict) and isinstance(node.get(parts[-1]), dict):
            node[parts[-1]] = _deep_merge(node[parts[-1]], value)
        else:
            node[parts[-1]] = value
    return out


def load_app_config(
    path: str | Path | None = None,
    *,
    overlays: list[Mapping[str, Any]] | None = None,
) -> AppConfig:
    """Load config YAML (deep-merged with overlays) into a validated AppConfig."""
    merged: dict[str, Any] = {}
    if path is not None:
        raw = yaml.safe_load(Path(path).read_text(encoding="utf-8")) or {}
        if not isinstance(raw, dict):
            raise ConfigKeyError(f"config file {path} must contain a mapping")
        merged = _deep_merge(merged, expand_dotted_keys(raw))
    for overlay in overlays or []:
        merged = _deep_merge(merged, expand_dotted_keys(overlay))
    return config_from_dict(merged)


def _coerce_value(text: str) -> Any:
    """Type-coerce a --set value: YAML-style scalars and flow collections."""
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def apply_dot_overrides(cfg: AppConfig, overrides: list[str]) -> AppConfig:
    """Apply ``a.b=c`` overrides onto an existing config, re-validating."""
    data = cfg.to_dict()
    for item in overrides:
        if "=" not in item:
            raise ConfigKeyError(f"override {item!r} must look like section.key=value")
        dotted, text = item.split("=", 1)
        patch = expand_dotted_keys({dotted.strip(): _coerce_value(text.strip())})
        data = _deep_merge(data, patch)
    return config_from_dict(data)


# ─────────────────────────────────────────────────────────────────────────────
# Hashing
# ─────────────────────────────────────────────────────────────────────────────


def _canonical(payload: Any) -> str:
    return json.dumps(payload, sort_keys=True, separators=(",", ":"), default=str)


def compute_config_sha(cfg: AppConfig) -> str:
    """Canonical-JSON sha over the full config."""
    return hashlib.sha256(
        f"v{CONFIG_SHA_VERSION}\x00{_canonical(cfg.to_dict())}".encode()
    ).hexdigest()


# cache-scope keys per stage: which config sections feed each stage's identity
STAGE_CACHE_SCOPES: dict[str, tuple[str, ...]] = {
    "simulation": ("sim", "rng", "screening", "batching", "artifact_contract"),
    "ingest": ("sim", "rng", "ingest", "artifact_contract"),
    "curate": ("ingest", "artifact_contract"),
    "combine": ("combine", "artifact_contract"),
    "metrics": ("sim", "screening", "k_aggregation", "artifact_contract"),
    "game_stats": ("analysis", "artifact_contract"),
    "rng_diagnostics": ("analysis", "rng", "artifact_contract"),
    "trueskill": ("trueskill", "artifact_contract"),
    "pair_trueskill": ("trueskill", "artifact_contract"),
    "hgb": ("hgb", "artifact_contract"),
    "screening": ("screening", "k_aggregation", "artifact_contract"),
    "root_stability": ("robustness", "screening", "artifact_contract"),
    "candidate_freeze": ("screening", "head2head", "artifact_contract"),
    "h2h_power": ("head2head", "artifact_contract"),
    "h2h_execute": ("head2head", "rng", "artifact_contract"),
    "h2h_inference": ("head2head", "artifact_contract"),
    "h2h_digest": ("head2head", "artifact_contract"),
    "dominance": ("head2head", "artifact_contract"),
    "agreement": ("screening", "head2head", "artifact_contract"),
    "reporting": ("artifact_contract",),
}


# execution-only knobs: they control device chunking/dispatch, never results
# (game RNG streams are coordinate-addressed, so chunk boundaries cannot
# change any outcome), and therefore must not invalidate stage caches
EXECUTION_ONLY_KEYS: dict[str, frozenset[str]] = {
    "sim": frozenset({"shuffles_per_device_batch"}),
}


def compute_stage_config_sha(cfg: AppConfig, stage_key: str) -> str:
    """Sha over only the stage's cache-scope sections (reference :1843)."""
    scope = STAGE_CACHE_SCOPES.get(stage_key)
    if scope is None:
        raise KeyError(f"stage {stage_key!r} has no declared cache scope")
    full = cfg.to_dict()
    scoped = {
        name: {
            key: value
            for key, value in full[name].items()
            if key not in EXECUTION_ONLY_KEYS.get(name, frozenset())
        }
        for name in scope
    }
    payload = f"{stage_key}\x00v{CONFIG_SHA_VERSION}\x00{_canonical(scoped)}"
    return hashlib.sha256(payload.encode()).hexdigest()


def assign_config_sha(cfg: AppConfig) -> AppConfig:
    cfg.config_sha = compute_config_sha(cfg)
    return cfg


def _validate_statistical_contract(cfg: AppConfig, *, require_two_roots: bool) -> None:
    """Locked statistical production contract (reference config.py:1694)."""
    import math

    player_counts = [int(k) for k in cfg.sim.n_players_list]
    if not player_counts or any(k < 2 for k in player_counts):
        raise ValueError("sim.n_players_list must contain player counts >= 2")
    if len(set(player_counts)) != len(player_counts):
        raise ValueError("sim.n_players_list must not contain duplicate player counts")
    if cfg.rng.scheme_version != 2 or cfg.rng.bit_generator != "threefry2x32":
        raise ValueError("rng must use scheme_version=2 and bit_generator='threefry2x32'")
    contract_versions = dataclasses.asdict(cfg.artifact_contract)
    if any(int(v) < 1 for v in contract_versions.values()):
        raise ValueError("artifact_contract versions must all be positive integers")
    if cfg.artifact_contract.artifact_contract_version != 2:
        raise ValueError("artifact_contract.artifact_contract_version is locked at 2")
    if not 0.0 < cfg.screening.resolution_delta < 1.0:
        raise ValueError("screening.resolution_delta must be between 0 and 1")
    if cfg.screening.interval_confidence != 0.95:
        raise ValueError("screening.interval_confidence is locked at 0.95")
    if cfg.screening.bootstrap_replicates < 1:
        raise ValueError("screening.bootstrap_replicates must be positive")
    if cfg.screening.candidate_contribution_size < 1:
        raise ValueError("screening.candidate_contribution_size must be positive")
    if not cfg.robustness.report_pareto or not cfg.robustness.report_maximin:
        raise ValueError(
            "robustness must report both Pareto membership and maximin leadership"
        )
    if cfg.robustness.delta_seed_stability <= 0.0:
        raise ValueError("robustness.delta_seed_stability must be positive")
    if not 0.0 < cfg.robustness.joint_discrepancy_alpha < 1.0:
        raise ValueError("robustness.joint_discrepancy_alpha must be between 0 and 1")
    fractions = tuple(float(f) for f in cfg.robustness.matched_count_fractions)
    if (
        not fractions
        or any(not 0.0 < f <= 1.0 for f in fractions)
        or tuple(sorted(set(fractions))) != fractions
        or fractions[-1] != 1.0
    ):
        raise ValueError(
            "robustness.matched_count_fractions must be unique increasing values "
            "in (0, 1] ending at 1"
        )
    cap = cfg.screening.max_shuffles_per_root_k
    if cap is not None and (isinstance(cap, bool) or not isinstance(cap, int) or cap < 1):
        raise ValueError("screening.max_shuffles_per_root_k must be positive when configured")
    gps = cfg.screening.projected_games_per_second
    if gps is not None and (not math.isfinite(gps) or gps <= 0.0):
        raise ValueError("screening.projected_games_per_second must be positive when configured")
    # Deliberate delta vs the reference (config.py:1745 pins exactly 100):
    # equal batches remain the MCSE/resampling unit, but the batch COUNT may
    # be tuned within [50, 200] so recovery blocks can align to measured-fast
    # device batch shapes (mega uses 67 blocks of 64 shuffles; 43-shuffle
    # blocks are slow and fault-prone on v5e — see results/fault_envelope.json
    # and tests/FAILURE_NOTES.md). >=50 batches keeps the deterministic-batch
    # MCSE well-conditioned; the default stays 100.
    if (
        not 50 <= cfg.batching.target_batches <= 200
        or cfg.batching.min_shuffles_per_batch < 30
    ):
        raise ValueError(
            "batching requires 50-200 equal batches with at least 30 "
            "shuffles per batch"
        )

    practical = {
        int(k): float(v) for k, v in (cfg.screening.practical_delta_by_k or {}).items()
    }
    if set(practical) != set(player_counts):
        raise ValueError(
            "screening.practical_delta_by_k keys must match sim.n_players_list"
        )
    if any(v <= 0.0 for v in practical.values()):
        raise ValueError("screening practical thresholds must be positive")
    if cfg.screening.delta_across_k is None or cfg.screening.delta_across_k <= 0.0:
        raise ValueError("screening.delta_across_k must be explicitly configured and positive")

    if cfg.k_aggregation.method not in {"equal-k", "declared-mapping"}:
        raise ValueError("k_aggregation.method must be 'equal-k' or 'declared-mapping'")
    if cfg.k_aggregation.method == "equal-k" and cfg.k_aggregation.k_weights is not None:
        raise ValueError("equal-k aggregation must not provide k_aggregation.k_weights")
    if cfg.k_aggregation.method == "declared-mapping":
        weights = cfg.k_aggregation.k_weights
        if weights is None or {int(k) for k in weights} != set(player_counts):
            raise ValueError("declared-mapping weights must cover configured player counts")
        if any(float(v) <= 0.0 for v in weights.values()):
            raise ValueError("declared player-count weights must be positive")
        if abs(sum(float(v) for v in weights.values()) - 1.0) > 1e-12:
            raise ValueError("declared player-count weights must sum to 1")

    roots = cfg.sim.seed_list or [cfg.sim.seed]
    if require_two_roots and len(roots) != 2:
        raise ValueError(
            "the combined-root production workflow requires exactly two root seeds"
        )
    if len({int(seed) for seed in roots}) != len(roots):
        raise ValueError("root seeds must be distinct")

    h2h = cfg.head2head
    if not 0.0 < h2h.family_alpha < 1.0:
        raise ValueError("head2head.family_alpha must be between 0 and 1")
    if not 0.0 < h2h.target_power < 1.0:
        raise ValueError("head2head.target_power must be between 0 and 1")
    if h2h.practical_delta <= 0.0:
        raise ValueError("head2head.practical_delta must be positive")
    if h2h.delta_equivalence is not None and not 0.0 < h2h.delta_equivalence < 1.0:
        raise ValueError("head2head.delta_equivalence must be between 0 and 1 when configured")
    sensitivity = tuple(float(d) for d in h2h.sensitivity_deltas)
    if (
        not sensitivity
        or len(set(sensitivity)) != len(sensitivity)
        or any(d <= 0.0 for d in sensitivity)
        or h2h.practical_delta not in sensitivity
        or 0.04 not in sensitivity
    ):
        raise ValueError(
            "head2head.sensitivity_deltas must be unique positive values containing "
            "the practical delta and 0.04"
        )
    if tuple(float(v) for v in h2h.seat1_advantage_scenarios) != (0.0, 0.03, 0.06):
        raise ValueError("head2head.seat1_advantage_scenarios is locked to 0, 0.03, 0.06")
    if h2h.candidate_cap is not None and h2h.candidate_cap < 2:
        raise ValueError("head2head.candidate_cap must be at least 2 when configured")
    if not 0.0 < h2h.min_candidate_completion_rate <= 1.0:
        raise ValueError("head2head.min_candidate_completion_rate must be in (0, 1]")
    if not math.isfinite(h2h.max_attempt_multiplier) or h2h.max_attempt_multiplier < 1.0:
        raise ValueError("head2head.max_attempt_multiplier must be finite and at least 1")
    if h2h.total_game_cap < 1:
        raise ValueError("head2head.total_game_cap must be positive")
