"""Canonical seat-effect analysis and clearly-labelled secondary diagnostics.

Parity targets (``/root/reference/src/farkle/analysis/seat_analysis.py``):

* per-(root, k, batch, strategy, seat) outcome counts (``:190``);
* within-k strategy and population seat effects vs the 1/k chance baseline
  (``:260``), with attempted-exposure conservation checks;
* common-support cross-k standardization under declared weights plus the
  exposure-mixture diagnostic (``:327``);
* self-play first-seat diagnostic and k=2 mirrored-game pairing (``:440``) —
  forward/reverse orientations of the same unordered pair are matched in
  deterministic stream order within a batch.

The reference streams per-row Python; everything here is vectorized pandas.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

from farkle_ii_tpu.config import AppConfig, compute_stage_config_sha
from farkle_ii_tpu.utils.artifacts import (
    read_parquet_artifact,
    write_parquet_artifact_atomic,
)
from farkle_ii_tpu.utils.stage_completion import (
    StageState,
    resolve_stage_state,
    write_stage_done,
)

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class SeatAnalysisArtifacts:
    batch_counts: tuple[Path, ...]
    by_k: tuple[Path, ...]
    population_by_k: tuple[Path, ...]
    standardized_across_k: Path
    exposure_mixture_diagnostic: Path
    selfplay_diagnostic: Path
    mirrored_diagnostic: Path

    @property
    def all_paths(self) -> tuple[Path, ...]:
        return (
            *self.batch_counts,
            *self.by_k,
            *self.population_by_k,
            self.standardized_across_k,
            self.exposure_mixture_diagnostic,
            self.selfplay_diagnostic,
            self.mirrored_diagnostic,
        )


def build_seat_batch_counts(rows: pd.DataFrame, k: int) -> pd.DataFrame:
    """Aggregate per-(root, k, batch, strategy, seat) outcome counts."""
    completed = (rows["termination_status"] == "completed").to_numpy()
    parts = []
    for seat in range(1, k + 1):
        parts.append(
            pd.DataFrame(
                {
                    "root_seed": rows["root_seed"].to_numpy(),
                    "k": rows["k"].to_numpy(),
                    "deterministic_batch_id": rows["deterministic_batch_id"].to_numpy(),
                    "strategy": rows[f"P{seat}_strategy"].to_numpy(),
                    "seat": seat,
                    "won": (rows["winner_seat"] == f"P{seat}").to_numpy(),
                    "completed": completed,
                }
            )
        )
    long = pd.concat(parts, ignore_index=True)
    keys = ["root_seed", "k", "deterministic_batch_id", "strategy", "seat"]
    g = long.groupby(keys, sort=True)
    out = pd.DataFrame(
        {
            "raw_wins": g["won"].sum(),
            "raw_exposures": g.size(),
            "raw_completed_exposures": g["completed"].sum(),
        }
    ).reset_index()
    out["raw_safety_limit_exposures"] = out["raw_exposures"] - out["raw_completed_exposures"]
    return out


def within_k_frames(counts: pd.DataFrame, k: int) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Strategy-level and population-level seat effects for one k."""
    if not (
        counts["raw_exposures"]
        == counts["raw_completed_exposures"] + counts["raw_safety_limit_exposures"]
    ).all():
        raise ValueError("seat counts violate attempted exposure conservation")
    if (counts["raw_wins"] > counts["raw_completed_exposures"]).any():
        raise ValueError("seat counts credit a win outside completed exposure support")

    def finish(grouped: pd.DataFrame) -> pd.DataFrame:
        grouped["chance_baseline"] = 1.0 / k
        grouped["win_rate"] = grouped["raw_wins"] / grouped["raw_exposures"]
        grouped["win_rate_per_attempt"] = grouped["win_rate"]
        grouped["win_rate_given_completion"] = grouped["raw_wins"] / grouped[
            "raw_completed_exposures"
        ].where(grouped["raw_completed_exposures"] > 0)
        grouped["safety_limit_exposure_rate"] = (
            grouped["raw_safety_limit_exposures"] / grouped["raw_exposures"]
        )
        grouped["raw_losses"] = grouped["raw_exposures"] - grouped["raw_wins"]
        grouped["seat_effect"] = grouped["win_rate"] - grouped["chance_baseline"]
        return grouped

    agg = dict(
        raw_wins=("raw_wins", "sum"),
        raw_exposures=("raw_exposures", "sum"),
        raw_completed_exposures=("raw_completed_exposures", "sum"),
        raw_safety_limit_exposures=("raw_safety_limit_exposures", "sum"),
    )
    effects = finish(
        counts.groupby(["root_seed", "k", "strategy", "seat"], as_index=False)
        .agg(**agg)
        .sort_values(["strategy", "seat"])
        .reset_index(drop=True)
    )
    population = finish(
        counts.groupby(["root_seed", "k", "seat"], as_index=False)
        .agg(**agg)
        .sort_values("seat")
        .reset_index(drop=True)
    )
    return effects, population


def declared_weights(cfg: AppConfig, ks: list[int]) -> tuple[dict[int, float], str, str]:
    if cfg.k_aggregation.method == "equal-k":
        return dict.fromkeys(ks, 1.0 / len(ks)), "equal_k_mean", "equal_k"
    configured = cfg.k_aggregation.k_weights or {}
    if {int(k) for k in configured} != set(ks):
        raise ValueError("declared seat standardization weights must cover every configured k")
    return (
        {int(k): float(w) for k, w in configured.items()},
        "declared_k_weighted_mean",
        "declared_mapping",
    )


def standardized_frames(
    cfg: AppConfig,
    by_k: dict[int, pd.DataFrame],
    population_by_k: dict[int, pd.DataFrame],
    ks: list[int],
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Cross-k standardized effects + exposure-mixture diagnostic."""
    weights, _, _ = declared_weights(cfg, ks)
    common_seats = list(range(1, min(ks) + 1))
    common_strategies = sorted(
        set.intersection(*(set(f["strategy"].astype(int)) for f in by_k.values()))
    )
    idx = {
        k: f.set_index(["strategy", "seat"])
        for k, f in by_k.items()
    }
    pop_idx = {k: f.set_index("seat") for k, f in population_by_k.items()}
    standardized, mixture = [], []

    def cell_rows(cells, scope, strategy, seat, root):
        effect = sum(float(c["seat_effect"]) * weights[k] for k, c in zip(ks, cells))
        wins = sum(int(c["raw_wins"]) for c in cells)
        exposures = sum(int(c["raw_exposures"]) for c in cells)
        completed = sum(int(c["raw_completed_exposures"]) for c in cells)
        safety = sum(int(c["raw_safety_limit_exposures"]) for c in cells)
        baseline_mass = sum(int(c["raw_exposures"]) / k for k, c in zip(ks, cells))
        standardized.append(
            {
                "root_seed": root, "effect_scope": scope, "strategy": strategy,
                "seat": seat, "common_k_support": ks,
                "standardized_seat_effect": effect,
            }
        )
        mixture.append(
            {
                "root_seed": root, "effect_scope": scope, "strategy": strategy,
                "seat": seat, "common_k_support": ks,
                "raw_wins": wins, "raw_exposures": exposures,
                "raw_completed_exposures": completed,
                "raw_safety_limit_exposures": safety,
                "exposure_weighted_baseline": baseline_mass / exposures,
                "exposure_weighted_seat_effect": wins / exposures
                - baseline_mass / exposures,
            }
        )

    for strategy in common_strategies:
        for seat in common_seats:
            try:
                cells = [idx[k].loc[(strategy, seat)] for k in ks]
            except KeyError:
                continue
            cell_rows(cells, "strategy", strategy, seat, int(cells[0]["root_seed"]))
    for seat in common_seats:
        try:
            cells = [pop_idx[k].loc[seat] for k in ks]
        except KeyError:
            continue
        cell_rows(cells, "population", None, seat, int(cells[0]["root_seed"]))

    std = pd.DataFrame(standardized)
    mix = pd.DataFrame(mixture)
    if not std.empty:
        std["strategy"] = pd.array(std["strategy"].tolist(), dtype="Int64")
        mix["strategy"] = pd.array(mix["strategy"].tolist(), dtype="Int64")
    return std, mix


def game_diagnostics(sources: dict[int, pd.DataFrame]) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Self-play P1 diagnostic + k=2 mirrored-game pairing (vectorized)."""
    selfplay_rows = []
    mirrored_frame = pd.DataFrame(
        columns=[
            "root_seed", "k", "strategy_a", "strategy_b", "paired_mirrored_games",
            "games_attempted", "games_completed", "games_safety_limit",
            "unpaired_forward_games", "unpaired_reverse_games",
            "mean_p1_win_difference",
        ]
    )
    for k, df in sources.items():
        strategies = np.stack(
            [df[f"P{s}_strategy"].to_numpy() for s in range(1, k + 1)], axis=1
        )
        completed = (df["termination_status"] == "completed").to_numpy()
        p1_win = (df["winner_seat"] == "P1").to_numpy()
        uniform = (strategies == strategies[:, :1]).all(axis=1)
        if uniform.any():
            sp = pd.DataFrame(
                {
                    "root_seed": df["root_seed"].to_numpy()[uniform],
                    "strategy": strategies[uniform, 0],
                    "p1_win": p1_win[uniform],
                    "safety": ~completed[uniform],
                }
            )
            g = sp.groupby(["root_seed", "strategy"], sort=True)
            for (root, strat), grp in g:
                attempted = len(grp)
                safety_n = int(grp["safety"].sum())
                wins = int(grp["p1_win"].sum())
                selfplay_rows.append(
                    {
                        "root_seed": int(root), "k": k, "strategy": int(strat),
                        "p1_wins": wins, "games_attempted": attempted,
                        "games_completed": attempted - safety_n,
                        "games_safety_limit": safety_n,
                        "p1_win_rate_per_attempt": wins / attempted,
                        "p1_win_rate_given_completion": (
                            wins / (attempted - safety_n)
                            if attempted > safety_n else None
                        ),
                        "p1_effect_vs_chance": wins / attempted - 1.0 / k,
                    }
                )
        if k != 2:
            continue
        # mirrored pairing for distinct-strategy 2p games
        distinct = ~uniform
        mdf = pd.DataFrame(
            {
                "root_seed": df["root_seed"].to_numpy()[distinct],
                "batch": df["deterministic_batch_id"].to_numpy()[distinct],
                "s0": strategies[distinct, 0],
                "s1": strategies[distinct, 1],
                "completed": completed[distinct],
                "p1_win": p1_win[distinct],
            }
        )
        mdf["a"] = np.minimum(mdf["s0"], mdf["s1"])
        mdf["b"] = np.maximum(mdf["s0"], mdf["s1"])
        mdf["orientation"] = (mdf["s0"] != mdf["a"]).astype(int)  # 1 = reverse (b,a)
        comp = mdf[mdf["completed"]].copy()
        batch_keys = ["root_seed", "batch", "a", "b"]
        comp["occ"] = comp.groupby(batch_keys + ["orientation"]).cumcount()
        # pairs within a (root, batch, a, b): i-th forward matches i-th reverse
        cnt = (
            comp.groupby(batch_keys + ["orientation"]).size().rename("n").reset_index()
        )
        pivot = cnt.pivot_table(
            index=batch_keys, columns="orientation", values="n", fill_value=0
        ).reindex(columns=[0, 1], fill_value=0)
        pivot["n_pairs"] = pivot[[0, 1]].min(axis=1)
        comp = comp.merge(
            pivot["n_pairs"].reset_index(), on=batch_keys, how="left"
        )
        comp["n_pairs"] = comp["n_pairs"].fillna(0).astype(int)
        comp["paired"] = comp["occ"] < comp["n_pairs"]

        pair_keys = ["root_seed", "a", "b"]
        paired = comp[comp["paired"]].copy()
        paired["signed"] = np.where(paired["orientation"] == 0, 1, -1) * paired[
            "p1_win"
        ].astype(int)
        diff_sum = paired.groupby(pair_keys)["signed"].sum().rename("diff_sum")
        n_pairs_total = (
            pivot.groupby(["root_seed", "a", "b"])["n_pairs"].sum().rename("n_pairs")
        )
        totals = mdf.groupby(pair_keys).agg(
            games_attempted=("p1_win", "size"),
            games_completed=("completed", "sum"),
        )
        totals["games_safety_limit"] = (
            totals["games_attempted"] - totals["games_completed"]
        )
        unp = (
            comp[~comp["paired"]]
            .groupby(pair_keys + ["orientation"])
            .size()
            .rename("n")
            .reset_index()
            .pivot_table(index=pair_keys, columns="orientation", values="n", fill_value=0)
            .reindex(columns=[0, 1], fill_value=0)
            .rename(columns={0: "unpaired_forward_games", 1: "unpaired_reverse_games"})
        )
        result = (
            totals.join(n_pairs_total, how="left")
            .join(diff_sum, how="left")
            .join(unp, how="left")
            .fillna(
                {
                    "n_pairs": 0, "diff_sum": 0,
                    "unpaired_forward_games": 0, "unpaired_reverse_games": 0,
                }
            )
        )
        result["paired_mirrored_games"] = result["n_pairs"].astype(int)
        result["mean_p1_win_difference"] = (
            result["diff_sum"] / result["paired_mirrored_games"].replace(0, np.nan)
        )
        result = result.reset_index().rename(
            columns={"a": "strategy_a", "b": "strategy_b"}
        )
        result["k"] = 2
        result["unpaired_forward_games"] = result["unpaired_forward_games"].astype(int)
        result["unpaired_reverse_games"] = result["unpaired_reverse_games"].astype(int)
        result["games_completed"] = result["games_completed"].astype(int)
        mirrored_frame = result[
            [
                "root_seed", "k", "strategy_a", "strategy_b", "paired_mirrored_games",
                "games_attempted", "games_completed", "games_safety_limit",
                "unpaired_forward_games", "unpaired_reverse_games",
                "mean_p1_win_difference",
            ]
        ]
    selfplay_cols = [
        "root_seed", "k", "strategy", "p1_wins", "games_attempted",
        "games_completed", "games_safety_limit", "p1_win_rate_per_attempt",
        "p1_win_rate_given_completion", "p1_effect_vs_chance",
    ]
    return pd.DataFrame(selfplay_rows, columns=selfplay_cols), mirrored_frame


def _publish(cfg: AppConfig, frame: pd.DataFrame, path: Path, *, scope: str, op: str):
    table = pa.Table.from_pandas(frame, preserve_index=False)
    write_parquet_artifact_atomic(
        table, path, producer="seat_analysis", scope=scope,
        metadata={"operation": op, "baseline": "chance_1_over_k"},
    )


def build_canonical_seat_analysis(
    cfg: AppConfig, *, force: bool = False
) -> SeatAnalysisArtifacts:
    """Build within-k seat effects and secondary diagnostics."""
    ks = sorted({int(k) for k in cfg.sim.n_players_list})
    artifacts = SeatAnalysisArtifacts(
        batch_counts=tuple(cfg.seat_batch_counts_path(k) for k in ks),
        by_k=tuple(cfg.seat_effects_by_k_path(k) for k in ks),
        population_by_k=tuple(cfg.seat_population_by_k_path(k) for k in ks),
        standardized_across_k=cfg.seat_standardized_across_k_path(),
        exposure_mixture_diagnostic=cfg.seat_exposure_mixture_diagnostic_path(),
        selfplay_diagnostic=cfg.seat_selfplay_diagnostic_path(),
        mirrored_diagnostic=cfg.seat_mirrored_diagnostic_path(),
    )
    stage_sha = compute_stage_config_sha(cfg, "metrics")
    stage_dir = cfg.seat_analysis_dir()
    state = resolve_stage_state(
        stage_dir, "canonical_seat_analysis", config_sha=stage_sha,
        freshness_key=cfg.freshness_key(),
    )
    if state == StageState.COMPLETE_VALID and not force:
        logger.info("canonical seat analysis up to date")
        return artifacts

    def _seat_columns(k: int) -> list[str]:
        return [
            "root_seed", "k", "deterministic_batch_id", "termination_status",
            "winner_seat",
        ] + [f"P{s}_strategy" for s in range(1, k + 1)]

    by_k, population_by_k = {}, {}
    selfplay_parts: list[pd.DataFrame] = []
    mirrored_parts: list[pd.DataFrame] = []
    for k, count_path, effect_path, pop_path in zip(
        ks, artifacts.batch_counts, artifacts.by_k, artifacts.population_by_k
    ):
        # one column-pruned cell at a time: the mega workload's combined row
        # tables are tens of millions of rows and must never coexist in memory
        source = read_parquet_artifact(
            cfg.curated_rows_path(k), expected_producer="curate",
            columns=_seat_columns(k),
        ).to_pandas()
        counts = build_seat_batch_counts(source, k)
        sp_k, mir_k = game_diagnostics({k: source})
        selfplay_parts.append(sp_k)
        if len(mir_k):
            mirrored_parts.append(mir_k)
        del source
        _publish(cfg, counts, count_path, scope="by_k", op="aggregate_seat_batch_exposures")
        effects, population = within_k_frames(counts, k)
        by_k[k] = effects
        population_by_k[k] = population
        _publish(cfg, effects, effect_path, scope="by_k", op="calculate_strategy_seat_effects")
        _publish(cfg, population, pop_path, scope="by_k", op="calculate_population_seat_effects")

    std, mix = standardized_frames(cfg, by_k, population_by_k, ks)
    _, operation, _ = declared_weights(cfg, ks)
    _publish(cfg, std, artifacts.standardized_across_k, scope="across_k", op=operation)
    _publish(
        cfg, mix, artifacts.exposure_mixture_diagnostic, scope="diagnostics",
        op="within_k_exposure_combination",
    )
    selfplay = pd.concat(selfplay_parts, ignore_index=True)
    _, empty_mirrored = game_diagnostics({})
    mirrored = (
        pd.concat(mirrored_parts, ignore_index=True)
        if mirrored_parts
        else empty_mirrored
    )
    _publish(
        cfg, selfplay, artifacts.selfplay_diagnostic, scope="diagnostics",
        op="calculate_self_play_diagnostics",
    )
    _publish(
        cfg, mirrored, artifacts.mirrored_diagnostic, scope="diagnostics",
        op="calculate_mirrored_game_diagnostics",
    )
    write_stage_done(
        stage_dir, "canonical_seat_analysis",
        inputs=[cfg.curated_rows_path(k) for k in ks],
        outputs=list(artifacts.all_paths),
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
    return artifacts
