"""Canonical performance estimators from batch sufficient statistics.

Parity targets (``/root/reference/src/farkle/analysis/performance.py``):

* per-k estimates (``:107``): win rate per attempt, chance delta vs 1/k,
  Wilson interval + resolution check, deterministic-batch MCSE with a
  t-interval;
* complete-support across-k frame (``:200``): equal-k mean of chance deltas,
  pooled MCSE, minimum/worst-k, exact Pareto membership (``:172``), maximin
  leader;
* joint deterministic-batch-vector resampling (``:336``): namespace-400
  coordinate bootstrap over batch indices, producing rank mean/sd, top-N and
  shortlist inclusion probabilities, and control contrasts;
* player-count effect diagnostics (``:472``): chance-relative log odds,
  within-k spreads, pairwise-k contrasts and rank agreement.

Everything is vectorized NumPy/pandas — the math is small once the device
has produced the batch sufficient statistics.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from math import sqrt
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
from scipy.stats import kendalltau, norm, spearmanr, t as t_dist

from farkle_ii_tpu.config import AppConfig, compute_stage_config_sha
from farkle_ii_tpu.ops.rng import RandomPurpose, coordinate_numpy_rng
from farkle_ii_tpu.utils.artifacts import (
    method_contract,
    read_parquet_artifact,
    write_parquet_artifact_atomic,
)
from farkle_ii_tpu.utils.stage_completion import (
    StageState,
    resolve_stage_state,
    write_stage_done,
)
from farkle_ii_tpu.utils.stats import wilson_ci

logger = logging.getLogger(__name__)

ALPHA = 0.05


@dataclass(frozen=True)
class PerformanceArtifacts:
    by_k: dict[int, Path]
    across_k: Path
    bootstrap: Path
    control_contrasts: Path
    player_count_effects: Path


def estimate_one_k(
    frame: pd.DataFrame, k: int, resolution_delta: float, practical_delta: float
) -> pd.DataFrame:
    """Per-strategy estimates for one player count (reference ``:107``)."""
    chance = 1.0 / k
    g = frame.groupby("strategy", sort=True)
    wins = g["raw_wins"].sum()
    exposures = g["raw_player_game_exposures"].sum()
    completed = g["raw_completed_player_game_exposures"].sum()
    safety = g["raw_safety_limit_player_game_exposures"].sum()
    losses = g["raw_losses"].sum()
    batches = g["deterministic_batch_id"].nunique()
    rate = wins / exposures

    # batch MCSE: per-strategy std over batch rates / sqrt(B)
    frame = frame.assign(
        batch_rate=frame["raw_wins"] / frame["raw_player_game_exposures"]
    )
    mcse = frame.groupby("strategy", sort=True)["batch_rate"].std(ddof=1) / np.sqrt(
        batches
    )
    critical = batches.map(lambda b: float(t_dist.ppf(1 - ALPHA / 2, b - 1)) if b >= 2 else np.nan)
    interval_low = np.maximum(0.0, rate - critical * mcse)
    interval_high = np.minimum(1.0, rate + critical * mcse)

    wilson = np.array(
        [wilson_ci(int(w), int(n), alpha=ALPHA) for w, n in zip(wins, exposures)]
    )
    width = wilson[:, 1] - wilson[:, 0]

    out = pd.DataFrame(
        {
            "root_seed": int(frame["root_seed"].iloc[0]), "k": k,
            "strategy": wins.index.astype(int), "chance_baseline": chance,
            "raw_wins": wins.to_numpy(), "raw_exposures": exposures.to_numpy(),
            "raw_attempted_exposures": exposures.to_numpy(),
            "raw_completed_exposures": completed.to_numpy(),
            "raw_safety_limit_exposures": safety.to_numpy(),
            "raw_losses": losses.to_numpy(), "raw_batches": batches.to_numpy(),
            "win_rate_per_attempt": rate.to_numpy(), "win_rate": rate.to_numpy(),
            "win_rate_given_completion": (wins / completed.where(completed > 0)).to_numpy(),
            "safety_limit_exposure_rate": (safety / exposures).to_numpy(),
            "chance_delta": (rate - chance).to_numpy(),
            "wilson_interval_low": wilson[:, 0], "wilson_interval_high": wilson[:, 1],
            "wilson_interval_width": width,
            "screening_resolution_delta": resolution_delta,
            "practical_delta_by_k": practical_delta,
            "wilson_resolution_met": width <= resolution_delta,
            "batch_mcse": mcse.to_numpy(),
            "batch_interval_low": interval_low.to_numpy(),
            "batch_interval_high": interval_high.to_numpy(),
        }
    ).reset_index(drop=True)
    return out


def pareto_membership(values: np.ndarray, strategies: np.ndarray) -> np.ndarray:
    """Exact Pareto frontier membership over per-k delta vectors.

    A strategy is a member iff no other point weakly dominates it (``>=`` on
    every axis with ``>`` on at least one); identical duplicate vectors never
    dominate each other, so all copies stay members. Computed as a vectorized
    all-pairs domination test, blocked over candidates to bound the pairwise
    intermediate at ~2^24 elements (order-independent, so no sort needed).
    """
    count = len(strategies)
    if count == 0:
        return np.zeros(0, dtype=bool)
    values = np.asarray(values)
    dominated = np.zeros(count, dtype=bool)
    block = max(1, (1 << 24) // (count * max(1, values.shape[1])))
    for start in range(0, count, block):
        cand = values[start : start + block]  # (c, d)
        weakly_above = (values[:, None, :] >= cand[None, :, :]).all(axis=-1)  # (n, c)
        strictly_above = (values[:, None, :] > cand[None, :, :]).any(axis=-1)
        dominated[start : start + block] = (weakly_above & strictly_above).any(axis=0)
    return ~dominated


def across_k_estimates(
    by_k: dict[int, pd.DataFrame], required_k: list[int], practical_delta: float
) -> tuple[pd.DataFrame, np.ndarray, np.ndarray]:
    """Complete-support equal-k frame + delta vectors (reference ``:200``)."""
    indexed = {k: f.set_index("strategy") for k, f in by_k.items()}
    all_strategies = sorted(set().union(*(set(f.index) for f in indexed.values())))
    root_seed = int(next(iter(by_k.values()))["root_seed"].iat[0])
    count_columns = (
        "raw_wins", "raw_attempted_exposures", "raw_completed_exposures",
        "raw_safety_limit_exposures", "raw_losses",
    )
    rows = []
    full_support: list[int] = []
    delta_rows: list[list[float]] = []
    for strategy in all_strategies:  # deterministic ascending order
        support = [k for k in required_k if strategy in indexed[k].index]
        complete = list(support) == list(required_k)
        row: dict = {
            "root_seed": root_seed, "strategy": int(strategy),
            "required_k_count": len(required_k), "support_k_count": len(support),
            "complete_support": complete,
            **dict.fromkeys(count_columns),
            "safety_limit_exposure_rate": None,
            "practical_delta_across_k": practical_delta,
            **dict.fromkeys((
                "equal_k_score", "equal_k_mcse",
                "equal_k_interval_low", "equal_k_interval_high",
                "minimum_chance_delta", "worst_k",
            )),
            "pareto_member": False, "maximin_value": None, "maximin_leader": False,
        }
        if complete:
            deltas = np.array(
                [float(indexed[k].loc[strategy, "chance_delta"]) for k in required_k]
            )
            variances = np.array(
                [float(indexed[k].loc[strategy, "batch_mcse"]) ** 2 for k in required_k]
            )
            score = float(np.mean(deltas))
            mcse = float(sqrt(np.sum(variances) / len(required_k) ** 2))
            critical = float(norm.ppf(1 - ALPHA / 2))
            argmin_k = int(np.argmin(deltas))
            for col in count_columns:
                row[col] = int(sum(indexed[k].loc[strategy, col] for k in required_k))
            row.update(
                equal_k_score=score, equal_k_mcse=mcse,
                equal_k_interval_low=score - critical * mcse,
                equal_k_interval_high=score + critical * mcse,
                minimum_chance_delta=float(deltas[argmin_k]),
                worst_k=required_k[argmin_k],
                maximin_value=float(deltas[argmin_k]),
            )
            row["safety_limit_exposure_rate"] = (
                row["raw_safety_limit_exposures"] / row["raw_attempted_exposures"]
            )
            full_support.append(int(strategy))
            delta_rows.append(deltas.tolist())
        rows.append(row)
    output = pd.DataFrame(rows)
    full_support_ids = np.asarray(full_support, dtype=np.int64)
    vectors = np.asarray(delta_rows, dtype=float)
    if full_support:
        pareto = pareto_membership(vectors, full_support_ids)
        output.loc[output["strategy"].isin(full_support_ids[pareto]), "pareto_member"] = True
        minima = vectors.min(axis=1)
        tied = full_support_ids[np.isclose(minima, float(minima.max()), rtol=0.0, atol=1e-15)]
        output.loc[output["strategy"] == int(tied.min()), "maximin_leader"] = True
    return output, full_support_ids, vectors


def _batch_arrays(
    frames: dict[int, pd.DataFrame], strategies: np.ndarray
) -> dict[int, tuple[np.ndarray, np.ndarray]]:
    cols = strategies.tolist()

    def grid(frame: pd.DataFrame, value_col: str, index=None) -> pd.DataFrame:
        wide = frame.pivot(
            index="deterministic_batch_id", columns="strategy", values=value_col
        )
        if index is not None:
            wide = wide.reindex(index=index)
        return wide.reindex(columns=cols).fillna(0)

    arrays = {}
    for k, frame in frames.items():
        wins = grid(frame, "raw_wins")
        exposures = grid(frame, "raw_player_game_exposures", index=wins.index)
        arrays[k] = (wins.to_numpy(dtype=float), exposures.to_numpy(dtype=float))
    return arrays


def joint_batch_resampling(
    cfg: AppConfig,
    frames: dict[int, pd.DataFrame],
    across: pd.DataFrame,
    strategies: np.ndarray,
    required_k: list[int],
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Namespace-400 joint batch bootstrap (reference ``:336``)."""
    n_reps = cfg.screening.bootstrap_replicates
    short_delta = cfg.screening.delta_across_k
    arrays = _batch_arrays(frames, strategies)
    s_count = len(strategies)
    top_n = min(cfg.screening.candidate_contribution_size, s_count)
    rank_sum = np.zeros(s_count)
    rank_sq = np.zeros(s_count)
    top_counts = np.zeros(s_count, dtype=np.int64)
    shortlist_counts = np.zeros(s_count, dtype=np.int64)
    controls = np.asarray(sorted(set(cfg.screening.controls)), dtype=np.int64)
    missing = sorted(set(controls.tolist()) - set(strategies.tolist()))
    if missing:
        raise ValueError(f"declared controls lack complete k support: {missing}")
    control_idx = [int(np.flatnonzero(strategies == c)[0]) for c in controls]
    contrast_sum = np.zeros((len(controls), s_count))
    contrast_sq = np.zeros((len(controls), s_count))
    root_seed = int(across["root_seed"].iat[0])

    for rep in range(n_reps):
        scores = np.zeros(s_count)
        for k in required_k:
            wins_grid, expo_grid = arrays[k]
            b = wins_grid.shape[0]
            rng = coordinate_numpy_rng(
                RandomPurpose.BOOTSTRAP, root_seed=root_seed, k=k,
                replicate_index=rep,
            )
            selected = rng.integers(0, b, size=b)
            tw = wins_grid[selected].sum(axis=0)
            te = expo_grid[selected].sum(axis=0)
            if np.any(te <= 0):
                raise ValueError("joint resampling produced zero complete-support exposure")
            scores += tw / te - 1.0 / k
        scores /= len(required_k)
        order = np.lexsort((strategies, -scores))
        ranks = np.empty(s_count, dtype=np.int64)
        ranks[order] = np.arange(1, s_count + 1)
        rank_sum += ranks
        rank_sq += ranks * ranks
        np.add.at(top_counts, order[:top_n], 1)
        shortlist_counts += scores >= scores.max() - short_delta
        for pos, ci in enumerate(control_idx):
            contrasts = scores - scores[ci]
            contrast_sum[pos] += contrasts
            contrast_sq[pos] += contrasts * contrasts

    div = float(n_reps)
    rank_mean = rank_sum / div
    rank_var = np.maximum(rank_sq / div - rank_mean**2, 0.0)
    bootstrap = pd.DataFrame(
        {
            "root_seed": root_seed, "strategy": strategies,
            "bootstrap_replicates": n_reps, "bootstrap_rank_mean": rank_mean,
            "bootstrap_rank_sd": np.sqrt(rank_var), "top_n_size": top_n,
            "top_n_inclusion_probability": top_counts / div,
            "shortlist_delta": short_delta,
            "shortlist_inclusion_probability": shortlist_counts / div,
        }
    )
    complete = across.loc[across["complete_support"]]
    observed = dict(
        zip(complete["strategy"].astype(int), complete["equal_k_score"].astype(float))
    )
    contrast_rows = []
    for pos, control in enumerate(controls):
        means = contrast_sum[pos] / div
        variances = np.maximum(contrast_sq[pos] / div - means**2, 0.0)
        for idx, strategy in enumerate(strategies):
            contrast_rows.append({
                "root_seed": root_seed, "strategy": int(strategy),
                "control_strategy": int(control),
                "observed_equal_k_contrast": observed[int(strategy)] - observed[int(control)],
                "bootstrap_contrast_mean": float(means[idx]),
                "bootstrap_contrast_sd": float(sqrt(variances[idx])),
                "bootstrap_replicates": n_reps,
            })
    contrast_cols = [
        "root_seed", "strategy", "control_strategy", "observed_equal_k_contrast",
        "bootstrap_contrast_mean", "bootstrap_contrast_sd", "bootstrap_replicates",
    ]
    return bootstrap, pd.DataFrame(contrast_rows, columns=contrast_cols)


def declared_k_weights(cfg: AppConfig, required_k: list[int]) -> dict[int, float]:
    if cfg.k_aggregation.method == "equal-k":
        return dict.fromkeys(required_k, 1.0 / len(required_k))
    weights = cfg.k_aggregation.k_weights
    if weights is None or {int(k) for k in weights} != set(required_k):
        raise ValueError("declared player-count weights must cover complete configured support")
    return {int(k): float(weights[k]) for k in required_k}


# Output schema of the player-count effect diagnostics artifact (column set
# and diagnostic_type values are contract; reference ``:472`` emits the same
# 26 columns). Every section frame below is reindexed onto this.
_EFFECT_COLUMNS = [
    "diagnostic_type", "root_seed", "strategy", "k", "k_a", "k_b",
    "k_weight", "k_weight_a", "k_weight_b", "win_rate", "chance_baseline",
    "chance_relative_log_odds", "effect_available", "unavailable_reason",
    "log_odds_contrast", "finite_strategy_count", "boundary_unavailable_count",
    "log_odds_sd", "log_odds_iqr", "log_odds_top_minus_median",
    "common_finite_strategy_count", "spearman_rank_correlation",
    "kendall_rank_correlation", "complete_configured_k_support",
    "declared_k_method",
]

_BOUNDARY_REASON = "boundary_win_rate_log_odds_unavailable"


def chance_log_odds_matrix(rates: np.ndarray, k_arr: np.ndarray) -> np.ndarray:
    """Chance-relative log odds for a (n_k, n_strategies) win-rate matrix.

    Boundary rates (0 or 1, where log odds diverge) map to NaN.
    """
    interior = (rates > 0.0) & (rates < 1.0)
    safe = np.where(interior, rates, 0.5)
    chance = 1.0 / k_arr[:, None]
    lo = np.log(safe / (1.0 - safe)) - np.log(chance / (1.0 - chance))
    return np.where(interior, lo, np.nan)


def player_count_effect_diagnostics(
    cfg: AppConfig, estimates: dict[int, pd.DataFrame], required_k: list[int]
) -> pd.DataFrame:
    """Cross-k effect diagnostics (semantics of reference ``:472``).

    All four diagnostic sections are computed from one dense
    ``(n_k, n_strategies)`` log-odds matrix with NaN at boundary rates —
    column-vectorized frame construction, no per-row dict assembly.
    """
    support = sorted(
        set.intersection(*(set(f["strategy"].astype(int)) for f in estimates.values()))
    )
    if not support:
        raise ValueError("player-count diagnostics require complete strategy support")
    weights = declared_k_weights(cfg, required_k)
    root_seed = int(next(iter(estimates.values()))["root_seed"].iloc[0])
    k_arr = np.asarray(required_k, dtype=int)
    w_arr = np.asarray([weights[k] for k in required_k], dtype=float)
    strat = np.asarray(support, dtype=int)
    n_s = strat.size

    # (n_k, n_s) win-rate matrix aligned to the common support
    rates = np.vstack(
        [
            estimates[k].set_index("strategy")["win_rate"]
            .reindex(support).to_numpy(dtype=float)
            for k in required_k
        ]
    )
    lo = chance_log_odds_matrix(rates, k_arr)
    finite = np.isfinite(lo)

    def reason_col(available: np.ndarray):
        return np.where(available, None, _BOUNDARY_REASON)

    sections: list[pd.DataFrame] = []
    for i, k in enumerate(required_k):
        sections.append(
            pd.DataFrame(
                {
                    "diagnostic_type": "strategy_k_chance_relative_log_odds",
                    "strategy": strat,
                    "k": k,
                    "k_weight": w_arr[i],
                    "win_rate": rates[i],
                    "chance_baseline": 1.0 / k,
                    "chance_relative_log_odds": lo[i],
                    "effect_available": finite[i],
                    "unavailable_reason": reason_col(finite[i]),
                }
            )
        )
        vals = lo[i, finite[i]]
        q75, q25 = (
            np.percentile(vals, [75, 25]) if vals.size else (np.nan, np.nan)
        )
        sections.append(
            pd.DataFrame(
                {
                    "diagnostic_type": ["within_k_strategy_spread"],
                    "k": k,
                    "k_weight": w_arr[i],
                    "finite_strategy_count": vals.size,
                    "boundary_unavailable_count": n_s - vals.size,
                    "log_odds_sd": np.std(vals, ddof=1) if vals.size >= 2 else np.nan,
                    "log_odds_iqr": q75 - q25,
                    "log_odds_top_minus_median": (
                        np.max(vals) - np.median(vals) if vals.size else np.nan
                    ),
                }
            )
        )

    for ia, ib in zip(*np.triu_indices(len(required_k), k=1)):
        pair_ok = finite[ia] & finite[ib]
        contrast = np.where(pair_ok, lo[ia] - lo[ib], np.nan)
        sections.append(
            pd.DataFrame(
                {
                    "diagnostic_type": "strategy_pairwise_k_contrast",
                    "strategy": strat,
                    "k_a": k_arr[ia],
                    "k_b": k_arr[ib],
                    "k_weight_a": w_arr[ia],
                    "k_weight_b": w_arr[ib],
                    "effect_available": pair_ok,
                    "unavailable_reason": reason_col(pair_ok),
                    "log_odds_contrast": contrast,
                }
            )
        )
        n_common = int(pair_ok.sum())
        if n_common >= 2:
            rho = float(spearmanr(lo[ia, pair_ok], lo[ib, pair_ok]).statistic)
            tau = float(kendalltau(lo[ia, pair_ok], lo[ib, pair_ok]).statistic)
        else:
            rho = tau = np.nan
        sections.append(
            pd.DataFrame(
                {
                    "diagnostic_type": ["pairwise_k_rank_agreement"],
                    "k_a": k_arr[ia],
                    "k_b": k_arr[ib],
                    "k_weight_a": w_arr[ia],
                    "k_weight_b": w_arr[ib],
                    "common_finite_strategy_count": n_common,
                    "spearman_rank_correlation": rho,
                    "kendall_rank_correlation": tau,
                }
            )
        )

    frame = pd.concat(
        [s.reindex(columns=_EFFECT_COLUMNS) for s in sections], ignore_index=True
    )
    frame["root_seed"] = root_seed
    frame["complete_configured_k_support"] = True
    frame["declared_k_method"] = cfg.k_aggregation.method
    return frame


def _publish(
    cfg: AppConfig, frame: pd.DataFrame, path: Path, *, scope: str, op: str,
    method: dict | None = None,
):
    table = pa.Table.from_pandas(frame, preserve_index=False)
    write_parquet_artifact_atomic(
        table, path, producer="performance", scope=scope,
        method=method if method is not None else method_contract("wilson_ci", confidence=0.95),
        metadata={
            "operation": op,
            "baseline": "chance_1_over_k",
            "replication_unit": "deterministic_shuffle_batch",
            "conditioning": "all_attempted_player_game_exposures_safety_limit_is_loss",
        },
    )


def build_canonical_performance(cfg: AppConfig, *, force: bool = False) -> PerformanceArtifacts:
    """Build per-k, equal-k across-k, bootstrap and diagnostic artifacts."""
    required_k = sorted({int(k) for k in cfg.sim.n_players_list})
    practical = {int(k): float(v) for k, v in cfg.screening.practical_delta_by_k.items()}
    if set(practical) != set(required_k):
        raise ValueError(
            "screening.practical_delta_by_k must cover complete configured k support"
        )
    artifacts = PerformanceArtifacts(
        by_k={k: cfg.performance_by_k_path(k) for k in required_k},
        across_k=cfg.performance_across_k_path(),
        bootstrap=cfg.performance_bootstrap_path(),
        control_contrasts=cfg.performance_control_contrasts_path(),
        player_count_effects=cfg.performance_player_count_effects_path(),
    )
    stage_sha = compute_stage_config_sha(cfg, "metrics")
    stage_dir = cfg.performance_dir()
    state = resolve_stage_state(
        stage_dir, "canonical_performance", config_sha=stage_sha,
        freshness_key=cfg.freshness_key(),
    )
    if state == StageState.COMPLETE_VALID and not force:
        logger.info("canonical performance up to date")
        return artifacts

    frames = {
        k: read_parquet_artifact(
            cfg.batch_metrics_path(k), expected_producer="metrics"
        ).to_pandas()
        for k in required_k
    }
    by_k = {
        k: estimate_one_k(
            frames[k], k, cfg.screening.resolution_delta, practical[k]
        )
        for k in required_k
    }
    for k in required_k:
        _publish(cfg, by_k[k], artifacts.by_k[k], scope="by_k", op="estimate_one_k")
    across, strategies, _ = across_k_estimates(
        by_k, required_k, cfg.screening.delta_across_k
    )
    _publish(cfg, across, artifacts.across_k, scope="across_k", op="equal_k_mean")
    bootstrap, contrasts = joint_batch_resampling(cfg, frames, across, strategies, required_k)
    _publish(
        cfg, bootstrap, artifacts.bootstrap, scope="across_k",
        op="joint_batch_bootstrap",
        method=method_contract(
            "bootstrap",
            n_resamples=cfg.screening.bootstrap_replicates,
            rng_namespace=400,
        ),
    )
    _publish(
        cfg, contrasts, artifacts.control_contrasts, scope="across_k",
        op="control_contrasts",
    )
    effects = player_count_effect_diagnostics(cfg, by_k, required_k)
    _publish(
        cfg, effects, artifacts.player_count_effects, scope="across_k",
        op="player_count_effects",
    )
    write_stage_done(
        stage_dir, "canonical_performance",
        inputs=[cfg.batch_metrics_path(k) for k in required_k],
        outputs=[
            *artifacts.by_k.values(), artifacts.across_k, artifacts.bootstrap,
            artifacts.control_contrasts, artifacts.player_count_effects,
        ],
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
    return artifacts
