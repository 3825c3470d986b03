"""Descriptive game statistics: lengths, margins, close games, rare events.

Condensed-but-complete counterpart of the reference's largest module
(``/root/reference/src/farkle/analysis/game_stats.py``, 3.2 kLoC of
streaming accumulators): per-k distributional summaries of game length and
victory margin with histogram-derived quantiles, per-strategy descriptive
stats, close-game and rare-event tallies (multi-target crossings, extreme
margins), equal-k across-k summaries, and global totals. Vectorized pandas
instead of per-row streaming; outputs carry the same descriptive-only intent.
"""

from __future__ import annotations

import logging
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
from farkle_ii_tpu.utils.writer import write_json_atomic

logger = logging.getLogger(__name__)

TARGET_SCORE = 10_000
CLOSE_MARGIN = 250
EXTREME_MARGIN = 5_000
QUANTILES = (0.01, 0.05, 0.25, 0.50, 0.75, 0.95, 0.99)


def stats_dir(cfg: AppConfig) -> Path:
    return cfg.scope_dir("diagnostics") / "game_stats"


def _quantile_row(values: np.ndarray, prefix: str) -> dict:
    if values.size == 0:
        return {f"{prefix}_q{int(q * 100):02d}": None for q in QUANTILES} | {
            f"{prefix}_mean": None, f"{prefix}_min": None, f"{prefix}_max": None,
        }
    out = {
        f"{prefix}_q{int(q * 100):02d}": float(np.quantile(values, q)) for q in QUANTILES
    }
    out[f"{prefix}_mean"] = float(values.mean())
    out[f"{prefix}_min"] = float(values.min())
    out[f"{prefix}_max"] = float(values.max())
    return out


def compute_k_game_stats(rows: pd.DataFrame, k: int) -> dict:
    """Per-k distributional summary of one curated rows table."""
    completed = rows["termination_status"] == "completed"
    comp = rows[completed]
    n_rounds = comp["n_rounds"].to_numpy(dtype=float)
    margin = comp["victory_margin"].to_numpy(dtype=float)
    winning = comp["winning_score"].to_numpy(dtype=float)
    total_rolls = sum(
        rows[f"P{s}_rolls"].to_numpy(dtype=np.int64) for s in range(1, k + 1)
    )
    total_farkles = sum(
        rows[f"P{s}_farkles"].to_numpy(dtype=np.int64) for s in range(1, k + 1)
    )
    # rare events: multiple players crossing the target in one game
    over_target = sum(
        (rows[f"P{s}_score"].to_numpy(dtype=np.int64) >= TARGET_SCORE).astype(int)
        for s in range(1, k + 1)
    )
    return {
        "k": k,
        "games_attempted": int(len(rows)),
        "games_completed": int(completed.sum()),
        "games_safety_limit": int((~completed).sum()),
        **_quantile_row(n_rounds, "n_rounds"),
        **_quantile_row(margin, "victory_margin"),
        **_quantile_row(winning, "winning_score"),
        **_quantile_row(total_rolls.astype(float), "total_rolls"),
        **_quantile_row(total_farkles.astype(float), "total_farkles"),
        "close_game_rate": float((margin <= CLOSE_MARGIN).mean()) if margin.size else None,
        "extreme_margin_rate": (
            float((margin >= EXTREME_MARGIN).mean()) if margin.size else None
        ),
        "multi_target_crossing_rate": float((over_target >= 2).mean()),
        "max_target_crossings": int(over_target.max()) if len(rows) else 0,
    }


def per_strategy_stats(rows: pd.DataFrame, k: int) -> pd.DataFrame:
    """Per-strategy descriptive stats over all seats (unconditional)."""
    parts = []
    completed = (rows["termination_status"] == "completed").to_numpy()
    for s in range(1, k + 1):
        parts.append(
            pd.DataFrame(
                {
                    "strategy": rows[f"P{s}_strategy"].to_numpy(),
                    "score": rows[f"P{s}_score"].to_numpy(dtype=float),
                    "rolls": rows[f"P{s}_rolls"].to_numpy(dtype=float),
                    "farkles": rows[f"P{s}_farkles"].to_numpy(dtype=float),
                    "highest_turn": rows[f"P{s}_highest_turn"].to_numpy(dtype=float),
                    "hot_dice": rows[f"P{s}_hot_dice"].to_numpy(dtype=float),
                    "won": (rows["winner_seat"] == f"P{s}").to_numpy(),
                    "completed": completed,
                }
            )
        )
    long = pd.concat(parts, ignore_index=True)
    g = long.groupby("strategy", sort=True)
    out = g.agg(
        exposures=("score", "size"),
        mean_score=("score", "mean"),
        score_sd=("score", "std"),
        mean_rolls=("rolls", "mean"),
        mean_farkles=("farkles", "mean"),
        mean_highest_turn=("highest_turn", "mean"),
        mean_hot_dice=("hot_dice", "mean"),
        wins=("won", "sum"),
    ).reset_index()
    out["k"] = k
    return out


def run(cfg: AppConfig, *, force: bool = False) -> None:
    stage_sha = compute_stage_config_sha(cfg, "game_stats")
    out_dir = stats_dir(cfg)
    state = resolve_stage_state(
        out_dir, "game_stats", config_sha=stage_sha, freshness_key=cfg.freshness_key()
    )
    if state == StageState.COMPLETE_VALID and not force:
        logger.info("game stats up to date")
        return
    ks = sorted(int(k) for k in cfg.sim.n_players_list)
    per_k_rows = []
    strategy_frames = []
    inputs = []
    for k in ks:
        src = cfg.curated_rows_path(k)
        inputs.append(src)
        rows = read_parquet_artifact(src, expected_producer="curate").to_pandas()
        per_k_rows.append(compute_k_game_stats(rows, k))
        strategy_frames.append(per_strategy_stats(rows, k))
    per_k = pd.DataFrame(per_k_rows)
    per_strategy = pd.concat(strategy_frames, ignore_index=True)

    outputs = []
    per_k_path = out_dir / "game_stats_by_k.parquet"
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(per_k, preserve_index=False), per_k_path,
        producer="game_stats", scope="diagnostics",
        metadata={"operation": "per_k_descriptive_summary"},
    )
    outputs.append(per_k_path)
    strat_path = out_dir / "game_stats_per_strategy.parquet"
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(per_strategy, preserve_index=False), strat_path,
        producer="game_stats", scope="diagnostics",
        metadata={"operation": "per_strategy_descriptive_summary"},
    )
    outputs.append(strat_path)
    # global across-k (equal-k mean of per-k means where defined)
    global_stats = {
        "ks": ks,
        "games_attempted": int(per_k["games_attempted"].sum()),
        "games_completed": int(per_k["games_completed"].sum()),
        "games_safety_limit": int(per_k["games_safety_limit"].sum()),
        "equal_k_mean_n_rounds": float(per_k["n_rounds_mean"].mean()),
        "equal_k_mean_victory_margin": float(per_k["victory_margin_mean"].mean()),
        "equal_k_close_game_rate": float(per_k["close_game_rate"].mean()),
        "interpretation": "descriptive_summaries_only",
    }
    global_path = out_dir / "game_stats_global.json"
    write_json_atomic(global_path, global_stats)
    outputs.append(global_path)
    write_stage_done(
        out_dir, "game_stats", inputs=inputs, outputs=outputs,
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
