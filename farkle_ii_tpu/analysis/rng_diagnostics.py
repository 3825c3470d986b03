"""RNG-quality diagnostics: lagged autocorrelation of game outcomes.

Reference parity (``/root/reference/src/farkle/analysis/rng_diagnostics.py``):
autocorrelations of the win indicator and of game length over games ordered
by ``game_seed``, at the strategy level and the matchup-strategy level
(capped at ``analysis.rng_max_matchup_groups`` groups), with
``diagnostic_band_*`` reference bands at +/- 2/sqrt(n). The bands carry no
independence claim — they are descriptive reference lines only.
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

logger = logging.getLogger(__name__)

LAGS = (1, 2, 3, 5, 10)


def diagnostics_path(cfg: AppConfig, k: int) -> Path:
    return cfg.scope_dir("diagnostics") / f"rng_autocorrelation_{k}p.parquet"


def lagged_autocorr(values: np.ndarray, lag: int) -> float | None:
    n = len(values)
    if n <= lag + 1:
        return None
    a = values[:-lag]
    b = values[lag:]
    sa, sb = a.std(), b.std()
    if sa == 0 or sb == 0:
        return None
    return float(np.corrcoef(a, b)[0, 1])


def _series_rows(
    values: np.ndarray, *, level: str, key: str, metric: str, k: int, root: int
) -> list[dict]:
    n = len(values)
    band = 2.0 / np.sqrt(n) if n > 0 else None
    rows = []
    for lag in LAGS:
        rows.append(
            {
                "root_seed": root,
                "k": k,
                "level": level,
                "group_key": key,
                "metric": metric,
                "lag": lag,
                "n_games": n,
                "autocorrelation": lagged_autocorr(values, lag),
                "diagnostic_band_low": -band if band is not None else None,
                "diagnostic_band_high": band,
            }
        )
    return rows


def run_for_k(cfg: AppConfig, k: int) -> pd.DataFrame:
    rows = read_parquet_artifact(
        cfg.curated_rows_path(k), expected_producer="curate"
    ).to_pandas()
    rows = rows.sort_values("game_seed", kind="mergesort")
    completed = rows["termination_status"] == "completed"
    root = int(cfg.sim.seed)
    out: list[dict] = []

    # global level: game length + seat-1 win indicator
    out += _series_rows(
        rows["n_rounds"].to_numpy(dtype=float),
        level="global", key="all", metric="n_rounds", k=k, root=root,
    )
    out += _series_rows(
        (rows["winner_seat"] == "P1").to_numpy(dtype=float),
        level="global", key="all", metric="p1_win", k=k, root=root,
    )

    # strategy level: win indicator of each strategy's exposure stream
    long_parts = []
    for s in range(1, k + 1):
        long_parts.append(
            pd.DataFrame(
                {
                    "strategy": rows[f"P{s}_strategy"].to_numpy(),
                    "won": (rows["winner_seat"] == f"P{s}").to_numpy(dtype=float),
                    "n_rounds": rows["n_rounds"].to_numpy(dtype=float),
                    "order": np.arange(len(rows)),
                }
            )
        )
    long = pd.concat(long_parts, ignore_index=True).sort_values(
        ["strategy", "order"], kind="mergesort"
    )
    for strategy, group in long.groupby("strategy", sort=True):
        out += _series_rows(
            group["won"].to_numpy(),
            level="strategy", key=str(int(strategy)), metric="win", k=k, root=root,
        )

    # matchup level (k=2 only): capped group count
    if k == 2:
        comp = rows[completed].copy()
        a = np.minimum(comp["P1_strategy"], comp["P2_strategy"])
        b = np.maximum(comp["P1_strategy"], comp["P2_strategy"])
        comp["matchup"] = a.astype(str) + ":" + b.astype(str)
        cap = cfg.analysis.rng_max_matchup_groups
        for i, (matchup, group) in enumerate(comp.groupby("matchup", sort=True)):
            if i >= cap:
                logger.info("rng diagnostics: matchup group cap %d reached", cap)
                break
            out += _series_rows(
                (group["winner_seat"] == "P1").to_numpy(dtype=float),
                level="matchup", key=str(matchup), metric="p1_win", k=k, root=root,
            )
    return pd.DataFrame(out)


def run(cfg: AppConfig, *, force: bool = False) -> None:
    stage_sha = compute_stage_config_sha(cfg, "rng_diagnostics")
    out_dir = cfg.scope_dir("diagnostics")
    state = resolve_stage_state(
        out_dir, "rng_diagnostics", config_sha=stage_sha,
        freshness_key=cfg.freshness_key(),
    )
    if state == StageState.COMPLETE_VALID and not force:
        logger.info("rng diagnostics up to date")
        return
    outputs, inputs = [], []
    for k in sorted(int(k) for k in cfg.sim.n_players_list):
        frame = run_for_k(cfg, k)
        path = diagnostics_path(cfg, k)
        write_parquet_artifact_atomic(
            pa.Table.from_pandas(frame, preserve_index=False), path,
            producer="rng_diagnostics", scope="diagnostics",
            metadata={
                "operation": "lagged_autocorrelation",
                "interpretation": "reference_bands_no_independence_claim",
            },
        )
        outputs.append(path)
        inputs.append(cfg.curated_rows_path(k))
    write_stage_done(
        out_dir, "rng_diagnostics", inputs=inputs, outputs=outputs,
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
