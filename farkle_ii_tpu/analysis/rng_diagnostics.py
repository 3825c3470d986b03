"""RNG-quality diagnostics: lagged autocorrelation of game outcomes.

Reference parity (``/root/reference/src/farkle/analysis/rng_diagnostics.py:564-668``):
autocorrelations of win indicators and game length over games ordered by
``game_seed``, at four levels — global, strategy, **matchup**, and
**matchup-strategy** (every k, capped at ``analysis.rng_max_matchup_groups``
deterministically ordered groups) — with ``diagnostic_band_*`` reference
lines at ±2/√n. The bands carry no independence claim — they are
descriptive reference lines only.

Lags come from ``analysis.rng_lags``. All group statistics are computed
from vectorized grouped sufficient sums (one ``bincount`` sweep per lag per
level — the streaming-accumulator shape of the reference without per-row
Python), and the rows read is column-pruned to the k+4 needed columns so
the mega k=2 cell never materializes its full 40-column table.
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


def diagnostics_path(cfg: AppConfig, k: int) -> Path:
    return cfg.scope_dir("diagnostics") / f"rng_autocorrelation_{k}p.parquet"


def grouped_lagged_autocorr(
    codes: np.ndarray, values: np.ndarray, lag: int, n_groups: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-group Pearson autocorrelation at ``lag`` from grouped sums.

    ``codes``/``values`` must be sorted by (group, stream order); lag pairs
    never cross group boundaries. Returns ``(corr, n_pairs)`` arrays of
    length ``n_groups`` (NaN where undefined).
    """
    corr = np.full(n_groups, np.nan)
    if len(values) <= lag:
        return corr, np.zeros(n_groups, dtype=np.int64)
    same = codes[lag:] == codes[:-lag]
    g = codes[lag:][same]
    a = values[:-lag][same].astype(np.float64)
    b = values[lag:][same].astype(np.float64)
    n = np.bincount(g, minlength=n_groups).astype(np.float64)
    sa = np.bincount(g, weights=a, minlength=n_groups)
    sb = np.bincount(g, weights=b, minlength=n_groups)
    saa = np.bincount(g, weights=a * a, minlength=n_groups)
    sbb = np.bincount(g, weights=b * b, minlength=n_groups)
    sab = np.bincount(g, weights=a * b, minlength=n_groups)
    with np.errstate(invalid="ignore", divide="ignore"):
        cov = sab - sa * sb / np.where(n > 0, n, 1)
        va = saa - sa * sa / np.where(n > 0, n, 1)
        vb = sbb - sb * sb / np.where(n > 0, n, 1)
        denom = np.sqrt(va * vb)
        ok = (n > 1) & (denom > 0)
        corr[ok] = cov[ok] / denom[ok]
    return corr, n.astype(np.int64)


def _level_rows(
    *,
    codes: np.ndarray,
    values: np.ndarray,
    keys: list[str],
    level: str,
    metric: str,
    k: int,
    root: int,
    lags: list[int],
) -> list[dict]:
    """Autocorrelation rows for one (level, metric) across all its groups."""
    n_groups = len(keys)
    group_sizes = np.bincount(codes, minlength=n_groups)
    out: list[dict] = []
    per_lag = {
        lag: grouped_lagged_autocorr(codes, values, lag, n_groups) for lag in lags
    }
    for gi, key in enumerate(keys):
        n = int(group_sizes[gi])
        band = 2.0 / np.sqrt(n) if n > 0 else None
        for lag in lags:
            corr, _pairs = per_lag[lag]
            value = corr[gi]
            out.append(
                {
                    "root_seed": root,
                    "k": k,
                    "level": level,
                    "group_key": key,
                    "metric": metric,
                    "lag": lag,
                    "n_games": n,
                    "autocorrelation": None if np.isnan(value) else float(value),
                    "diagnostic_band_low": -band if band is not None else None,
                    "diagnostic_band_high": band,
                }
            )
    return out


def _rng_columns(k: int) -> list[str]:
    return ["game_seed", "winner_seat", "n_rounds", "termination_status"] + [
        f"P{s}_strategy" for s in range(1, k + 1)
    ]


def run_for_k(cfg: AppConfig, k: int) -> pd.DataFrame:
    rows = read_parquet_artifact(
        cfg.curated_rows_path(k), expected_producer="curate",
        columns=_rng_columns(k),
    ).to_pandas()
    rows = rows.sort_values("game_seed", kind="mergesort").reset_index(drop=True)
    root = int(cfg.sim.seed)
    lags = sorted({int(v) for v in cfg.analysis.rng_lags if int(v) >= 1})
    out: list[dict] = []
    n_games = len(rows)
    # winner as a compact 1-based seat integer (0 = no winner): the string
    # column as numpy objects costs ~10x the memory at mega row counts
    winner_str = rows["winner_seat"].astype("string")
    winner_seat_no = np.zeros(n_games, dtype=np.int8)
    for s in range(1, k + 1):
        winner_seat_no[(winner_str == f"P{s}").to_numpy(na_value=False)] = s
    strategies = np.stack(
        [rows[f"P{s}_strategy"].to_numpy(np.int64) for s in range(1, k + 1)], axis=1
    )
    n_rounds = rows["n_rounds"].to_numpy(np.float64)
    del rows, winner_str

    # ── global level ────────────────────────────────────────────────────
    zeros = np.zeros(n_games, dtype=np.int64)
    out += _level_rows(
        codes=zeros, values=n_rounds,
        keys=["all"], level="global", metric="n_rounds", k=k, root=root, lags=lags,
    )
    out += _level_rows(
        codes=zeros, values=(winner_seat_no == 1).astype(np.float64),
        keys=["all"], level="global", metric="p1_win", k=k, root=root, lags=lags,
    )

    # ── strategy level: each strategy's exposure stream ────────────────
    sids = strategies.T.reshape(-1)  # seat-major: (K*B,) keeps per-seat order
    order = np.tile(np.arange(n_games), k)
    won = np.concatenate(
        [(winner_seat_no == s).astype(np.float64) for s in range(1, k + 1)]
    )
    uniq, codes = np.unique(sids, return_inverse=True)
    sort_idx = np.lexsort((order, codes))
    out += _level_rows(
        codes=codes[sort_idx], values=won[sort_idx],
        keys=[str(int(s)) for s in uniq],
        level="strategy", metric="win", k=k, root=root, lags=lags,
    )

    # ── matchup + matchup-strategy levels (all k, capped groups) ───────
    # grouping is fully integer-coded: building per-row string keys cost
    # tens of minutes at production row counts; labels are materialized
    # only for the <= cap kept groups
    sorted_lineup = np.sort(strategies, axis=1)
    uniq_rows, m_codes = np.unique(sorted_lineup, axis=0, return_inverse=True)
    cap = int(cfg.analysis.rng_max_matchup_groups)
    if len(uniq_rows) > cap:
        logger.info(
            "rng diagnostics k=%d: %d matchup groups capped to %d "
            "(deterministic key order)", k, len(uniq_rows), cap,
        )
    n_kept = min(cap, len(uniq_rows))
    # lineup rows sort lexicographically like the old string keys sorted
    # numerically-per-field; label order is deterministic either way
    m_labels = [":".join(str(int(v)) for v in row) for row in uniq_rows[:n_kept]]
    keep = np.flatnonzero(m_codes < cap)
    if len(keep):
        mk = m_codes[keep]
        midx = np.argsort(mk, kind="stable")
        sel = keep[midx]
        # matchup level: focal = lowest strategy id in the lineup
        focal = sorted_lineup[sel, 0]
        focal_won = np.zeros(len(sel))
        for s in range(1, k + 1):
            focal_won += (
                (winner_seat_no[sel] == s) & (strategies[sel, s - 1] == focal)
            )
        out += _level_rows(
            codes=m_codes[sel], values=focal_won.astype(np.float64),
            keys=m_labels,
            level="matchup", metric="focal_win", k=k, root=root, lags=lags,
        )
        # matchup-strategy level: per (matchup, seat strategy) win stream,
        # pair-coded as matchup * (max_sid + 1) + sid
        ms_sids = strategies[sel].T.reshape(-1).astype(np.int64)
        ms_matchup = np.tile(m_codes[sel].astype(np.int64), k)
        ms_order = np.tile(np.arange(len(sel)), k)
        ms_won = np.concatenate(
            [(winner_seat_no[sel] == s).astype(np.float64) for s in range(1, k + 1)]
        )
        sid_base = int(ms_sids.max()) + 1 if len(ms_sids) else 1
        uniq_pair, p_codes = np.unique(
            ms_matchup * sid_base + ms_sids, return_inverse=True
        )
        p_labels = [
            f"{m_labels[int(code // sid_base)]}|{int(code % sid_base)}"
            for code in uniq_pair
        ]
        p_sort = np.lexsort((ms_order, p_codes))
        out += _level_rows(
            codes=p_codes[p_sort], values=ms_won[p_sort],
            keys=p_labels,
            level="matchup_strategy", metric="win", k=k, root=root, lags=lags,
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
                "lags": sorted({int(v) for v in cfg.analysis.rng_lags}),
                "matchup_group_cap": int(cfg.analysis.rng_max_matchup_groups),
                "interpretation": "reference_bands_no_independence_claim",
            },
        )
        outputs.append(path)
        inputs.append(cfg.curated_rows_path(k))
    write_stage_done(
        out_dir, "rng_diagnostics", inputs=inputs, outputs=outputs,
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
