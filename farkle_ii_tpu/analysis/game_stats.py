"""Descriptive game statistics: lengths, margins, close games, rare events.

Counterpart of the reference's largest module
(``/root/reference/src/farkle/analysis/game_stats.py``, 3.2 kLoC), built the
same way it is: **streaming accumulators over parquet batches in bounded
memory** (ref ``:106,:116``) — the k=2 production cell is ~11M rows and must
never be materialized whole. Capabilities:

* binned histogram accumulators per metric with histogram-derived quantiles
  (ref ``:1347-1530``): exact for unit-width integer metrics (game length,
  farkles), bin-midpoint approximations for wide-binned metrics (margins,
  winning scores), published as a histogram artifact;
* per-strategy descriptive breadth (ref ``:1205``): streaming sums/square
  sums for ten per-seat columns plus win / completed-exposure counts,
  accumulated by integer strategy id (O(grid) memory);
* close-game rates at every configured margin threshold
  (``analysis.margin_thresholds``) and rare-event tallies: multi-player
  target crossings (``analysis.rare_event_target``) and extreme margins at
  the ``analysis.rare_event_margin_quantile`` tail (ref ``:1681``);
* optional per-game **rare-event detail shards** (ref ``:1681-2948``): a
  second streaming pass extracts the identifying coordinates and values of
  every rare game when ``analysis.rare_event_detail`` is set;
* equal-k across-k summary frame on complete support (ref ``:878,:923``)
  plus global totals.

All outputs are descriptive only; nothing here carries inferential weight.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

from farkle_ii_tpu.config import AppConfig, compute_stage_config_sha
from farkle_ii_tpu.utils.artifacts import (
    iter_parquet_artifact_batches,
    write_parquet_artifact_atomic,
)
from farkle_ii_tpu.utils.stage_completion import (
    StageState,
    resolve_stage_state,
    write_stage_done,
)
from farkle_ii_tpu.utils.writer import write_json_atomic

logger = logging.getLogger(__name__)

QUANTILES = (0.01, 0.05, 0.25, 0.50, 0.75, 0.95, 0.99)
STREAM_BATCH_ROWS = 65_536

# streaming-histogram layouts: (bin width, bin count). Unit-width bins give
# exact quantiles; wider bins trade resolution for bounded memory.
_HIST_SPECS: dict[str, tuple[int, int]] = {
    "n_rounds": (1, 256),
    "victory_margin": (10, 4_096),       # 0..40,950 then overflow
    "winning_score": (50, 2_048),        # 0..102,350 then overflow
    "total_rolls": (2, 4_096),
    "total_farkles": (1, 2_048),
}

_STRATEGY_COLS = (
    "score",
    "rolls",
    "farkles",
    "highest_turn",
    "hot_dice",
    "smart_five_uses",
    "n_smart_five_dice",
    "smart_one_uses",
    "n_smart_one_dice",
    "n_turns",
)


def stats_dir(cfg: AppConfig) -> Path:
    return cfg.scope_dir("diagnostics") / "game_stats"


class StreamingHist:
    """Bounded-memory histogram + moments accumulator for integer metrics."""

    def __init__(self, width: int, n_bins: int) -> None:
        self.width = int(width)
        self.counts = np.zeros(n_bins + 1, dtype=np.int64)  # last bin = overflow
        self.count = 0
        self.vsum = 0.0
        self.vsq = 0.0
        self.vmin: float | None = None
        self.vmax: float | None = None

    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.int64)
        if v.size == 0:
            return
        bins = np.minimum(v // self.width, len(self.counts) - 1)
        self.counts += np.bincount(bins, minlength=len(self.counts))
        self.count += v.size
        self.vsum += float(v.sum())
        self.vsq += float((v.astype(np.float64) ** 2).sum())
        lo, hi = float(v.min()), float(v.max())
        self.vmin = lo if self.vmin is None else min(self.vmin, lo)
        self.vmax = hi if self.vmax is None else max(self.vmax, hi)

    def quantile(self, q: float) -> float | None:
        """Histogram-derived quantile: exact at width 1, bin midpoint else."""
        if self.count == 0:
            return None
        target = q * (self.count - 1)
        cum = np.cumsum(self.counts)
        b = int(np.searchsorted(cum, target, side="right"))
        if b >= len(self.counts) - 1:  # overflow bin: only the max is known
            return self.vmax
        if self.width == 1:
            return float(b)
        return float(b * self.width + (self.width - 1) / 2.0)

    def tail_threshold(self, tail: float) -> float | None:
        """Smallest value with at most ``tail`` fraction at or above it."""
        return self.quantile(1.0 - tail)

    def mean(self) -> float | None:
        return self.vsum / self.count if self.count else None

    def sd(self) -> float | None:
        if self.count < 2:
            return None
        var = (self.vsq - self.vsum**2 / self.count) / (self.count - 1)
        return float(np.sqrt(max(var, 0.0)))

    def summary(self, prefix: str) -> dict:
        out = {f"{prefix}_q{int(q * 100):02d}": self.quantile(q) for q in QUANTILES}
        out[f"{prefix}_mean"] = self.mean()
        out[f"{prefix}_sd"] = self.sd()
        out[f"{prefix}_min"] = self.vmin
        out[f"{prefix}_max"] = self.vmax
        return out

    def frame(self, k: int, metric: str) -> pd.DataFrame:
        nz = np.flatnonzero(self.counts)
        return pd.DataFrame(
            {
                "k": k,
                "metric": metric,
                "bin_lo": nz * self.width,
                "bin_width": self.width,
                "overflow": nz == len(self.counts) - 1,
                "count": self.counts[nz],
            }
        )


class StrategyAccumulator:
    """Streaming per-strategy sufficient statistics keyed by integer id."""

    def __init__(self) -> None:
        self.size = 0
        self.exposures: np.ndarray = np.zeros(0, dtype=np.int64)
        self.completed: np.ndarray = np.zeros(0, dtype=np.int64)
        self.wins: np.ndarray = np.zeros(0, dtype=np.int64)
        self.sums = {c: np.zeros(0, dtype=np.float64) for c in _STRATEGY_COLS}
        self.sqs = {c: np.zeros(0, dtype=np.float64) for c in _STRATEGY_COLS}

    def _grow(self, n: int) -> None:
        if n <= self.size:
            return
        pad = n - self.size
        self.exposures = np.concatenate([self.exposures, np.zeros(pad, np.int64)])
        self.completed = np.concatenate([self.completed, np.zeros(pad, np.int64)])
        self.wins = np.concatenate([self.wins, np.zeros(pad, np.int64)])
        for c in _STRATEGY_COLS:
            self.sums[c] = np.concatenate([self.sums[c], np.zeros(pad)])
            self.sqs[c] = np.concatenate([self.sqs[c], np.zeros(pad)])
        self.size = n

    def update(self, sids, cols: dict[str, np.ndarray], won, completed) -> None:
        sids = np.asarray(sids, dtype=np.int64)
        if sids.size == 0:
            return
        self._grow(int(sids.max()) + 1)
        n = self.size
        self.exposures += np.bincount(sids, minlength=n)
        self.completed += np.bincount(sids, weights=completed, minlength=n).astype(
            np.int64
        )
        self.wins += np.bincount(sids, weights=won, minlength=n).astype(np.int64)
        for c, values in cols.items():
            v = np.asarray(values, dtype=np.float64)
            self.sums[c] += np.bincount(sids, weights=v, minlength=n)
            self.sqs[c] += np.bincount(sids, weights=v * v, minlength=n)

    def frame(self, k: int) -> pd.DataFrame:
        active = np.flatnonzero(self.exposures)
        exp = self.exposures[active].astype(np.float64)
        out = {
            "k": k,
            "strategy": active,
            "exposures": self.exposures[active],
            "completed_exposures": self.completed[active],
            "wins": self.wins[active],
        }
        for c in _STRATEGY_COLS:
            mean = self.sums[c][active] / exp
            var = np.maximum(self.sqs[c][active] / exp - mean**2, 0.0)
            out[f"mean_{c}"] = mean
            out[f"sd_{c}"] = np.sqrt(var)
        return pd.DataFrame(out)


class CellAccumulator:
    """All streaming state for one (root, k) cell."""

    def __init__(self, k: int, cfg: AppConfig) -> None:
        self.k = k
        self.hists = {m: StreamingHist(*spec) for m, spec in _HIST_SPECS.items()}
        self.strategies = StrategyAccumulator()
        self.attempted = 0
        self.completed = 0
        self.margin_thresholds = [int(t) for t in cfg.analysis.margin_thresholds]
        self.close_counts = {t: 0 for t in self.margin_thresholds}
        self.rare_target = int(cfg.analysis.rare_event_target)
        self.crossing_counts = np.zeros(k + 1, dtype=np.int64)  # games by #crossers

    def update(self, batch: pd.DataFrame) -> None:
        k = self.k
        completed = (batch["termination_status"] == "completed").to_numpy()
        comp = batch[completed]
        self.attempted += len(batch)
        self.completed += int(completed.sum())

        margin = comp["victory_margin"].to_numpy(dtype=np.int64)
        self.hists["n_rounds"].update(comp["n_rounds"].to_numpy(dtype=np.int64))
        self.hists["victory_margin"].update(margin)
        self.hists["winning_score"].update(comp["winning_score"].to_numpy(np.int64))
        total_rolls = sum(
            batch[f"P{s}_rolls"].to_numpy(dtype=np.int64) for s in range(1, k + 1)
        )
        total_farkles = sum(
            batch[f"P{s}_farkles"].to_numpy(dtype=np.int64) for s in range(1, k + 1)
        )
        self.hists["total_rolls"].update(total_rolls)
        self.hists["total_farkles"].update(total_farkles)

        for t in self.margin_thresholds:
            self.close_counts[t] += int((margin <= t).sum())

        crossers = sum(
            (batch[f"P{s}_score"].to_numpy(np.int64) >= self.rare_target).astype(int)
            for s in range(1, k + 1)
        )
        self.crossing_counts += np.bincount(
            np.minimum(crossers, k), minlength=k + 1
        )

        winner = batch["winner_seat"].to_numpy(dtype=object)
        for s in range(1, k + 1):
            cols = {
                "score": batch[f"P{s}_score"].to_numpy(np.float64),
                "rolls": batch[f"P{s}_rolls"].to_numpy(np.float64),
                "farkles": batch[f"P{s}_farkles"].to_numpy(np.float64),
                "highest_turn": batch[f"P{s}_highest_turn"].to_numpy(np.float64),
                "hot_dice": batch[f"P{s}_hot_dice"].to_numpy(np.float64),
                "smart_five_uses": batch[f"P{s}_smart_five_uses"].to_numpy(np.float64),
                "n_smart_five_dice": batch[f"P{s}_n_smart_five_dice"].to_numpy(np.float64),
                "smart_one_uses": batch[f"P{s}_smart_one_uses"].to_numpy(np.float64),
                "n_smart_one_dice": batch[f"P{s}_n_smart_one_dice"].to_numpy(np.float64),
                "n_turns": batch[f"P{s}_n_turns"].to_numpy(np.float64),
            }
            self.strategies.update(
                batch[f"P{s}_strategy"].to_numpy(np.int64),
                cols,
                won=(winner == f"P{s}").astype(np.float64),
                completed=completed.astype(np.float64),
            )

    def summary(self, cfg: AppConfig) -> dict:
        rare_q = float(cfg.analysis.rare_event_margin_quantile)
        margin_hist = self.hists["victory_margin"]
        rare_margin_threshold = margin_hist.tail_threshold(rare_q)
        n_comp = max(self.completed, 1)
        multi = int(self.crossing_counts[2:].sum())
        out = {
            "k": self.k,
            "games_attempted": self.attempted,
            "games_completed": self.completed,
            "games_safety_limit": self.attempted - self.completed,
            "rare_event_target": self.rare_target,
            "rare_event_margin_quantile": rare_q,
            "rare_margin_threshold": rare_margin_threshold,
            "multi_target_crossing_games": multi,
            "multi_target_crossing_rate": multi / max(self.attempted, 1),
            "multi_target_rate_exceeds_target": bool(
                multi / max(self.attempted, 1) > cfg.analysis.rare_event_target_rate
            ),
            "max_target_crossings": int(
                np.flatnonzero(self.crossing_counts).max()
                if self.crossing_counts.any()
                else 0
            ),
        }
        for metric, hist in self.hists.items():
            out.update(hist.summary(metric))
        for t in self.margin_thresholds:
            out[f"close_game_rate_le_{t}"] = self.close_counts[t] / n_comp
        return out


def _iter_row_batches(src: Path, columns: list[str] | None = None):
    """Stream a curated rows artifact in bounded-memory record batches."""
    yield from iter_parquet_artifact_batches(
        src, expected_producer="curate", columns=columns,
        batch_rows=STREAM_BATCH_ROWS,
    )


def _rare_event_details(
    cfg: AppConfig, src: Path, k: int, rare_margin_threshold: float | None
) -> pd.DataFrame:
    """Second streaming pass: per-game detail rows for rare events."""
    target = int(cfg.analysis.rare_event_target)
    parts = []
    for batch in _iter_row_batches(src):
        completed = (batch["termination_status"] == "completed").to_numpy()
        margin = batch["victory_margin"].to_numpy(dtype=np.float64)
        crossers = sum(
            (batch[f"P{s}_score"].to_numpy(np.int64) >= target).astype(int)
            for s in range(1, k + 1)
        )
        is_multi = crossers >= 2
        is_extreme = (
            completed & (margin >= rare_margin_threshold)
            if rare_margin_threshold is not None
            else np.zeros(len(batch), dtype=bool)
        )
        is_safety = ~completed
        mask = is_multi | is_extreme | is_safety
        if not mask.any():
            continue
        sel = batch[mask]
        parts.append(
            pd.DataFrame(
                {
                    "k": k,
                    "shuffle_index": sel["shuffle_index"].to_numpy(),
                    "game_index": sel["game_index"].to_numpy(),
                    "game_seed": sel["game_seed"].to_numpy(),
                    "is_multi_target_crossing": is_multi[mask],
                    "is_extreme_margin": is_extreme[mask],
                    "is_safety_limit": is_safety[mask],
                    "n_target_crossers": crossers[mask],
                    "victory_margin": sel["victory_margin"].to_numpy(),
                    "n_rounds": sel["n_rounds"].to_numpy(),
                    "winning_score": sel["winning_score"].to_numpy(),
                }
            )
        )
    if not parts:
        return pd.DataFrame(
            columns=[
                "k", "shuffle_index", "game_index", "game_seed",
                "is_multi_target_crossing", "is_extreme_margin",
                "is_safety_limit", "n_target_crossers", "victory_margin",
                "n_rounds", "winning_score",
            ]
        )
    return pd.concat(parts, ignore_index=True)


def _across_k_frame(per_k: pd.DataFrame) -> pd.DataFrame:
    """Equal-k across-k summary on complete support (ref :878,:923)."""
    rows = []
    for metric in _HIST_SPECS:
        row = {"metric": metric, "k_support": sorted(per_k["k"].tolist())}
        for stat in ("mean", "sd", "q50", "q95", "q99", "min", "max"):
            col = f"{metric}_{stat}"
            values = per_k[col].astype(float)
            row[f"equal_k_{stat}"] = float(values.mean()) if values.notna().all() else None
        rows.append(row)
    return pd.DataFrame(rows)


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
    hist_frames = []
    detail_frames = []
    inputs = []
    for k in ks:
        src = cfg.curated_rows_path(k)
        inputs.append(src)
        acc = CellAccumulator(k, cfg)
        for batch in _iter_row_batches(src):
            acc.update(batch)
        summary = acc.summary(cfg)
        per_k_rows.append(summary)
        strategy_frames.append(acc.strategies.frame(k))
        for metric, hist in acc.hists.items():
            hist_frames.append(hist.frame(k, metric))
        if cfg.analysis.rare_event_detail:
            detail_frames.append(
                _rare_event_details(cfg, src, k, summary["rare_margin_threshold"])
            )
        logger.info(
            "game stats k=%d: %s games streamed (%d safety-limit)",
            k, f"{summary['games_attempted']:,}", summary["games_safety_limit"],
        )
    per_k = pd.DataFrame(per_k_rows)
    per_strategy = pd.concat(strategy_frames, ignore_index=True)
    hists = pd.concat(hist_frames, ignore_index=True)

    outputs = []

    def publish(frame: pd.DataFrame, name: str, operation: str) -> None:
        path = out_dir / name
        write_parquet_artifact_atomic(
            pa.Table.from_pandas(frame, preserve_index=False), path,
            producer="game_stats", scope="diagnostics",
            metadata={"operation": operation},
        )
        outputs.append(path)

    publish(per_k, "game_stats_by_k.parquet", "per_k_descriptive_summary")
    publish(per_strategy, "game_stats_per_strategy.parquet", "per_strategy_descriptive_summary")
    publish(hists, "game_stats_histograms.parquet", "streaming_histograms")
    publish(_across_k_frame(per_k), "game_stats_across_k.parquet", "equal_k_across_k_summary")
    if cfg.analysis.rare_event_detail and detail_frames:
        details = pd.concat(detail_frames, ignore_index=True)
        publish(details, "rare_event_details.parquet", "rare_event_per_game_details")

    global_stats = {
        "ks": ks,
        "games_attempted": int(per_k["games_attempted"].sum()),
        "games_completed": int(per_k["games_completed"].sum()),
        "games_safety_limit": int(per_k["games_safety_limit"].sum()),
        "equal_k_mean_n_rounds": float(per_k["n_rounds_mean"].mean()),
        "equal_k_mean_victory_margin": float(per_k["victory_margin_mean"].mean()),
        "multi_target_crossing_games": int(per_k["multi_target_crossing_games"].sum()),
        "interpretation": "descriptive_summaries_only",
    }
    global_path = out_dir / "game_stats_global.json"
    write_json_atomic(global_path, global_stats)
    outputs.append(global_path)
    write_stage_done(
        out_dir, "game_stats", inputs=inputs, outputs=outputs,
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
