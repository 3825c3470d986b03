"""Parquet validators between pipeline phases.

Reference parity (``/root/reference/src/farkle/analysis/checks.py``): winner
column presence, non-negative counter sweeps, and manifest/row-count
consistency checks run before metrics and after combine.
"""

from __future__ import annotations

import json
import logging

import pyarrow.compute as pc
import pyarrow.parquet as pq

from farkle_ii_tpu.config import AppConfig
from farkle_ii_tpu.utils.schema_helpers import n_players_from_schema

logger = logging.getLogger(__name__)

_COUNTER_SUFFIXES = (
    "farkles", "rolls", "highest_turn", "smart_five_uses", "n_smart_five_dice",
    "smart_one_uses", "n_smart_one_dice", "hot_dice", "n_turns", "score",
)


def scan_negative_columns(table, columns) -> list[str]:
    """Return column names containing negative values."""
    bad = []
    for name in columns:
        if name not in table.schema.names:
            continue
        minimum = pc.min(table[name]).as_py()
        if minimum is not None and minimum < 0:
            bad.append(name)
    return bad


def check_pre_metrics(cfg: AppConfig, k: int) -> None:
    """Validate one curated by-k table before metric computation."""
    path = cfg.curated_rows_path(k)
    table = pq.read_table(path)
    if "winner_seat" not in table.schema.names:
        raise ValueError(f"{path} lacks the winner_seat column")
    if n_players_from_schema(table.schema) != k:
        raise ValueError(f"{path} seat columns disagree with k={k}")
    counters = [
        f"P{s}_{suffix}" for s in range(1, k + 1) for suffix in _COUNTER_SUFFIXES
    ]
    bad = scan_negative_columns(table, counters)
    if bad:
        raise ValueError(f"{path} contains negative counters: {bad}")
    completed = pc.sum(
        pc.cast(pc.equal(table["termination_status"], "completed"), "int64")
    ).as_py()
    winners = pc.sum(pc.cast(pc.is_valid(table["winner_seat"]), "int64")).as_py()
    if completed != winners:
        raise ValueError(
            f"{path}: {completed} completed rows but {winners} winner fields"
        )
    # row count must match the curate manifest
    manifest = path.with_suffix(".manifest.json")
    if manifest.exists():
        recorded = json.loads(manifest.read_text())["n_rows"]
        if recorded != table.num_rows:
            raise ValueError(
                f"{path}: manifest records {recorded} rows, table has {table.num_rows}"
            )


def check_post_combine(cfg: AppConfig) -> None:
    """Validate the concat_ks union against its per-k sources."""
    combined = pq.read_table(cfg.combined_rows_path())
    total = 0
    for k in sorted(int(k) for k in cfg.sim.n_players_list):
        src = pq.read_table(cfg.curated_rows_path(k))
        subset = combined.filter(pc.equal(combined["k"], k))
        if subset.num_rows != src.num_rows:
            raise ValueError(
                f"combine k={k}: {subset.num_rows} rows != source {src.num_rows}"
            )
        total += src.num_rows
    if combined.num_rows != total:
        raise ValueError(
            f"combine union has {combined.num_rows} rows, sources total {total}"
        )
