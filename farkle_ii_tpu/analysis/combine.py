"""Combine stage: row-preserving concat_ks union across player counts.

Reference parity: ``/root/reference/src/farkle/analysis/combine.py`` — pads
each curated per-k table with the missing later-seat columns up to the
``combine.max_players`` rectangular schema, concatenates all k cells into
``all_ingested_rows.parquet`` under ``concat_ks``, and *proves* row-stream
identity between sources and output (row counts per k and winner tallies
must survive the union untouched).
"""

from __future__ import annotations

import logging

import pyarrow as pa
import pyarrow.compute as pc

from farkle_ii_tpu.config import AppConfig, compute_stage_config_sha
from farkle_ii_tpu.utils.artifacts import (
    read_parquet_artifact,
    write_parquet_artifact_atomic,
)
from farkle_ii_tpu.utils.schema_helpers import expected_schema_for
from farkle_ii_tpu.utils.stage_completion import (
    StageState,
    resolve_stage_state,
    write_stage_done,
)

logger = logging.getLogger(__name__)


def pad_to_schema(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Add all-null columns for fields absent from ``table`` and cast."""
    columns = []
    for fld in target:
        if fld.name in table.schema.names:
            columns.append(table[fld.name].cast(fld.type))
        else:
            columns.append(pa.nulls(table.num_rows, type=fld.type))
    return pa.table(dict(zip(target.names, columns)))


def assert_row_stream_identity(
    sources: dict[int, pa.Table], combined: pa.Table
) -> None:
    """Prove the union preserved every source row (counts + outcome tallies)."""
    total = sum(t.num_rows for t in sources.values())
    if combined.num_rows != total:
        raise ValueError(
            f"combine row-count mismatch: {combined.num_rows} != {total}"
        )
    for k, src in sources.items():
        mask = pc.equal(combined["k"], pa.scalar(k, combined["k"].type))
        sub = combined.filter(mask)
        if sub.num_rows != src.num_rows:
            raise ValueError(f"combine k={k} row-count mismatch")
        for col in ("winning_score", "n_rounds"):
            a = pc.sum(src[col]).as_py() or 0
            b = pc.sum(sub[col]).as_py() or 0
            if a != b:
                raise ValueError(f"combine k={k} column {col} sum mismatch")


def run(cfg: AppConfig, *, force: bool = False) -> None:
    stage_sha = compute_stage_config_sha(cfg, "combine")
    out = cfg.combined_rows_path()
    state = resolve_stage_state(
        out.parent, "combine", config_sha=stage_sha, freshness_key=cfg.freshness_key()
    )
    if state == StageState.COMPLETE_VALID and not force:
        logger.info("combine up to date")
        return
    ks = sorted(int(k) for k in cfg.sim.n_players_list)
    max_k = min(max(ks), cfg.combine.max_players)
    target = expected_schema_for(max_k)
    sources: dict[int, pa.Table] = {}
    inputs = []
    padded = []
    for k in ks:
        if k > cfg.combine.max_players:
            logger.warning("combine: skipping k=%d > combine.max_players", k)
            continue
        src_path = cfg.curated_rows_path(k)
        table = read_parquet_artifact(src_path, expected_producer="curate")
        sources[k] = table
        inputs.append(src_path)
        padded.append(pad_to_schema(table, target))
    combined = pa.concat_tables(padded)
    assert_row_stream_identity(sources, combined)
    write_parquet_artifact_atomic(
        combined, out, producer="combine", scope="concat_ks",
        metadata={"ks": ks, "n_rows": combined.num_rows, "max_k": max_k},
        compression=cfg.ingest.parquet_codec,
    )
    write_stage_done(
        out.parent, "combine", inputs=inputs, outputs=[out],
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
    from farkle_ii_tpu.analysis.checks import check_post_combine

    check_post_combine(cfg)
    logger.info("combine: %d rows over k=%s", combined.num_rows, ks)
