"""Ingest stage: row shards -> one raw by-k parquet per player count.

Reference parity: ``/root/reference/src/farkle/analysis/ingest.py`` — streams
simulation row shards in manifest order (coordinate-validated), concatenates
them into ``{k}p_ingested_rows.raw.parquet`` under the ``by_k`` scope with a
hash-bound sidecar. Shard order follows the rows manifest; each shard's
sidecar is validated before reading so corrupt/tampered shards fail loudly.
"""

from __future__ import annotations

import logging

import pyarrow as pa
import pyarrow.parquet as pq

from farkle_ii_tpu.config import AppConfig, compute_stage_config_sha
from farkle_ii_tpu.utils.artifacts import validate_sidecar, write_parquet_artifact_atomic
from farkle_ii_tpu.utils.manifest import read_manifest
from farkle_ii_tpu.utils.parallel import (
    process_map,
    resolve_stage_parallel_policy,
    stage_parallel_context,
)
from farkle_ii_tpu.utils.stage_completion import (
    StageState,
    resolve_stage_state,
    write_stage_done,
)

logger = logging.getLogger(__name__)


def canonical_row_shards(cfg: AppConfig, k: int) -> list:
    """Manifest-ordered shard paths for one player count, sidecar-validated."""
    rows_dir = cfg.rows_dir(k)
    manifest = rows_dir / "rows_manifest.ndjson"
    if not manifest.exists():
        raise FileNotFoundError(
            f"rows manifest missing for k={k}: {manifest} (run simulation with "
            "sim.row_dir set)"
        )
    shards = []
    seen = set()
    for record in read_manifest(manifest):
        if record.get("kind") != "row_shard":
            continue
        if record.get("k") != k or record.get("root_seed") != cfg.sim.seed:
            raise ValueError(
                f"rows manifest entry has mismatched coordinates: {record}"
            )
        name = record["name"]
        if name in seen:
            continue  # replayed blocks re-append; latest bytes win, one read
        seen.add(name)
        path = rows_dir / name
        validate_sidecar(path, expected_producer="simulation")
        shards.append(path)
    shards.sort(key=lambda p: p.name)  # shuffle-lo order == coordinate order
    return shards


def _ingest_one(args: tuple[AppConfig, int, str, bool]) -> str:
    """Ingest one player count (module-level so process pools can pickle it)."""
    cfg, k, stage_sha, force = args
    out = cfg.ingested_rows_raw(k)
    stage_dir = out.parent
    state = resolve_stage_state(
        stage_dir, f"ingest_{k}p", config_sha=stage_sha,
        freshness_key=cfg.freshness_key(),
    )
    if state == StageState.COMPLETE_VALID and not force:
        return f"ingest k={k} up to date"
    shards = canonical_row_shards(cfg, k)
    tables = [pq.read_table(p) for p in shards]
    combined = pa.concat_tables(tables)
    write_parquet_artifact_atomic(
        combined, out, producer="ingest", scope="by_k",
        metadata={
            "k": k, "root_seed": cfg.sim.seed, "n_rows": combined.num_rows,
            "n_shards": len(shards),
        },
        compression=cfg.ingest.parquet_codec,
    )
    write_stage_done(
        stage_dir, f"ingest_{k}p",
        inputs=shards, outputs=[out],
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
    return f"ingest k={k}: {combined.num_rows} rows from {len(shards)} shards"


def run(cfg: AppConfig, *, force: bool = False) -> None:
    """Ingest all configured player counts (per-k fan-out under the stage
    parallel policy; reference analysis/ingest.py:30-36)."""
    stage_sha = compute_stage_config_sha(cfg, "ingest")
    ks = [int(k) for k in cfg.sim.n_players_list]
    policy = resolve_stage_parallel_policy(
        "ingest", n_jobs=cfg.ingest.n_jobs, item_count=len(ks)
    )
    with stage_parallel_context(policy):
        messages = process_map(
            _ingest_one,
            [(cfg, k, stage_sha, force) for k in ks],
            n_jobs=policy.workers,
            mp_start_method=cfg.sim.mp_start_method,
        )
    for message in messages:
        logger.info("%s", message)
