"""Curate stage: finalize raw by-k rows under the analysis schema contract.

Reference parity: ``/root/reference/src/farkle/analysis/curate.py`` — checks
the ingested table against the expected per-k schema, republishes it at the
curated path with a sidecar, and writes a JSON manifest carrying row count
and schema hash for downstream consistency checks.
"""

from __future__ import annotations

import hashlib
import logging


from farkle_ii_tpu.config import AppConfig, compute_stage_config_sha
from farkle_ii_tpu.utils.artifacts import (
    read_parquet_artifact,
    write_parquet_artifact_atomic,
)
from farkle_ii_tpu.utils.schema_helpers import raw_simulation_schema_for
from farkle_ii_tpu.utils.stage_completion import (
    StageState,
    resolve_stage_state,
    write_stage_done,
)
from farkle_ii_tpu.utils.writer import write_json_atomic

logger = logging.getLogger(__name__)


def schema_hash(schema) -> str:
    return hashlib.sha256(schema.serialize().to_pybytes()).hexdigest()


def curated_manifest_path(cfg: AppConfig, k: int):
    return cfg.curated_rows_path(k).with_suffix(".manifest.json")


def run(cfg: AppConfig, *, force: bool = False) -> None:
    stage_sha = compute_stage_config_sha(cfg, "curate")
    for k in cfg.sim.n_players_list:
        k = int(k)
        src = cfg.ingested_rows_raw(k)
        out = cfg.curated_rows_path(k)
        state = resolve_stage_state(
            out.parent, f"curate_{k}p", config_sha=stage_sha,
            freshness_key=cfg.freshness_key(),
        )
        if state == StageState.COMPLETE_VALID and not force:
            logger.info("curate k=%d up to date", k)
            continue
        table = read_parquet_artifact(src, expected_producer="ingest")
        expected = raw_simulation_schema_for(k)
        if not table.schema.equals(expected):
            missing = set(expected.names) - set(table.schema.names)
            extra = set(table.schema.names) - set(expected.names)
            raise ValueError(
                f"curate k={k}: schema mismatch (missing={sorted(missing)}, "
                f"extra={sorted(extra)})"
            )
        write_parquet_artifact_atomic(
            table, out, producer="curate", scope="by_k",
            metadata={"k": k, "n_rows": table.num_rows},
            compression=cfg.ingest.parquet_codec,
        )
        write_json_atomic(
            curated_manifest_path(cfg, k),
            {
                "k": k,
                "root_seed": cfg.sim.seed,
                "n_rows": table.num_rows,
                "schema_sha256": schema_hash(table.schema),
            },
        )
        write_stage_done(
            out.parent, f"curate_{k}p",
            inputs=[src], outputs=[out, curated_manifest_path(cfg, k)],
            config_sha=stage_sha, freshness_key=cfg.freshness_key(),
        )
        logger.info("curate k=%d: %d rows", k, table.num_rows)
