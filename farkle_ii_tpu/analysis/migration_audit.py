"""Inventory retired on-disk artifacts without reading or deleting them.

Reference parity (``/root/reference/src/farkle/analysis/migration_audit.py``):
glob rules describe artifact layouts from retired schema generations; the
audit lists any matches into ``migration_report.json`` so operators can
migrate or purge deliberately — the pipeline itself never touches them.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path

from farkle_ii_tpu.config import AppConfig
from farkle_ii_tpu.utils.writer import write_json_atomic

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class RetiredArtifactRule:
    name: str
    glob: str
    guidance: str


RETIRED_ARTIFACT_RULES: tuple[RetiredArtifactRule, ...] = (
    RetiredArtifactRule(
        name="legacy_pickle_checkpoints",
        glob="**/*_checkpoint.pkl",
        guidance="superseded by exact per-block .npz aggregates under blocks/",
    ),
    RetiredArtifactRule(
        name="unversioned_row_shards",
        glob="**/rows_*.csv",
        guidance="row shards are outcome-schema-v2 parquet with sidecars",
    ),
    RetiredArtifactRule(
        name="sidecarless_parquet",
        glob="**/*.parquet",
        guidance="every published parquet requires an adjacent .sidecar.json",
    ),
)


def migration_report_path(cfg: AppConfig) -> Path:
    return cfg.results_root / "migration_report.json"


def run(cfg: AppConfig, *, force: bool = False) -> dict:
    """Scan the results tree for retired artifacts; write the report."""
    del force
    root = cfg.results_root
    findings: list[dict] = []
    for rule in RETIRED_ARTIFACT_RULES:
        for path in sorted(root.glob(rule.glob)):
            if rule.name == "sidecarless_parquet":
                if Path(str(path) + ".sidecar.json").exists():
                    continue
            findings.append(
                {
                    "rule": rule.name,
                    "path": str(path.relative_to(root)),
                    "guidance": rule.guidance,
                }
            )
    report = {
        "results_root": str(root),
        "finding_count": len(findings),
        "findings": findings,
        "policy": "inventory_only_nothing_deleted_or_read",
    }
    write_json_atomic(migration_report_path(cfg), report)
    return report
