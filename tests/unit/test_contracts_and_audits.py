"""Contract linters + audits wired into the test suite (reference pattern)."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent.parent


def test_rng_contract_linter_clean():
    result = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "check_rng_contract.py")],
        capture_output=True, text=True,
    )
    assert result.returncode == 0, result.stdout + result.stderr


def test_terminology_linter_clean():
    result = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "check_terminology.py")],
        capture_output=True, text=True,
    )
    assert result.returncode == 0, result.stdout + result.stderr


def test_release_audit_configs():
    from farkle_ii_tpu.analysis.release_audit import (
        audit_retired_entry_points,
        audit_runnable_configs,
    )

    assert audit_runnable_configs(REPO / "configs") == []
    assert audit_retired_entry_points() == []


def test_release_audit_sidecars(tmp_path):
    import pyarrow as pa

    from farkle_ii_tpu.analysis.release_audit import audit_sidecar_completeness
    from farkle_ii_tpu.utils.artifacts import write_parquet_artifact_atomic

    good = tmp_path / "good.parquet"
    write_parquet_artifact_atomic(pa.table({"x": [1]}), good, producer="t")
    assert audit_sidecar_completeness(tmp_path) == []
    # orphan parquet fails the sweep
    bad = tmp_path / "bad.parquet"
    bad.write_bytes(good.read_bytes())
    failures = audit_sidecar_completeness(tmp_path)
    assert len(failures) == 1 and "bad.parquet" in failures[0]


def test_migration_audit(tmp_path):
    from farkle_ii_tpu import config as C
    from farkle_ii_tpu.analysis.migration_audit import run as run_audit

    cfg = C.AppConfig()
    cfg.data_dir = str(tmp_path)
    cfg.results_root.mkdir(parents=True)
    (cfg.results_root / "old_checkpoint.pkl").write_bytes(b"")
    (cfg.results_root / "2p_checkpoint.pkl").write_bytes(b"x")
    (cfg.results_root / "orphan.parquet").write_bytes(b"x")
    report = run_audit(cfg)
    rules = {f["rule"] for f in report["findings"]}
    assert "legacy_pickle_checkpoints" in rules
    assert "sidecarless_parquet" in rules
    assert report["policy"].startswith("inventory_only")


def test_progress_logger(caplog):
    import logging

    from farkle_ii_tpu.utils.progress import ProgressLogConfig, ScheduledProgressLogger

    log = logging.getLogger("test_progress")
    with caplog.at_level(logging.INFO, logger="test_progress"):
        p = ScheduledProgressLogger(
            100, unit="games",
            config=ProgressLogConfig(frequent_interval_seconds=0.0),
            log=log,
        )
        p.update(10)
        p.update(50)
        p.finish()
    assert sum("progress:" in r.message for r in caplog.records) >= 2
