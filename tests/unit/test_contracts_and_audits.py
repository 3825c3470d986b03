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


def test_method_contract_tagged_union(tmp_path):
    """Sidecars carry validated method contracts, k-support, and seed scope."""
    import pyarrow as pa
    import pytest

    from farkle_ii_tpu.utils.artifacts import (
        ArtifactValidationError,
        method_contract,
        read_parquet_artifact,
        load_sidecar,
        validate_sidecar,
        write_parquet_artifact_atomic,
    )

    table = pa.table({"x": [1, 2, 3]})
    path = tmp_path / "est.parquet"
    write_parquet_artifact_atomic(
        table, path, producer="performance", scope="by_k",
        k_support=[3, 2], seed_scope="single_seed",
        method=method_contract("wilson_ci", confidence=0.95),
    )
    side = validate_sidecar(path, expected_producer="performance")
    assert side["k_support"] == [2, 3]
    assert side["seed_scope"] == "single_seed"
    assert side["method"] == {"kind": "wilson_ci", "params": {"confidence": 0.95}}
    assert read_parquet_artifact(path).num_rows == 3

    # unknown kinds and missing params are rejected at publication time
    with pytest.raises(ValueError):
        method_contract("made_up_method")
    with pytest.raises(ValueError):
        method_contract("bootstrap", n_resamples=400)
    with pytest.raises(ValueError):
        write_parquet_artifact_atomic(
            table, tmp_path / "bad.parquet", producer="x", seed_scope="triple"
        )

    # a corrupted method payload is caught on read
    import json

    sc = path.with_name(path.name + ".sidecar.json")
    payload = json.loads(sc.read_text())
    payload["method"] = {"kind": "wilson_ci", "params": {}}
    sc.write_text(json.dumps(payload))
    with pytest.raises(ArtifactValidationError):
        validate_sidecar(path)


def test_retry_transient_io(caplog):
    import logging

    import pytest

    from farkle_ii_tpu.utils.artifacts import retry_transient_io

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("disk hiccup")
        return "done"

    with caplog.at_level(logging.WARNING):
        assert retry_transient_io(flaky, base_delay=0.001) == "done"
    assert calls["n"] == 3

    # non-OSErrors propagate immediately
    def broken():
        calls["n"] += 1
        raise ValueError("logic bug")

    calls["n"] = 0
    with pytest.raises(ValueError):
        retry_transient_io(broken, base_delay=0.001)
    assert calls["n"] == 1
