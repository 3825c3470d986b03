"""Artifact substrate tests: atomic writes, manifests, sidecars, stamps."""

import json

import pyarrow as pa
import pytest

from farkle_ii_tpu.utils import manifest as mf
from farkle_ii_tpu.utils.artifacts import (
    ArtifactValidationError,
    make_sidecar,
    read_parquet_artifact,
    validate_sidecar,
    write_parquet_artifact_atomic,
)
from farkle_ii_tpu.utils.stage_completion import (
    StageState,
    resolve_stage_state,
    write_stage_done,
)
from farkle_ii_tpu.utils.writer import atomic_path, write_json_atomic


def test_atomic_path_publishes_and_cleans_up(tmp_path):
    dest = tmp_path / "x.txt"
    with atomic_path(dest) as tmp:
        open(tmp, "w").write("hello")
    assert dest.read_text() == "hello"
    with pytest.raises(RuntimeError):
        with atomic_path(dest) as tmp:
            open(tmp, "w").write("partial")
            raise RuntimeError("boom")
    assert dest.read_text() == "hello"  # untouched
    assert list(tmp_path.glob("*.tmp")) == []


def test_write_json_atomic(tmp_path):
    dest = tmp_path / "a.json"
    write_json_atomic(dest, {"b": 1, "a": 2})
    assert json.loads(dest.read_text()) == {"a": 2, "b": 1}


def test_manifest_append_and_read(tmp_path):
    path = tmp_path / "m.ndjson"
    run_id = mf.new_run_id()
    mf.append_manifest_event(path, "run_start", run_id=run_id, config_sha="abc")
    mf.append_manifest_line(path, {"kind": "shard", "name": "x.parquet"})
    records = list(mf.read_manifest(path))
    assert len(records) == 2
    assert records[0]["event"] == "run_start"
    assert records[0]["run_id"] == run_id
    assert records[1]["kind"] == "shard"
    # corrupt line rejected
    with open(path, "a") as f:
        f.write("{not json\n")
    with pytest.raises(ValueError, match="corrupt"):
        list(mf.read_manifest(path))


def test_sidecar_roundtrip_and_tamper_detection(tmp_path):
    table = pa.table({"x": [1, 2, 3]})
    path = tmp_path / "t.parquet"
    write_parquet_artifact_atomic(table, path, producer="unit", scope="by_k")
    side = validate_sidecar(path, expected_producer="unit")
    assert side["scope"] == "by_k"
    got = read_parquet_artifact(path, expected_producer="unit")
    assert got.num_rows == 3
    # tamper -> validation error
    path.write_bytes(path.read_bytes() + b"x")
    with pytest.raises(ArtifactValidationError, match="size mismatch"):
        validate_sidecar(path)
    with pytest.raises(ArtifactValidationError, match="producer"):
        write_parquet_artifact_atomic(table, path, producer="unit")
        validate_sidecar(path, expected_producer="other")


def test_stage_lifecycle_five_states(tmp_path):
    stage_dir = tmp_path
    out = tmp_path / "out.txt"

    assert resolve_stage_state(stage_dir, "s") == StageState.NOT_STARTED
    assert (
        resolve_stage_state(stage_dir, "s", has_partial_outputs=True)
        == StageState.PARTIAL_RESUMABLE
    )
    assert (
        resolve_stage_state(stage_dir, "s", blocked_by_cap=True)
        == StageState.BLOCKED_BY_CAP
    )

    out.write_text("data")
    write_stage_done(stage_dir, "s", outputs=[out], config_sha="c1", freshness_key={"v": 1})
    assert (
        resolve_stage_state(stage_dir, "s", config_sha="c1", freshness_key={"v": 1})
        == StageState.COMPLETE_VALID
    )
    # config drift -> stale
    assert (
        resolve_stage_state(stage_dir, "s", config_sha="c2", freshness_key={"v": 1})
        == StageState.COMPLETE_STALE
    )
    # freshness drift -> stale
    assert (
        resolve_stage_state(stage_dir, "s", config_sha="c1", freshness_key={"v": 2})
        == StageState.COMPLETE_STALE
    )
    # output byte drift -> stale
    out.write_text("tampered")
    assert (
        resolve_stage_state(stage_dir, "s", config_sha="c1", freshness_key={"v": 1})
        == StageState.COMPLETE_STALE
    )


def test_stage_stamp_binds_sidecars(tmp_path):
    out = tmp_path / "t.parquet"
    write_parquet_artifact_atomic(pa.table({"x": [1]}), out, producer="unit")
    write_stage_done(tmp_path, "s2", outputs=[out], config_sha="c")
    # editing only the sidecar also goes stale
    make_sidecar(out, producer="someone-else")
    assert (
        resolve_stage_state(tmp_path, "s2", config_sha="c") == StageState.COMPLETE_STALE
    )


def _double(x):
    return x * 2


def test_stage_parallel_policy_and_nesting():
    """Nested stages must not multiply workers (reference parallel.py:39)."""
    import os

    from farkle_ii_tpu.utils.parallel import (
        process_map,
        resolve_mp_context,
        resolve_stage_parallel_policy,
        stage_parallel_context,
    )

    policy = resolve_stage_parallel_policy("metrics", n_jobs=4, item_count=2)
    assert policy.workers == 2 and not policy.nested
    with stage_parallel_context(policy):
        assert os.environ["OMP_NUM_THREADS"] == str(policy.native_threads)
        inner = resolve_stage_parallel_policy("trueskill", n_jobs=8)
        assert inner.nested and inner.workers == 1 and inner.native_threads == 1
    again = resolve_stage_parallel_policy("x", n_jobs=3, item_count=10)
    assert not again.nested and again.workers == 3

    import pytest

    with pytest.raises(ValueError):
        resolve_mp_context("bogus")
    assert process_map(_double, [1, 2, 3], n_jobs=2, mp_start_method="spawn") == [2, 4, 6]
