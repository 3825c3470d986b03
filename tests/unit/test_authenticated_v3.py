"""v3 authenticated sidecars, immutable manifests, lifecycle, finalization.

Reference parity: utils/authenticated_contract.py:823 (make), :966 (load),
:1023 (validate), :1200 (immutable publish), :1408 (classify), :1460
(finalize missing sidecar).
"""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from farkle_ii_tpu.utils import authenticated_contract as ac


@pytest.fixture()
def stage_id():
    return ac.StageIdentity(
        stage="test_stage", config_sha="cfg" * 8, freshness_sha="fresh" * 4,
        code_identity={"git_commit": "abc", "dirty": False, "dirty_fingerprint": None},
        run_lineage_sha="lineage" * 4,
    )


@pytest.fixture()
def artifact(tmp_path):
    p = tmp_path / "data.parquet"
    pq.write_table(pa.table({"a": [1, 2, 3]}), p)
    return p


def test_make_load_validate_roundtrip(artifact, stage_id):
    made = ac.make_authenticated_sidecar(
        artifact, stage_identity=stage_id,
        method_contract={"kind": "exact_counts"}, logical_operation="write_rows",
    )
    loaded = ac.load_authenticated_sidecar(artifact)
    assert loaded == made
    payload = ac.validate_authenticated_artifact(
        artifact, expected_stage_identity=stage_id,
        expected_sidecar_sha256=made["sidecar_contract_sha256"],
    )
    assert payload["artifact"]["schema_sha256"] is not None


def test_missing_vs_corrupt_distinguished(artifact, stage_id):
    with pytest.raises(ac.MissingSidecarError):
        ac.load_authenticated_sidecar(artifact)
    ac.make_authenticated_sidecar(artifact, stage_identity=stage_id)
    sc = ac.auth_sidecar_path(artifact)
    payload = json.loads(sc.read_text())
    payload["artifact"]["byte_length"] += 1  # tamper: digest no longer matches
    sc.write_text(json.dumps(payload))
    with pytest.raises(ac.CorruptSidecarError):
        ac.load_authenticated_sidecar(artifact)


def test_tampered_artifact_fails_closed(artifact, stage_id):
    ac.make_authenticated_sidecar(artifact, stage_identity=stage_id)
    pq.write_table(pa.table({"a": [9, 9, 9]}), artifact)
    with pytest.raises(ac.ArtifactMismatchError, match="drifted"):
        ac.validate_authenticated_artifact(artifact)


def test_wrong_stage_identity_fails(artifact, stage_id):
    ac.make_authenticated_sidecar(artifact, stage_identity=stage_id)
    other = ac.StageIdentity(stage="other", config_sha="x", freshness_sha="y")
    with pytest.raises(ac.ArtifactMismatchError, match="stage identity"):
        ac.validate_authenticated_artifact(artifact, expected_stage_identity=other)


def test_source_chain_binding(tmp_path, artifact, stage_id):
    src = tmp_path / "upstream.parquet"
    pq.write_table(pa.table({"u": [1]}), src)
    ac.make_authenticated_sidecar(src, stage_identity=stage_id)
    ac.make_authenticated_sidecar(
        artifact, stage_identity=stage_id, sources={"rows": src}
    )
    ac.validate_authenticated_artifact(artifact, source_paths={"rows": src})
    # upstream drift (bytes + re-authenticated sidecar) breaks the binding
    pq.write_table(pa.table({"u": [2]}), src)
    ac.make_authenticated_sidecar(src, stage_identity=stage_id)
    with pytest.raises(ac.ArtifactMismatchError, match="upstream"):
        ac.validate_authenticated_artifact(artifact, source_paths={"rows": src})


def test_immutable_manifest_publish_verify(tmp_path, stage_id):
    path = tmp_path / "rows_manifest.v3.ndjson"
    entries = [
        {"k": 2, "shuffle_lo": 0, "n_rows": 10},
        {"k": 2, "shuffle_lo": 16, "n_rows": 10},
        {"k": 3, "shuffle_lo": 0, "n_rows": 12},
    ]
    payload = ac.publish_immutable_manifest_atomic(
        path, entries, stage_identity=stage_id, coordinate_fields=("k", "shuffle_lo")
    )
    assert payload["entry_count"] == 3
    ac.verify_immutable_manifest(path)

    # appending a line invalidates the root
    with path.open("a") as f:
        f.write('{"k": 4, "shuffle_lo": 0, "n_rows": 1}\n')
    with pytest.raises(ac.ArtifactMismatchError):
        ac.verify_immutable_manifest(path)


def test_immutable_manifest_rejects_unordered(tmp_path, stage_id):
    path = tmp_path / "m.ndjson"
    entries = [{"k": 3, "s": 0}, {"k": 2, "s": 0}]
    with pytest.raises(ValueError, match="strictly increasing"):
        ac.publish_immutable_manifest_atomic(
            path, entries, stage_identity=stage_id, coordinate_fields=("k", "s")
        )
    assert not path.exists()


def test_lifecycle_classification(tmp_path, artifact, stage_id):
    completion = tmp_path / "stage.completion.json"
    outputs = {"table": artifact}
    # nothing exists -> not_started (artifact exists, so partial)
    assert ac.classify_authenticated_lifecycle(
        completion, expected_stage_identity=stage_id, required_outputs=outputs,
    ) == "partial_resumable"
    assert ac.classify_authenticated_lifecycle(
        tmp_path / "nothing.json", expected_stage_identity=stage_id,
        required_outputs={"t": tmp_path / "absent.parquet"},
    ) == "not_started"

    ac.make_authenticated_sidecar(artifact, stage_identity=stage_id)
    ac.write_authenticated_completion(
        completion, stage_identity=stage_id, outputs=outputs
    )
    assert ac.classify_authenticated_lifecycle(
        completion, expected_stage_identity=stage_id, required_outputs=outputs,
    ) == "complete_valid"

    # stage identity drift -> stale
    other = ac.StageIdentity(stage="test_stage", config_sha="new", freshness_sha="f")
    assert ac.classify_authenticated_lifecycle(
        completion, expected_stage_identity=other, required_outputs=outputs,
    ) == "complete_stale"

    # artifact drift -> stale
    pq.write_table(pa.table({"a": [7]}), artifact)
    assert ac.classify_authenticated_lifecycle(
        completion, expected_stage_identity=stage_id, required_outputs=outputs,
    ) == "complete_stale"


def test_blocked_by_cap_state(tmp_path, artifact, stage_id):
    ac.make_authenticated_sidecar(artifact, stage_identity=stage_id)
    completion = tmp_path / "c.json"
    ac.write_authenticated_completion(
        completion, stage_identity=stage_id, outputs={"t": artifact},
        state="blocked_by_cap",
    )
    assert ac.classify_authenticated_lifecycle(
        completion, expected_stage_identity=stage_id, required_outputs={"t": artifact},
    ) == "blocked_by_cap"


def test_finalize_missing_sidecar(tmp_path, artifact, stage_id):
    made = ac.make_authenticated_sidecar(artifact, stage_identity=stage_id)
    completion = ac.write_authenticated_completion(
        tmp_path / "c.json", stage_identity=stage_id, outputs={"t": artifact}
    )
    out_entry = completion["outputs"]["t"]
    sc = ac.auth_sidecar_path(artifact)
    sc.unlink()

    # reconstructable only from the exact completion-bound payload
    restored = ac.finalize_missing_sidecar_atomic(
        artifact, expected_sidecar_payload=made, completion_output=out_entry
    )
    assert restored == made
    ac.validate_authenticated_artifact(artifact)

    # present sidecar: validated, never replaced
    again = ac.finalize_missing_sidecar_atomic(
        artifact, expected_sidecar_payload=made, completion_output=out_entry
    )
    assert again["sidecar_contract_sha256"] == made["sidecar_contract_sha256"]

    # a doctored payload is rejected
    sc.unlink()
    fake = dict(made)
    fake["method_contract"] = {"kind": "forged"}
    with pytest.raises(ac.AuthenticatedContractError):
        ac.finalize_missing_sidecar_atomic(
            artifact, expected_sidecar_payload=fake, completion_output=out_entry
        )
    assert not sc.exists()


def test_stamps_record_code_identity_and_lineage(tmp_path):
    from farkle_ii_tpu.utils.stage_completion import run_lineage, write_stage_done

    with run_lineage("abc123"):
        p = write_stage_done(tmp_path, "s1", config_sha="c")
    stamp = json.loads(p.read_text())
    assert stamp["run_lineage_sha"] == "abc123"
    assert "code_identity" in stamp and "git_commit" in stamp["code_identity"]


def test_republished_sidecar_cannot_bless_altered_bytes(artifact, stage_id, tmp_path):
    """An attacker who alters the artifact and REGENERATES a fresh internally
    consistent sidecar must still fail validation against the recorded
    binding (the completion stamp pins the sidecar contract sha)."""
    original = ac.make_authenticated_sidecar(artifact, stage_identity=stage_id)
    pinned = original["sidecar_contract_sha256"]
    pq.write_table(pa.table({"a": [9, 9, 9]}), artifact)
    republished = ac.make_authenticated_sidecar(artifact, stage_identity=stage_id)
    # the fresh sidecar is self-consistent on its own...
    ac.validate_authenticated_artifact(artifact, expected_stage_identity=stage_id)
    # ...but can never match the pinned contract binding
    assert republished["sidecar_contract_sha256"] != pinned
    with pytest.raises(ac.ArtifactMismatchError, match="expected binding"):
        ac.validate_authenticated_artifact(
            artifact, expected_sidecar_sha256=pinned
        )


def test_schema_nullability_changes_artifact_identity(tmp_path):
    """Two parquet files with identical values but different arrow
    nullability must carry different schema identities (a schema-level
    tamper cannot hide behind equal values)."""
    a = tmp_path / "a.parquet"
    b = tmp_path / "b.parquet"
    field_nullable = pa.schema([pa.field("x", pa.int64(), nullable=True)])
    field_required = pa.schema([pa.field("x", pa.int64(), nullable=False)])
    pq.write_table(pa.table({"x": [1, 2]}, schema=field_nullable), a)
    pq.write_table(pa.table({"x": [1, 2]}, schema=field_required), b)
    ia = ac.artifact_identity(a)
    ib = ac.artifact_identity(b)
    assert ia["schema_sha256"] != ib["schema_sha256"]
    assert ia["content_sha256"] != ib["content_sha256"]


def test_source_role_cannot_be_satisfied_by_swapped_files(tmp_path, artifact, stage_id):
    """Swapping two validly bound upstream sources between their roles must
    fail: bindings are per-role, not a bag of hashes."""
    src1 = tmp_path / "rows.parquet"
    src2 = tmp_path / "metrics.parquet"
    pq.write_table(pa.table({"r": [1]}), src1)
    pq.write_table(pa.table({"m": [2]}), src2)
    ac.make_authenticated_sidecar(
        artifact, stage_identity=stage_id,
        sources={"rows": src1, "metrics": src2},
    )
    ac.validate_authenticated_artifact(
        artifact, source_paths={"rows": src1, "metrics": src2}
    )
    with pytest.raises(ac.ArtifactMismatchError, match="drifted"):
        ac.validate_authenticated_artifact(
            artifact, source_paths={"rows": src2, "metrics": src1}
        )


def test_unknown_source_role_fails_closed(tmp_path, artifact, stage_id):
    src = tmp_path / "src.parquet"
    pq.write_table(pa.table({"s": [1]}), src)
    ac.make_authenticated_sidecar(artifact, stage_identity=stage_id)
    with pytest.raises(ac.ArtifactMismatchError, match="not bound"):
        ac.validate_authenticated_artifact(artifact, source_paths={"rows": src})


def test_method_contract_edit_is_detected(artifact, stage_id):
    """Editing the recorded method contract inside the sidecar JSON (e.g.
    claiming a different test statistic) must classify as corruption."""
    ac.make_authenticated_sidecar(
        artifact, stage_identity=stage_id,
        method_contract={"kind": "wilson_ci", "confidence": 0.95},
    )
    sc = ac.auth_sidecar_path(artifact)
    payload = json.loads(sc.read_text())
    payload["method_contract"]["confidence"] = 0.5
    sc.write_text(json.dumps(payload))
    with pytest.raises(ac.CorruptSidecarError, match="digest"):
        ac.validate_authenticated_artifact(artifact)


def test_schema_false_declaration_rejected(tmp_path, stage_id):
    """A sidecar recorded for one Arrow schema must not validate bytes
    whose actual schema differs, even at equal byte content claims
    (reference test_actual_arrow_schema_rejects_false_declarations)."""
    a = tmp_path / "a.parquet"
    pq.write_table(pa.table({"a": pa.array([1, 2], type=pa.int64())}), a)
    made = ac.make_authenticated_sidecar(a, stage_identity=stage_id)
    # rewrite with a different schema (nullability/type change)
    pq.write_table(pa.table({"a": pa.array([1, 2], type=pa.int32())}), a)
    with pytest.raises(ac.ArtifactMismatchError):
        ac.validate_authenticated_artifact(
            a, expected_sidecar_sha256=made["sidecar_contract_sha256"]
        )


def test_sidecar_contract_sha_is_not_self_asserted(artifact, stage_id):
    """The sidecar's own contract hash is recomputed from its fields — a
    tamperer cannot edit fields AND the recorded hash to match, because
    the validator recomputes it (reference
    test_sidecar_contract_hash_is_not_a_self_asserted_free_field)."""
    made = ac.make_authenticated_sidecar(artifact, stage_identity=stage_id)
    sc = ac.auth_sidecar_path(artifact)
    payload = json.loads(sc.read_text())
    payload["logical_operation"] = "forged_op"
    # forge the self-declared hash to match the edited payload
    forged = dict(payload)
    forged.pop("sidecar_contract_sha256", None)
    payload["sidecar_contract_sha256"] = ac.canonical_json_sha(forged)
    sc.write_text(json.dumps(payload))
    with pytest.raises(ac.AuthenticatedContractError):
        ac.validate_authenticated_artifact(
            artifact, expected_sidecar_sha256=made["sidecar_contract_sha256"]
        )


def test_expected_sidecar_sha_pins_the_exact_contract(artifact, stage_id):
    """A downstream consumer pinning a sidecar sha must reject any other
    (even internally consistent) sidecar for the same bytes."""
    made = ac.make_authenticated_sidecar(
        artifact, stage_identity=stage_id, logical_operation="first",
    )
    first_sha = made["sidecar_contract_sha256"]
    # republish a DIFFERENT but self-consistent sidecar for the same bytes
    remade = ac.make_authenticated_sidecar(
        artifact, stage_identity=stage_id, logical_operation="second",
    )
    assert remade["sidecar_contract_sha256"] != first_sha
    ac.validate_authenticated_artifact(
        artifact, expected_sidecar_sha256=remade["sidecar_contract_sha256"]
    )
    with pytest.raises(ac.ArtifactMismatchError):
        ac.validate_authenticated_artifact(
            artifact, expected_sidecar_sha256=first_sha
        )


def test_manifest_root_binds_entry_order_and_content(tmp_path, stage_id):
    """The immutable-manifest root must change when any entry's identity
    or the streaming order changes (reference
    test_manifest_root_is_streaming_ordered_and_binds_all_entry_identities)."""
    m1 = tmp_path / "m1.ndjson"
    lines = [
        json.dumps({"name": "s1", "sha256": "a" * 64, "coordinate": [0]}),
        json.dumps({"name": "s2", "sha256": "b" * 64, "coordinate": [1]}),
    ]
    m1.write_text("\n".join(lines) + "\n")
    r1 = ac.compute_manifest_root(m1)
    m2 = tmp_path / "m2.ndjson"
    m2.write_text("\n".join(reversed(lines)) + "\n")
    assert ac.compute_manifest_root(m2) != r1
    m3 = tmp_path / "m3.ndjson"
    tampered = [lines[0].replace("a" * 64, "c" * 64), lines[1]]
    m3.write_text("\n".join(tampered) + "\n")
    assert ac.compute_manifest_root(m3) != r1
