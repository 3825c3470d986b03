"""Authenticated-contract v3 primitive tests."""

from farkle_ii_tpu.utils.authenticated_contract import (
    CodeIdentity,
    canonical_json_sha,
    compute_manifest_root,
    resolve_code_identity,
)
from farkle_ii_tpu.utils.manifest import append_manifest_line


def test_canonical_json_sha_stable():
    assert canonical_json_sha({"b": 1, "a": [2, 3]}) == canonical_json_sha(
        {"a": [2, 3], "b": 1}
    )
    assert canonical_json_sha({"a": 1}) != canonical_json_sha({"a": 2})


def test_code_identity_resolves_in_repo():
    identity = resolve_code_identity("/root/repo")
    assert isinstance(identity, CodeIdentity)
    assert identity.git_commit is None or len(identity.git_commit) == 40


def test_manifest_root_detects_edits(tmp_path):
    path = tmp_path / "m.ndjson"
    empty = compute_manifest_root(path)
    append_manifest_line(path, {"a": 1})
    one = compute_manifest_root(path)
    append_manifest_line(path, {"b": 2})
    two = compute_manifest_root(path)
    assert len({empty, one, two}) == 3
    # reordering records changes the root
    reordered = tmp_path / "m2.ndjson"
    append_manifest_line(reordered, {"b": 2})
    append_manifest_line(reordered, {"a": 1})
    assert compute_manifest_root(reordered) != two
