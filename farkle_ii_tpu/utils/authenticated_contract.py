"""Additive v3 authentication primitives.

Reference parity (``/root/reference/src/farkle/utils/authenticated_contract.py``):

* canonical JSON identity hashing and a ``CodeIdentity`` resolved from the
  git commit plus a dirty-tree fingerprint;
* Merkle-style roots over NDJSON manifests (append-order chained hashes);
* **authenticated sidecars** (``:823 make``, ``:966 load``, ``:1023
  validate``): a self-digesting ``<artifact>.auth.json`` binding artifact
  bytes + schema, the producing stage's identity (scoped config sha,
  freshness sha, code identity, run lineage), the tagged method contract,
  and the upstream source chain — loaded fail-closed with missing/corrupt
  distinguished;
* **immutable-manifest publish** (``:1200``): canonical, coordinate-ordered
  NDJSON staged and atomically published together with a root-hash sidecar,
  so a finished shard log can never be silently appended to or reordered;
* **lifecycle classification** (``:1408``): exactly one of the five
  canonical states from an authenticated completion record whose outputs
  are each re-validated against their sidecars;
* **missing-sidecar finalization** (``:1460``): reconstruct only a genuinely
  missing sidecar, and only when the completion record already names its
  exact canonical bytes; present sidecars are validated, never replaced.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import tempfile
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Any, Iterable, Mapping, Sequence

from farkle_ii_tpu.utils.artifacts import retry_transient_io, sha256_file
from farkle_ii_tpu.utils.manifest import read_manifest
from farkle_ii_tpu.utils.writer import write_json_atomic

AUTH_CONTRACT_VERSION = 3
MANIFEST_CONTRACT_VERSION = 1


class AuthenticatedContractError(RuntimeError):
    """Any authenticated-contract validation failure (fail closed)."""


class MissingSidecarError(AuthenticatedContractError):
    """The sidecar file is absent (distinct from present-but-corrupt)."""


class CorruptSidecarError(AuthenticatedContractError):
    """The sidecar exists but cannot be parsed or fails its own digest."""


class ArtifactMismatchError(AuthenticatedContractError):
    """Artifact bytes/schema/provenance do not match the sidecar."""


def canonical_json_sha(payload: Any) -> str:
    """Content identity of any JSON-serializable payload."""
    encoded = json.dumps(
        payload, sort_keys=True, separators=(",", ":"), default=str
    ).encode()
    return hashlib.sha256(encoded).hexdigest()


@dataclass(frozen=True)
class CodeIdentity:
    """Provenance of the code that produced an artifact."""

    git_commit: str | None
    dirty: bool
    dirty_fingerprint: str | None

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)


def resolve_code_identity(repo_root: str | Path | None = None) -> CodeIdentity:
    """Resolve the current git commit + a sha over uncommitted changes."""
    cwd = str(repo_root) if repo_root else None
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            check=True, cwd=cwd,
        ).stdout.strip()
        status = subprocess.run(
            ["git", "status", "--porcelain"], capture_output=True, text=True,
            check=True, cwd=cwd,
        ).stdout
    except (subprocess.CalledProcessError, FileNotFoundError):
        return CodeIdentity(git_commit=None, dirty=False, dirty_fingerprint=None)
    if not status.strip():
        return CodeIdentity(git_commit=commit, dirty=False, dirty_fingerprint=None)
    diff = subprocess.run(
        ["git", "diff", "HEAD"], capture_output=True, text=True, cwd=cwd
    ).stdout
    fingerprint = hashlib.sha256((status + diff).encode()).hexdigest()
    return CodeIdentity(git_commit=commit, dirty=True, dirty_fingerprint=fingerprint)


def compute_manifest_root(path: str | Path) -> str:
    """Merkle-style root over an NDJSON manifest's records, in append order.

    Each record hashes to a leaf; the root chains ``H(prev_root || leaf)`` so
    any record edit, removal, or reorder changes the root. An empty or
    missing manifest has the empty root.
    """
    root = hashlib.sha256(b"farkle-manifest-root-v1").digest()
    for record in read_manifest(path):
        leaf = hashlib.sha256(canonical_json_sha(record).encode()).digest()
        root = hashlib.sha256(root + leaf).digest()
    return root.hex()


# ── v3 authenticated sidecars ────────────────────────────────────────────────


def auth_sidecar_path(artifact: str | Path) -> Path:
    """``x.parquet`` -> ``x.parquet.auth.json`` (separate from v2 sidecars)."""
    p = Path(artifact)
    return p.with_name(p.name + ".auth.json")


@dataclass(frozen=True)
class StageIdentity:
    """Who produced an artifact, under exactly which contract."""

    stage: str
    config_sha: str
    freshness_sha: str
    code_identity: dict[str, Any] = field(default_factory=dict)
    run_lineage_sha: str | None = None

    @property
    def sha256(self) -> str:
        return canonical_json_sha(asdict(self))

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)


def _parquet_schema_sha(path: Path) -> str | None:
    if path.suffix != ".parquet":
        return None
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    return hashlib.sha256(schema.serialize().to_pybytes()).hexdigest()


def artifact_identity(path: str | Path, *, logical_operation: str = "") -> dict[str, Any]:
    """Current byte + schema identity of an artifact on disk."""
    p = Path(path)
    try:
        size, sha = retry_transient_io(lambda: (p.stat().st_size, sha256_file(p)))
        schema_sha = retry_transient_io(lambda: _parquet_schema_sha(p))
    except Exception as exc:  # noqa: BLE001 - classified below
        raise ArtifactMismatchError(f"artifact cannot be authenticated: {p}: {exc}") from exc
    return {
        "name": p.name,
        "byte_length": size,
        "content_sha256": sha,
        "schema_sha256": schema_sha,
        "logical_operation": logical_operation,
    }


def _source_binding(path: Path, role: str) -> dict[str, Any]:
    """Upstream binding: prefer the source's own authenticated sidecar."""
    sc = auth_sidecar_path(path)
    if sc.exists():
        upstream = load_authenticated_sidecar(path)
        return {
            "role": role,
            "name": path.name,
            "sidecar_contract_sha256": upstream["sidecar_contract_sha256"],
        }
    return {"role": role, "name": path.name, "content_sha256": sha256_file(path)}


def make_authenticated_sidecar(
    artifact: str | Path,
    *,
    stage_identity: StageIdentity,
    method_contract: Mapping[str, Any] | None = None,
    sources: Mapping[str, Path] | None = None,
    manifest_roots: Mapping[str, str] | None = None,
    logical_operation: str = "",
) -> dict[str, Any]:
    """Construct + atomically publish a fully bound v3 sidecar for ``artifact``.

    The payload digests itself (``sidecar_contract_sha256``), so any edit to
    the sidecar is detected without consulting anything else.
    """
    payload = {
        "auth_contract_version": AUTH_CONTRACT_VERSION,
        "artifact": artifact_identity(artifact, logical_operation=logical_operation),
        "stage_identity": stage_identity.to_dict(),
        "stage_identity_sha256": stage_identity.sha256,
        "method_contract": dict(method_contract or {}),
        "sources": [
            _source_binding(Path(p), role) for role, p in sorted((sources or {}).items())
        ],
        "manifest_roots": dict(manifest_roots or {}),
    }
    payload["sidecar_contract_sha256"] = canonical_json_sha(payload)
    write_json_atomic(auth_sidecar_path(artifact), payload)
    return payload


def load_authenticated_sidecar(artifact: str | Path) -> dict[str, Any]:
    """Load a v3 sidecar, distinguishing absence from present corruption."""
    sc = auth_sidecar_path(artifact)
    if not sc.exists():
        raise MissingSidecarError(f"missing authenticated sidecar for {artifact}")
    try:
        payload = json.loads(sc.read_text(encoding="utf-8"))
        if not isinstance(payload, dict):
            raise TypeError("sidecar root must be an object")
        digest = payload.get("sidecar_contract_sha256")
        body = {k: v for k, v in payload.items() if k != "sidecar_contract_sha256"}
        if digest != canonical_json_sha(body):
            raise ValueError("sidecar contract digest does not match its payload")
    except MissingSidecarError:
        raise
    except Exception as exc:  # noqa: BLE001 - classified
        raise CorruptSidecarError(f"corrupt authenticated sidecar {sc}: {exc}") from exc
    return payload


def validate_authenticated_artifact(
    artifact: str | Path,
    *,
    expected_stage_identity: StageIdentity | None = None,
    expected_sidecar_sha256: str | None = None,
    source_paths: Mapping[str, Path] | None = None,
) -> dict[str, Any]:
    """Fail closed unless bytes, schema, provenance, and sources all match."""
    p = Path(artifact)
    payload = load_authenticated_sidecar(p)
    if (
        expected_sidecar_sha256 is not None
        and payload["sidecar_contract_sha256"] != expected_sidecar_sha256
    ):
        raise ArtifactMismatchError(
            f"{p.name}: sidecar contract sha does not match the expected binding"
        )
    current = artifact_identity(p, logical_operation=payload["artifact"]["logical_operation"])
    if current != payload["artifact"]:
        raise ArtifactMismatchError(
            f"{p.name}: artifact bytes/schema drifted from the authenticated sidecar"
        )
    if (
        expected_stage_identity is not None
        and payload["stage_identity_sha256"] != expected_stage_identity.sha256
    ):
        raise ArtifactMismatchError(
            f"{p.name}: stage identity does not match the expected producer"
        )
    recorded = {s["role"]: s for s in payload["sources"]}
    for role, src in (source_paths or {}).items():
        entry = recorded.get(role)
        if entry is None:
            raise ArtifactMismatchError(f"{p.name}: source role {role!r} not bound")
        fresh = _source_binding(Path(src), role)
        if fresh != entry:
            raise ArtifactMismatchError(
                f"{p.name}: upstream source {role!r} drifted from its binding"
            )
    return payload


# ── immutable canonical manifests ────────────────────────────────────────────


def _coordinate_order_key(coordinate: Sequence[Any]) -> tuple:
    return tuple(
        (0, int(v)) if isinstance(v, (int, bool)) else (1, str(v)) for v in coordinate
    )


def publish_immutable_manifest_atomic(
    path: str | Path,
    entries: Iterable[Mapping[str, Any]],
    *,
    stage_identity: StageIdentity,
    coordinate_fields: Sequence[str],
) -> dict[str, Any]:
    """Stream + atomically publish an immutable canonical manifest and root.

    Entries must arrive with strictly increasing coordinates (the tuple of
    ``coordinate_fields`` values); the root hash chains length-prefixed
    canonical JSON lines in order, so append, edit, removal, or reorder all
    change the root. Publication is sidecar-then-data staged under temp
    names and atomically renamed, so a crash can never leave a manifest
    that validates against stale metadata.
    """
    final = Path(path)
    final.parent.mkdir(parents=True, exist_ok=True)
    fd, staged_name = tempfile.mkstemp(prefix="._manifest_v3_", dir=final.parent)
    os.close(fd)
    staged = Path(staged_name)
    try:
        root = hashlib.sha256(b"farkle-immutable-manifest-v1")
        prev_key = None
        count = 0
        with staged.open("wb") as handle:
            for entry in entries:
                coordinate = [entry[f] for f in coordinate_fields]
                key = _coordinate_order_key(coordinate)
                if prev_key is not None and key <= prev_key:
                    raise ValueError(
                        "immutable manifest entries must have strictly "
                        f"increasing coordinates; saw {coordinate} after"
                    )
                encoded = json.dumps(
                    entry, sort_keys=True, separators=(",", ":"), default=str
                ).encode()
                handle.write(encoded + b"\n")
                root.update(len(encoded).to_bytes(8, "big"))
                root.update(encoded)
                prev_key = key
                count += 1
        if count == 0:
            raise ValueError("immutable manifest must contain at least one entry")
        payload = {
            "auth_contract_version": AUTH_CONTRACT_VERSION,
            "manifest_contract_version": MANIFEST_CONTRACT_VERSION,
            "manifest_sha256": sha256_file(staged),
            "root_sha256": root.hexdigest(),
            "entry_count": count,
            "coordinate_fields": list(coordinate_fields),
            "stage_identity": stage_identity.to_dict(),
            "stage_identity_sha256": stage_identity.sha256,
        }
        payload["sidecar_contract_sha256"] = canonical_json_sha(payload)
        write_json_atomic(auth_sidecar_path(final), payload)
        os.replace(staged, final)
    finally:
        if staged.exists():
            staged.unlink()
    return payload


def verify_immutable_manifest(path: str | Path) -> dict[str, Any]:
    """Re-derive the manifest root from bytes and compare to its sidecar."""
    final = Path(path)
    payload = load_authenticated_sidecar(final)
    if sha256_file(final) != payload["manifest_sha256"]:
        raise ArtifactMismatchError(f"{final.name}: manifest bytes drifted")
    root = hashlib.sha256(b"farkle-immutable-manifest-v1")
    count = 0
    with final.open("rb") as handle:
        for line in handle:
            encoded = line.rstrip(b"\n")
            root.update(len(encoded).to_bytes(8, "big"))
            root.update(encoded)
            count += 1
    if root.hexdigest() != payload["root_sha256"] or count != payload["entry_count"]:
        raise ArtifactMismatchError(f"{final.name}: manifest root does not re-derive")
    return payload


# ── authenticated completion + lifecycle classification ─────────────────────


def write_authenticated_completion(
    completion_path: str | Path,
    *,
    stage_identity: StageIdentity,
    outputs: Mapping[str, Path],
    state: str = "complete",
) -> dict[str, Any]:
    """Record a completion naming every output's authenticated sidecar."""
    bound = {}
    for role, p in sorted(outputs.items()):
        sc = load_authenticated_sidecar(p)
        bound[role] = {
            "name": Path(p).name,
            "artifact": sc["artifact"],
            "sidecar_contract_sha256": sc["sidecar_contract_sha256"],
        }
    payload = {
        "auth_contract_version": AUTH_CONTRACT_VERSION,
        "state": state,
        "stage_identity": stage_identity.to_dict(),
        "stage_identity_sha256": stage_identity.sha256,
        "outputs": bound,
    }
    payload["completion_sha256"] = canonical_json_sha(payload)
    write_json_atomic(completion_path, payload)
    return payload


def classify_authenticated_lifecycle(
    completion_path: str | Path,
    *,
    expected_stage_identity: StageIdentity,
    required_outputs: Mapping[str, Path],
    partial_paths: Sequence[Path] = (),
) -> str:
    """Classify authenticated work into exactly one canonical lifecycle state.

    States mirror ``utils.stage_completion.StageState`` values: not_started,
    partial_resumable, complete_valid, complete_stale, blocked_by_cap.
    """
    cp = Path(completion_path)
    materialized = any(Path(p).exists() for p in required_outputs.values()) or any(
        Path(p).exists() for p in partial_paths
    )
    if not cp.exists():
        return "partial_resumable" if materialized else "not_started"
    try:
        completion = json.loads(cp.read_text(encoding="utf-8"))
        digest = completion.get("completion_sha256")
        body = {k: v for k, v in completion.items() if k != "completion_sha256"}
        if digest != canonical_json_sha(body):
            return "complete_stale"
    except (OSError, json.JSONDecodeError):
        return "complete_stale"
    if completion.get("stage_identity_sha256") != expected_stage_identity.sha256:
        return "complete_stale"
    if completion.get("state") == "blocked_by_cap":
        return "blocked_by_cap"
    recorded = completion.get("outputs", {})
    if set(recorded) != set(required_outputs):
        return "complete_stale"
    for role, p in required_outputs.items():
        entry = recorded[role]
        try:
            payload = validate_authenticated_artifact(
                p,
                expected_stage_identity=expected_stage_identity,
                expected_sidecar_sha256=entry["sidecar_contract_sha256"],
            )
        except AuthenticatedContractError:
            return "complete_stale"
        if payload["artifact"] != entry["artifact"]:
            return "complete_stale"
    return "complete_valid"


def finalize_missing_sidecar_atomic(
    artifact: str | Path,
    *,
    expected_sidecar_payload: Mapping[str, Any],
    completion_output: Mapping[str, Any],
) -> dict[str, Any]:
    """Finalize only a genuinely missing sidecar already bound by completion.

    A present sidecar is always validated and never replaced. Missing
    metadata can be reconstructed only when (a) the candidate payload's own
    digest matches the completion output's recorded
    ``sidecar_contract_sha256`` and (b) the artifact's current bytes match
    the identity both records name.
    """
    p = Path(artifact)
    sc = auth_sidecar_path(p)
    if sc.exists():
        return validate_authenticated_artifact(
            p, expected_sidecar_sha256=completion_output["sidecar_contract_sha256"]
        )
    candidate = dict(expected_sidecar_payload)
    digest = candidate.get("sidecar_contract_sha256")
    body = {k: v for k, v in candidate.items() if k != "sidecar_contract_sha256"}
    if digest != canonical_json_sha(body):
        raise CorruptSidecarError(f"{p.name}: candidate sidecar fails its own digest")
    if digest != completion_output["sidecar_contract_sha256"]:
        raise ArtifactMismatchError(
            f"{p.name}: candidate sidecar is not the one the completion bound"
        )
    current = artifact_identity(
        p, logical_operation=candidate["artifact"]["logical_operation"]
    )
    if current != candidate["artifact"] or current != completion_output["artifact"]:
        raise ArtifactMismatchError(
            f"{p.name}: artifact bytes do not match the completion-bound identity"
        )
    write_json_atomic(sc, candidate)
    return candidate
