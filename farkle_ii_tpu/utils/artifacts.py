"""Hash-bound artifact sidecars and parquet read/write enforcement.

Every derived artifact ``x`` is published with an adjacent
``x.sidecar.json`` binding its exact bytes (sha256 + size) plus provenance
metadata (producer stage, scope, k-support, seed scope, method contract).
Stage-then-publish ordering (data staged first, sidecar second, both atomic)
guarantees a crash can never leave data validating against stale metadata —
the same invariant the reference documents at
``utils/artifact_contract.py:1-7`` and enforces at ``:273,:540,:593``.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Any, Mapping

import pyarrow as pa
import pyarrow.parquet as pq

from farkle_ii_tpu.utils.writer import atomic_path, write_json_atomic

ARTIFACT_CONTRACT_VERSION = 2


def sha256_file(path: str | Path, *, chunk: int = 1 << 20) -> str:
    digest = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            block = f.read(chunk)
            if not block:
                break
            digest.update(block)
    return digest.hexdigest()


def sidecar_path(artifact: str | Path) -> Path:
    return Path(str(artifact) + ".sidecar.json")


def make_sidecar(
    artifact: str | Path,
    *,
    producer: str,
    scope: str | None = None,
    metadata: Mapping[str, Any] | None = None,
) -> dict[str, Any]:
    """Create and publish the sidecar for an already-staged artifact."""
    artifact = Path(artifact)
    if not artifact.exists():
        raise FileNotFoundError(f"artifact missing before sidecar publication: {artifact}")
    payload = {
        "contract_version": ARTIFACT_CONTRACT_VERSION,
        "artifact_name": artifact.name,
        "sha256": sha256_file(artifact),
        "size_bytes": artifact.stat().st_size,
        "producer": producer,
        "scope": scope,
        "metadata": dict(metadata or {}),
    }
    write_json_atomic(sidecar_path(artifact), payload)
    return payload


class ArtifactValidationError(RuntimeError):
    """Artifact bytes or metadata do not match the bound sidecar."""


def load_sidecar(artifact: str | Path) -> dict[str, Any]:
    path = sidecar_path(artifact)
    if not path.exists():
        raise ArtifactValidationError(f"missing sidecar for {artifact}")
    return json.loads(path.read_text(encoding="utf-8"))


def validate_sidecar(artifact: str | Path, *, expected_producer: str | None = None) -> dict[str, Any]:
    """Verify the artifact's bytes against its sidecar; return the sidecar."""
    artifact = Path(artifact)
    side = load_sidecar(artifact)
    if not artifact.exists():
        raise ArtifactValidationError(f"artifact missing: {artifact}")
    if artifact.stat().st_size != side.get("size_bytes"):
        raise ArtifactValidationError(f"size mismatch for {artifact}")
    if sha256_file(artifact) != side.get("sha256"):
        raise ArtifactValidationError(f"sha256 mismatch for {artifact}")
    if expected_producer is not None and side.get("producer") != expected_producer:
        raise ArtifactValidationError(
            f"producer mismatch for {artifact}: {side.get('producer')!r} != {expected_producer!r}"
        )
    return side


def write_parquet_artifact_atomic(
    table: pa.Table,
    path: str | Path,
    *,
    producer: str,
    scope: str | None = None,
    metadata: Mapping[str, Any] | None = None,
    compression: str = "zstd",
) -> dict[str, Any]:
    """Stage a parquet table atomically, then publish its sidecar."""
    path = Path(path)
    with atomic_path(path) as tmp:
        pq.write_table(table, tmp, compression=compression)
    return make_sidecar(path, producer=producer, scope=scope, metadata=metadata)


def read_parquet_artifact(
    path: str | Path, *, expected_producer: str | None = None, validate: bool = True
) -> pa.Table:
    """Read a parquet artifact, enforcing its sidecar binding."""
    if validate:
        validate_sidecar(path, expected_producer=expected_producer)
    return pq.read_table(path)
