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
import logging
import time
from pathlib import Path
from typing import Any, Callable, Mapping, TypeVar

import pyarrow as pa
import pyarrow.parquet as pq

from farkle_ii_tpu.utils.writer import atomic_path, write_json_atomic

ARTIFACT_CONTRACT_VERSION = 2

logger = logging.getLogger(__name__)

_T = TypeVar("_T")

# tagged method contracts: every statistical artifact declares which method
# produced it and the parameters that would be needed to reproduce it
# (reference utils/artifact_contract.py:127-199 carries an analogous tagged
# union; the kinds here are the methods this pipeline actually ships)
METHOD_CONTRACT_KINDS: dict[str, frozenset[str]] = {
    # deterministic integer aggregation over played games — no free parameters
    "exact_counts": frozenset(),
    "wilson_ci": frozenset({"confidence"}),
    "bootstrap": frozenset({"n_resamples", "rng_namespace"}),
    "trueskill_ep": frozenset({"mu0", "sigma0", "beta", "tau"}),
    "hgb_importance": frozenset({"max_depth", "n_estimators"}),
    "h2h_score_test": frozenset({"alpha", "adjustment"}),
    "pareto_front": frozenset({"objectives"}),
}


def method_contract(kind: str, **params: Any) -> dict[str, Any]:
    """Build a validated tagged method-contract payload."""
    required = METHOD_CONTRACT_KINDS.get(kind)
    if required is None:
        raise ValueError(
            f"unknown method-contract kind {kind!r}; "
            f"known: {sorted(METHOD_CONTRACT_KINDS)}"
        )
    missing = required - params.keys()
    if missing:
        raise ValueError(f"method contract {kind!r} missing params {sorted(missing)}")
    return {"kind": kind, "params": params}


def validate_method_contract(payload: Mapping[str, Any]) -> None:
    kind = payload.get("kind")
    required = METHOD_CONTRACT_KINDS.get(kind)  # type: ignore[arg-type]
    if required is None:
        raise ArtifactValidationError(f"unknown method-contract kind {kind!r}")
    missing = required - dict(payload.get("params") or {}).keys()
    if missing:
        raise ArtifactValidationError(
            f"method contract {kind!r} missing params {sorted(missing)}"
        )


def retry_transient_io(
    fn: Callable[[], _T],
    *,
    retries: int = 3,
    base_delay: float = 0.1,
    what: str = "io operation",
) -> _T:
    """Run ``fn`` with bounded exponential backoff on transient OS errors.

    Reference parity: ``utils/artifact_contract.py:49-95``. Only ``OSError``
    is retried — contract violations and logic errors propagate immediately.
    """
    for attempt in range(retries + 1):
        try:
            return fn()
        except OSError as exc:
            if attempt == retries:
                raise
            delay = base_delay * (2**attempt)
            logger.warning(
                "transient IO failure in %s (%s); retry %d/%d in %.2fs",
                what, exc, attempt + 1, retries, delay,
            )
            time.sleep(delay)
    raise AssertionError("unreachable")


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
    k_support: list[int] | None = None,
    seed_scope: str | None = None,
    method: Mapping[str, Any] | None = None,
) -> dict[str, Any]:
    """Create and publish the sidecar for an already-staged artifact."""
    artifact = Path(artifact)
    if not artifact.exists():
        raise FileNotFoundError(f"artifact missing before sidecar publication: {artifact}")
    if method is not None:
        validate_method_contract(method)
    if seed_scope is not None and seed_scope not in ("single_seed", "seed_pair"):
        raise ValueError(f"seed_scope must be 'single_seed' or 'seed_pair', got {seed_scope!r}")
    payload = {
        "contract_version": ARTIFACT_CONTRACT_VERSION,
        "artifact_name": artifact.name,
        "sha256": sha256_file(artifact),
        "size_bytes": artifact.stat().st_size,
        "producer": producer,
        "scope": scope,
        "k_support": sorted(int(k) for k in k_support) if k_support else None,
        "seed_scope": seed_scope,
        "method": dict(method) if method is not None else None,
        "metadata": dict(metadata or {}),
    }
    retry_transient_io(
        lambda: write_json_atomic(sidecar_path(artifact), payload),
        what=f"sidecar publication for {artifact.name}",
    )
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
    if side.get("method") is not None:
        validate_method_contract(side["method"])
    return side


def write_parquet_artifact_atomic(
    table: pa.Table,
    path: str | Path,
    *,
    producer: str,
    scope: str | None = None,
    metadata: Mapping[str, Any] | None = None,
    k_support: list[int] | None = None,
    seed_scope: str | None = None,
    method: Mapping[str, Any] | None = None,
    compression: str = "zstd",
) -> dict[str, Any]:
    """Stage a parquet table atomically, then publish its sidecar."""
    path = Path(path)
    with atomic_path(path) as tmp:
        pq.write_table(table, tmp, compression=compression)
    return make_sidecar(
        path, producer=producer, scope=scope, metadata=metadata,
        k_support=k_support, seed_scope=seed_scope, method=method,
    )


def iter_parquet_artifact_batches(
    path: str | Path,
    *,
    expected_producer: str | None = None,
    validate: bool = True,
    columns: list[str] | None = None,
    batch_rows: int = 65536,
    reverse: bool = False,
):
    """Stream a parquet artifact in bounded-memory pandas batches.

    The sidecar is validated once up front (it binds the whole file's
    bytes). With ``reverse=True``, row groups are read last-to-first and
    rows flipped within each, yielding the exact reverse row order of the
    file — used by order-sensitivity diagnostics that must replay a
    sequential pass backwards without materializing the table.

    Reference parity: the reference streams 65k-row scanner batches
    everywhere it reads curated rows (``analysis/game_stats.py:106``,
    ``analysis/ingest.py``).
    """
    if validate:
        validate_sidecar(path, expected_producer=expected_producer)
    pf = pq.ParquetFile(path)
    if reverse:
        for i in range(pf.num_row_groups - 1, -1, -1):
            tbl = pf.read_row_group(i, columns=columns)
            yield tbl.to_pandas().iloc[::-1].reset_index(drop=True)
    else:
        for batch in pf.iter_batches(batch_size=batch_rows, columns=columns):
            yield batch.to_pandas()


def read_parquet_artifact(
    path: str | Path,
    *,
    expected_producer: str | None = None,
    validate: bool = True,
    columns: list[str] | None = None,
) -> pa.Table:
    """Read a parquet artifact, enforcing its sidecar binding.

    ``columns`` prunes the read to the named columns (the sidecar binds the
    whole file's bytes regardless, so validation is unaffected).
    """
    if validate:
        validate_sidecar(path, expected_producer=expected_producer)
    return pq.read_table(path, columns=columns)
