"""Content-authenticated stage completion stamps and lifecycle resolution.

``<stage>.done.json`` binds the byte identity (sha256 + size) of every
declared input and output (plus adjacent sidecars), the stage-scoped config
sha, and a freshness key. A stage is only COMPLETE_VALID when the stamp
exists *and* every bound file still matches, so any drift — edited outputs,
changed config, upstream refresh — automatically demotes it to
COMPLETE_STALE and forces a rerun. Five-state lifecycle parity with the
reference (``utils/stage_completion.py:43,238,371``):

NOT_STARTED | PARTIAL_RESUMABLE | COMPLETE_VALID | COMPLETE_STALE |
BLOCKED_BY_CAP
"""

from __future__ import annotations

import json
from contextlib import contextmanager
from contextvars import ContextVar
from enum import StrEnum
from functools import lru_cache
from pathlib import Path
from typing import Any, Iterable, Mapping

from farkle_ii_tpu.utils.artifacts import sha256_file, sidecar_path
from farkle_ii_tpu.utils.writer import write_json_atomic

STAGE_STAMP_VERSION = 2


def _normalize_json(payload: Any) -> Any:
    """Round-trip through JSON so int keys etc. compare stably with stamps."""
    return json.loads(json.dumps(payload, sort_keys=True, default=str))


class StageState(StrEnum):
    NOT_STARTED = "not_started"
    PARTIAL_RESUMABLE = "partial_resumable"
    COMPLETE_VALID = "complete_valid"
    COMPLETE_STALE = "complete_stale"
    BLOCKED_BY_CAP = "blocked_by_cap"


def _file_identity(path: Path) -> dict[str, Any]:
    return {
        "path": path.name,
        "sha256": sha256_file(path),
        "size_bytes": path.stat().st_size,
    }


def _bind_files(paths: Iterable[Path]) -> list[dict[str, Any]]:
    out = []
    for p in sorted(set(Path(x) for x in paths)):
        if not p.exists():
            raise FileNotFoundError(f"cannot stamp missing file: {p}")
        out.append({**_file_identity(p), "abs": str(p)})
        side = sidecar_path(p)
        if side.exists():
            out.append({**_file_identity(side), "abs": str(side)})
    return out


def stamp_path(stage_dir: str | Path, stage_key: str) -> Path:
    return Path(stage_dir) / f"{stage_key}.done.json"


_RUN_LINEAGE: ContextVar[str | None] = ContextVar("farkle_run_lineage", default=None)


@contextmanager
def run_lineage(sha: str | None):
    """Scope a run-lineage sha: stamps written inside record it.

    Orchestration sets this to the run-context lineage sha so every
    completion stamp produced under a pipeline run carries its provenance
    (reference stage_completion.py:371 binds run lineage into stamps).
    """
    token = _RUN_LINEAGE.set(sha)
    try:
        yield
    finally:
        _RUN_LINEAGE.reset(token)


@lru_cache(maxsize=1)
def _cached_code_identity() -> dict[str, Any]:
    from farkle_ii_tpu.utils.authenticated_contract import resolve_code_identity

    return resolve_code_identity().to_dict()


def write_stage_done(
    stage_dir: str | Path,
    stage_key: str,
    *,
    inputs: Iterable[Path] = (),
    outputs: Iterable[Path] = (),
    config_sha: str = "",
    freshness_key: Mapping[str, Any] | None = None,
    cache_key_version: int = 1,
    extra: Mapping[str, Any] | None = None,
) -> Path:
    """Publish the completion stamp binding exact input/output bytes.

    Every stamp additionally records the producing code identity (git commit
    + dirty fingerprint) and the active run-lineage sha — provenance that is
    recorded, not gated on (a rebuilt binary with identical config and bytes
    stays COMPLETE_VALID, matching the reference's resolution semantics).
    """
    payload = {
        "stamp_version": STAGE_STAMP_VERSION,
        "stage": stage_key,
        "inputs": _bind_files(inputs),
        "outputs": _bind_files(outputs),
        "config_sha": config_sha,
        "freshness_key": _normalize_json(dict(freshness_key or {})),
        "cache_key_version": cache_key_version,
        "code_identity": _cached_code_identity(),
        "run_lineage_sha": _RUN_LINEAGE.get(),
        **dict(extra or {}),
    }
    path = stamp_path(stage_dir, stage_key)
    write_json_atomic(path, payload)
    return path


def _files_match(bound: list[dict[str, Any]]) -> bool:
    for entry in bound:
        p = Path(entry["abs"])
        if not p.exists():
            return False
        if p.stat().st_size != entry["size_bytes"]:
            return False
        if sha256_file(p) != entry["sha256"]:
            return False
    return True


def resolve_stage_state(
    stage_dir: str | Path,
    stage_key: str,
    *,
    config_sha: str = "",
    freshness_key: Mapping[str, Any] | None = None,
    cache_key_version: int = 1,
    has_partial_outputs: bool = False,
    blocked_by_cap: bool = False,
) -> StageState:
    """Resolve the five-state lifecycle for one stage directory."""
    if blocked_by_cap:
        return StageState.BLOCKED_BY_CAP
    path = stamp_path(stage_dir, stage_key)
    if not path.exists():
        return (
            StageState.PARTIAL_RESUMABLE if has_partial_outputs else StageState.NOT_STARTED
        )
    try:
        stamp = json.loads(path.read_text(encoding="utf-8"))
    except (OSError, json.JSONDecodeError):
        return StageState.COMPLETE_STALE
    if stamp.get("stamp_version") != STAGE_STAMP_VERSION:
        return StageState.COMPLETE_STALE
    if stamp.get("config_sha") != config_sha:
        return StageState.COMPLETE_STALE
    if stamp.get("cache_key_version") != cache_key_version:
        return StageState.COMPLETE_STALE
    if stamp.get("freshness_key") != _normalize_json(dict(freshness_key or {})):
        return StageState.COMPLETE_STALE
    if not _files_match(stamp.get("inputs", [])) or not _files_match(
        stamp.get("outputs", [])
    ):
        return StageState.COMPLETE_STALE
    return StageState.COMPLETE_VALID


def current_run_lineage() -> str | None:
    """The run-lineage sha scoped by :func:`run_lineage`, if any."""
    return _RUN_LINEAGE.get()
