"""Append-only NDJSON manifests (shard logs + run/stage event streams).

Contract parity with the reference (``utils/manifest.py:95-166,264``): each
append is a single ``O_APPEND`` write under an advisory file lock with fsync,
so concurrent writers (multiple hosts sharing a filesystem) interleave whole
lines, never partial ones. Manifests double as redo logs: aggregates can be
rebuilt by replaying shard entries in deterministic coordinate order.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path
from typing import Any, Iterator

MANIFEST_SCHEMA_VERSION = 2

try:
    import fcntl

    def _lock(fd: int) -> None:
        fcntl.flock(fd, fcntl.LOCK_EX)

    def _unlock(fd: int) -> None:
        fcntl.flock(fd, fcntl.LOCK_UN)

except ImportError:  # pragma: no cover - non-POSIX fallback

    def _lock(fd: int) -> None:
        pass

    def _unlock(fd: int) -> None:
        pass


def append_manifest_line(path: str | Path, record: dict[str, Any]) -> None:
    """Append one JSON record as a single locked, fsynced O_APPEND write."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    line = json.dumps(record, sort_keys=True, separators=(",", ":")) + "\n"
    data = line.encode("utf-8")
    fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644)
    try:
        _lock(fd)
        try:
            os.write(fd, data)
            os.fsync(fd)
        finally:
            _unlock(fd)
    finally:
        os.close(fd)


def read_manifest(path: str | Path) -> Iterator[dict[str, Any]]:
    """Yield manifest records in append order; reject unparseable lines."""
    path = Path(path)
    if not path.exists():
        return
    with open(path, "r", encoding="utf-8") as f:
        for idx, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            try:
                yield json.loads(line)
            except json.JSONDecodeError as exc:
                raise ValueError(f"{path}:{idx + 1}: corrupt manifest line") from exc


def new_run_id() -> str:
    """Unique identifier for one logical run (attached to every event)."""
    return uuid.uuid4().hex


def append_manifest_event(
    path: str | Path,
    event: str,
    *,
    run_id: str,
    config_sha: str | None = None,
    **payload: Any,
) -> None:
    """Append a v2 run/stage lifecycle event record."""
    record = {
        "schema_version": MANIFEST_SCHEMA_VERSION,
        "event": event,
        "run_id": run_id,
        "config_sha": config_sha,
        "timestamp_unix": time.time(),
        **payload,
    }
    append_manifest_line(path, record)
