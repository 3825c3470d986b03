"""Atomic file publication primitives.

Same crash-safety contract as the reference (``utils/writer.py:26``,
``utils/artifact_contract.py:119``): every artifact is staged to a temporary
path in the destination directory and published with ``os.replace`` so a
crash can never leave a half-written file at a published path.
"""

from __future__ import annotations

import contextlib
import json
import os
import tempfile
from pathlib import Path
from typing import Any, Iterator


@contextlib.contextmanager
def atomic_path(destination: str | Path) -> Iterator[str]:
    """Yield a temp path in the destination's directory; publish on success.

    On any exception the temp file is removed and the destination untouched.
    """
    destination = Path(destination)
    destination.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(
        dir=destination.parent, prefix=f".{destination.name}.", suffix=".tmp"
    )
    os.close(fd)
    try:
        yield tmp
        os.replace(tmp, destination)
    except BaseException:
        with contextlib.suppress(OSError):
            os.unlink(tmp)
        raise


def write_json_atomic(path: str | Path, payload: Any, *, sort_keys: bool = True) -> None:
    """Serialize canonical JSON and publish atomically (with fsync)."""
    with atomic_path(path) as tmp:
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(payload, f, indent=2, sort_keys=sort_keys)
            f.write("\n")
            f.flush()
            os.fsync(f.fileno())


def write_bytes_atomic(path: str | Path, data: bytes) -> None:
    """Write raw bytes and publish atomically (with fsync)."""
    with atomic_path(path) as tmp:
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())


def canonical_json(payload: Any) -> str:
    """Stable separator-free-whitespace JSON used for content hashing."""
    return json.dumps(payload, sort_keys=True, separators=(",", ":"), ensure_ascii=True)
