"""Additive v3 authentication primitives: code identity + manifest roots.

Reference parity (``/root/reference/src/farkle/utils/authenticated_contract.py``,
condensed): canonical JSON identity hashing, a ``CodeIdentity`` resolved from
the git commit plus a dirty-tree fingerprint, and a Merkle-style root over an
NDJSON manifest so a whole shard log can be pinned by one hash inside a
completion stamp.
"""

from __future__ import annotations

import hashlib
import json
import subprocess
from dataclasses import asdict, dataclass
from pathlib import Path
from typing import Any

from farkle_ii_tpu.utils.manifest import read_manifest

AUTH_CONTRACT_VERSION = 3


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
