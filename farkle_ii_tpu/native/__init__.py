"""ctypes bindings for the native C++ scoring oracle.

Builds ``native/farkle_scoring.cpp`` on demand into a per-user cache
directory (no pybind11 dependency — plain C ABI + ctypes) and exposes typed
wrappers. The native library is an *independent implementation* of the
scoring rules used to cross-validate the Python oracle and the device
scorer; ``available()`` reports whether a toolchain was found so tests can
skip gracefully on toolchain-less systems.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
from functools import lru_cache
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_SOURCE = Path(__file__).resolve().parent.parent.parent / "native" / "farkle_scoring.cpp"
_CACHE_DIR = Path(
    os.environ.get(
        "FARKLE_NATIVE_CACHE", Path.home() / ".cache" / "farkle_ii_tpu" / "native"
    )
)

TABLE_SIZE = 7**6


def _library_path() -> Path:
    source_hash = hashlib.sha256(_SOURCE.read_bytes()).hexdigest()[:16]
    return _CACHE_DIR / f"libfarkle_scoring_{source_hash}.so"


@lru_cache(maxsize=1)
def _load() -> ctypes.CDLL | None:
    if not _SOURCE.exists():
        logger.warning("native source missing: %s", _SOURCE)
        return None
    lib_path = _library_path()
    if not lib_path.exists():
        _CACHE_DIR.mkdir(parents=True, exist_ok=True)
        tmp = lib_path.with_suffix(".tmp.so")
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", str(tmp), str(_SOURCE)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as exc:
            logger.warning("native build failed (%s); falling back to Python", exc)
            return None
        os.replace(tmp, lib_path)
    lib = ctypes.CDLL(str(lib_path))
    lib.farkle_score_counts.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.farkle_build_score_table.argtypes = [ctypes.POINTER(ctypes.c_int32)]
    lib.farkle_score_rolls.argtypes = [
        ctypes.POINTER(ctypes.c_int8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    return lib


def available() -> bool:
    return _load() is not None


def score_counts(counts) -> tuple[int, int, int, int]:
    """Score one six-face count tuple via the native oracle."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native scoring library unavailable")
    c = np.asarray(counts, dtype=np.int32)
    if c.shape != (6,):
        raise ValueError("counts must have six entries")
    out = np.zeros(4, dtype=np.int32)
    lib.farkle_score_counts(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return tuple(int(x) for x in out)


def build_score_table() -> np.ndarray:
    """Dense packed 7^6 scoring table from the native builder."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native scoring library unavailable")
    out = np.zeros(TABLE_SIZE, dtype=np.int32)
    lib.farkle_build_score_table(out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def score_rolls(faces: np.ndarray) -> np.ndarray:
    """Batch-score (N, 6) face arrays (0 = empty lane) -> (N, 4) results."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native scoring library unavailable")
    faces = np.ascontiguousarray(faces, dtype=np.int8)
    if faces.ndim != 2 or faces.shape[1] != 6:
        raise ValueError("faces must have shape (N, 6)")
    out = np.zeros((faces.shape[0], 4), dtype=np.int32)
    lib.farkle_score_rolls(
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        ctypes.c_int64(faces.shape[0]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
