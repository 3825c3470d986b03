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


# ── native game engine twin (native/farkle_engine.cpp) ───────────────────────

_ENGINE_SOURCE = (
    Path(__file__).resolve().parent.parent.parent / "native" / "farkle_engine.cpp"
)


@lru_cache(maxsize=1)
def _load_engine() -> ctypes.CDLL | None:
    if not _ENGINE_SOURCE.exists():
        logger.warning("native engine source missing: %s", _ENGINE_SOURCE)
        return None
    source_hash = hashlib.sha256(_ENGINE_SOURCE.read_bytes()).hexdigest()[:16]
    lib_path = _CACHE_DIR / f"libfarkle_engine_{source_hash}.so"
    if not lib_path.exists():
        _CACHE_DIR.mkdir(parents=True, exist_ok=True)
        tmp = lib_path.with_suffix(".tmp.so")
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", str(tmp), str(_ENGINE_SOURCE)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as exc:
            logger.warning("native engine build failed (%s)", exc)
            return None
        os.replace(tmp, lib_path)
    lib = ctypes.CDLL(str(lib_path))
    lib.farkle_play_games.argtypes = [
        ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    return lib


def engine_available() -> bool:
    return _load_engine() is not None


ENGINE_GAME_FIELDS = (
    "completed", "winner_seat", "winning_score", "margin", "n_rounds",
    "roll_limit_hits",
)
ENGINE_SEAT_FIELDS = (
    "scores", "ranks", "n_farkles", "n_rolls", "n_turns", "highest_turn",
    "smart_five_uses", "n_smart_five_dice", "smart_one_uses",
    "n_smart_one_dice", "n_hot_dice",
)


def play_games(
    key_data: np.ndarray,
    score_thresholds: np.ndarray,
    dice_thresholds: np.ndarray,
    flags: np.ndarray,
    *,
    target_score: int = 10_000,
    max_rounds: int = 200,
) -> dict[str, np.ndarray]:
    """Play a batch of games through the independent C++ engine twin.

    Same inputs as the device kernel (``ops/game_kernel.play_games``), same
    threefry dice streams — results are bit-identical by construction and
    tests enforce it. Returns a dict of per-game arrays plus (B, K) per-seat
    counter matrices keyed like ``GameResult``.
    """
    lib = _load_engine()
    if lib is None:
        raise RuntimeError("native engine library unavailable")
    kd = np.ascontiguousarray(key_data, dtype=np.uint32)
    st = np.ascontiguousarray(score_thresholds, dtype=np.int32)
    dt = np.ascontiguousarray(dice_thresholds, dtype=np.int32)
    fl = np.ascontiguousarray(flags, dtype=np.int32)
    n, k = st.shape
    if kd.shape != (n, 2) or dt.shape != (n, k) or fl.shape != (n, k):
        raise ValueError("inconsistent batch shapes")
    stride = 6 + 11 * k
    out = np.zeros((n, stride), dtype=np.int32)
    lib.farkle_play_games(
        ctypes.c_int64(n), ctypes.c_int32(k),
        kd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        st.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        fl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(target_score), ctypes.c_int32(max_rounds),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    result: dict[str, np.ndarray] = {}
    for i, name in enumerate(ENGINE_GAME_FIELDS):
        result[name] = out[:, i].copy()
    result["completed"] = result["completed"].astype(bool)
    seat_block = out[:, 6:].reshape(n, k, 11)
    for j, name in enumerate(ENGINE_SEAT_FIELDS):
        result[name] = seat_block[:, :, j].copy()
    return result


# ── wave scheduler (native/wave_schedule.cpp) ─────────────────────────────────

_WAVES_SOURCE = (
    Path(__file__).resolve().parent.parent.parent / "native" / "wave_schedule.cpp"
)


@lru_cache(maxsize=1)
def _load_waves() -> ctypes.CDLL | None:
    if not _WAVES_SOURCE.exists():
        logger.warning("native wave-schedule source missing: %s", _WAVES_SOURCE)
        return None
    source_hash = hashlib.sha256(_WAVES_SOURCE.read_bytes()).hexdigest()[:16]
    lib_path = _CACHE_DIR / f"libfarkle_waves_{source_hash}.so"
    if not lib_path.exists():
        _CACHE_DIR.mkdir(parents=True, exist_ok=True)
        tmp = lib_path.with_suffix(".tmp.so")
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", str(tmp), str(_WAVES_SOURCE)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as exc:
            logger.warning("native wave-schedule build failed (%s)", exc)
            return None
        os.replace(tmp, lib_path)
    lib = ctypes.CDLL(str(lib_path))
    lib.farkle_wave_schedule.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
    ]
    return lib


def waves_available() -> bool:
    return _load_waves() is not None


def wave_schedule(codes: np.ndarray, n_codes: int) -> np.ndarray:
    """Earliest-wave schedule for (G, k) dense strategy codes (see .cpp)."""
    lib = _load_waves()
    if lib is None:
        raise RuntimeError("native wave-schedule library unavailable")
    codes = np.ascontiguousarray(codes, dtype=np.int32)
    if codes.ndim != 2:
        raise ValueError("codes must have shape (G, k)")
    g, k = codes.shape
    out = np.zeros(g, dtype=np.int32)
    lib.farkle_wave_schedule(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(g), ctypes.c_int32(k), ctypes.c_int32(n_codes),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
