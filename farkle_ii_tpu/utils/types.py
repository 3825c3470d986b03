"""Shared type aliases (reference utils/types.py parity)."""

from __future__ import annotations

from typing import Literal, Sequence

import numpy as np

DiceRoll = Sequence[int]
SixFaceCounts = tuple[int, int, int, int, int, int]
Int64Array1D = np.ndarray
Compression = Literal["zstd", "snappy", "gzip", "none"]


def normalize_compression(value: str | None) -> str:
    """Normalize a parquet codec name; None means snappy."""
    if value is None:
        return "snappy"
    value = value.lower()
    if value not in ("zstd", "snappy", "gzip", "none", "lz4", "brotli"):
        raise ValueError(f"unsupported parquet compression: {value!r}")
    return value
