"""NA-safe scalar coercions for analysis frames (reference analysis_shared.py)."""

from __future__ import annotations

import math
from typing import Any

import numpy as np
import pandas as pd


def coerce_optional_float(value: Any) -> float | None:
    """None/NaN-preserving float coercion."""
    if value is None or value is pd.NA:
        return None
    if isinstance(value, float) and math.isnan(value):
        return None
    if isinstance(value, np.floating) and np.isnan(value):
        return None
    return float(value)


def coerce_optional_int(value: Any) -> int | None:
    """None/NaN-preserving integer coercion (rejects fractional floats)."""
    out = coerce_optional_float(value)
    if out is None:
        return None
    if out != int(out):
        raise ValueError(f"expected an integral value, got {value!r}")
    return int(out)


def coerce_optional_bool(value: Any) -> bool | None:
    """None/NaN-preserving bool coercion."""
    if value is None or value is pd.NA:
        return None
    if isinstance(value, (bool, np.bool_)):
        return bool(value)
    if isinstance(value, (int, np.integer)) and value in (0, 1):
        return bool(value)
    raise ValueError(f"cannot coerce {value!r} to bool")
