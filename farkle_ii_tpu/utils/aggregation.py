"""K-aggregation method normalization (reference utils/aggregation.py)."""

from __future__ import annotations

_CANONICAL = {
    "equal-k": "equal-k",
    "equal_k": "equal-k",
    "equalk": "equal-k",
    "declared": "declared_mapping",
    "declared-mapping": "declared_mapping",
    "declared_mapping": "declared_mapping",
}


def normalize_k_aggregation_method(value: str) -> str:
    """Canonicalize a configured k-aggregation method name."""
    try:
        return _CANONICAL[value.strip().lower()]
    except (KeyError, AttributeError) as exc:
        raise ValueError(
            f"unknown k-aggregation method {value!r}; expected one of "
            f"{sorted(set(_CANONICAL.values()))}"
        ) from exc
