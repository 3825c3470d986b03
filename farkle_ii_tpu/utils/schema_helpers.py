"""Canonical Arrow schemas for simulation rows (outcome-schema v2 parity).

Field names, types and nullability match the reference data contract
(``/root/reference/src/farkle/utils/schema_helpers.py:21-87``) so downstream
tooling and the analysis layer read identical tables.
"""

from __future__ import annotations

import re
from typing import Final

import pyarrow as pa

OUTCOME_SCHEMA_VERSION: Final[int] = 2
TOURNAMENT_METHOD_VERSION: Final[int] = 2

_NULLABLE_STRING_LIST: Final = pa.list_(pa.field("item", pa.string(), nullable=True))

_BASE_FIELDS: Final[list[pa.Field]] = [
    pa.field("root_seed", pa.int64(), nullable=False),
    pa.field("k", pa.int16(), nullable=False),
    pa.field("shuffle_index", pa.int64(), nullable=False),
    pa.field("game_index", pa.int32(), nullable=False),
    pa.field("deterministic_batch_id", pa.int32(), nullable=False),
    pa.field("shuffle_seed", pa.int64(), nullable=False),
    pa.field("termination_status", pa.string(), nullable=False),
    pa.field("hit_safety_limit", pa.bool_(), nullable=False),
    pa.field("outcome_schema_version", pa.int16(), nullable=False),
    pa.field("winner_seat", pa.string(), nullable=True),
    pa.field("winner_strategy", pa.int32(), nullable=True),
    pa.field("game_seed", pa.int64(), nullable=False),
    pa.field("rng_scheme_version", pa.int16(), nullable=False),
    pa.field("rng_purpose_namespace", pa.int32(), nullable=False),
    pa.field("seat_ranks", _NULLABLE_STRING_LIST, nullable=False),
    pa.field("winning_score", pa.int32(), nullable=True),
    pa.field("victory_margin", pa.int32(), nullable=True),
    pa.field("n_rounds", pa.int16(), nullable=False),
]

_SEAT_TEMPLATE: Final[dict[str, tuple[pa.DataType, bool]]] = {
    "score": (pa.int32(), False),
    "farkles": (pa.int16(), False),
    "rolls": (pa.int16(), False),
    "highest_turn": (pa.int16(), False),
    "strategy": (pa.int32(), False),
    "rank": (pa.int8(), True),
    "loss_margin": (pa.int32(), True),
    "smart_five_uses": (pa.int16(), False),
    "n_smart_five_dice": (pa.int16(), False),
    "smart_one_uses": (pa.int16(), False),
    "n_smart_one_dice": (pa.int16(), False),
    "hot_dice": (pa.int16(), False),
    "n_turns": (pa.int16(), False),
    "hit_max_rounds": (pa.bool_(), False),
}

SEAT_FIELD_NAMES: Final[tuple[str, ...]] = tuple(_SEAT_TEMPLATE)


def raw_simulation_schema_for(n_players: int) -> pa.Schema:
    """Typed outcome-schema-v2 schema for persisted simulation rows."""
    if n_players < 1:
        raise ValueError("n_players must be positive")
    seat_fields = [
        pa.field(f"P{i}_{suffix}", dtype, nullable=nullable)
        for i in range(1, n_players + 1)
        for suffix, (dtype, nullable) in _SEAT_TEMPLATE.items()
    ]
    return pa.schema([*_BASE_FIELDS, *seat_fields])


def expected_schema_for(n_players: int) -> pa.Schema:
    """Rectangular analysis schema (all-nullable; k cells get padded)."""
    seat_fields = [
        pa.field(f"P{i}_{suffix}", dtype, nullable=True)
        for i in range(1, n_players + 1)
        for suffix, (dtype, _n) in _SEAT_TEMPLATE.items()
    ]
    base_fields = [pa.field(f.name, f.type, nullable=True) for f in _BASE_FIELDS]
    return pa.schema(base_fields + seat_fields)


_PNUM_RE = re.compile(r"^P(\d+)_")


def n_players_from_schema(schema: pa.Schema) -> int:
    """Infer the maximum seat index present in a schema."""
    pnums = [int(m.group(1)) for name in schema.names if (m := _PNUM_RE.match(name))]
    return max(pnums) if pnums else 0
