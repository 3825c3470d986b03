"""Vectorized per-game row materialization (outcome-schema v2).

Converts a played batch (``GameResult`` arrays + seat ids + coordinates) into
the reference's flat row format (``simulation/simulation.py:469-547``) in one
columnar pass — no per-row Python dicts. Safety-limit games carry null
winner/rank/margin fields; completed games carry a full rank permutation with
stable seat-order tie-breaking, enforced by :func:`validate_rows_table`
(parity with ``validate_simulation_row``, simulation.py:398-456).
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

from farkle_ii_tpu.ops.game_kernel import GameResult
from farkle_ii_tpu.utils.schema_helpers import (
    OUTCOME_SCHEMA_VERSION,
    raw_simulation_schema_for,
)

RNG_SCHEME_VERSION = 2
TOURNAMENT_GAME_NAMESPACE = 102


def rows_table(
    result: GameResult,
    seat_ids: np.ndarray,
    *,
    root_seed: int,
    k: int,
    shuffle_index: np.ndarray,
    game_index: np.ndarray,
    deterministic_batch_id: np.ndarray | int,
    shuffle_seed: np.ndarray,
    game_seed: np.ndarray,
) -> pa.Table:
    """Build the typed rows table for one played batch."""
    res = {name: np.asarray(getattr(result, name)) for name in result._fields}
    seat_ids = np.asarray(seat_ids)
    b = seat_ids.shape[0]
    completed = res["completed"]
    winner_seat = res["winner_seat"]
    scores = res["scores"]
    ranks = res["ranks"]

    if np.isscalar(deterministic_batch_id):
        deterministic_batch_id = np.full(b, deterministic_batch_id, dtype=np.int32)

    winner_names = np.array([f"P{i + 1}" for i in range(k)] + [None], dtype=object)
    winner_seat_col = winner_names[np.where(completed, winner_seat, k)]
    winner_strategy = np.where(
        completed, np.take_along_axis(seat_ids, np.clip(winner_seat, 0, None)[:, None], axis=1)[:, 0], 0
    )

    # seat_ranks: names ordered by rank for completed games, else k nulls
    order = np.argsort(ranks, axis=1, kind="stable")  # (B, k) seat index by rank
    seat_rank_values = np.where(
        np.repeat(completed, k),
        winner_names[order.reshape(-1)],
        None,
    )
    seat_ranks_col = pa.ListArray.from_arrays(
        pa.array(np.arange(0, (b + 1) * k, k, dtype=np.int32)),
        pa.array(seat_rank_values, type=pa.string()),
    )

    winning_score = res["winning_score"]
    data: dict[str, Any] = {
        "root_seed": pa.array(np.full(b, root_seed, dtype=np.int64)),
        "k": pa.array(np.full(b, k, dtype=np.int16)),
        "shuffle_index": pa.array(np.asarray(shuffle_index, dtype=np.int64)),
        "game_index": pa.array(np.asarray(game_index, dtype=np.int32)),
        "deterministic_batch_id": pa.array(
            np.asarray(deterministic_batch_id, dtype=np.int32)
        ),
        "shuffle_seed": pa.array(np.asarray(shuffle_seed, dtype=np.int64)),
        "termination_status": pa.array(
            np.where(completed, "completed", "safety_limit"), type=pa.string()
        ),
        "hit_safety_limit": pa.array(~completed),
        "outcome_schema_version": pa.array(
            np.full(b, OUTCOME_SCHEMA_VERSION, dtype=np.int16)
        ),
        "winner_seat": pa.array(winner_seat_col, type=pa.string()),
        "winner_strategy": pa.array(
            np.ma.masked_array(winner_strategy.astype(np.int32), mask=~completed)
        ),
        "game_seed": pa.array(np.asarray(game_seed, dtype=np.int64)),
        "rng_scheme_version": pa.array(np.full(b, RNG_SCHEME_VERSION, dtype=np.int16)),
        "rng_purpose_namespace": pa.array(
            np.full(b, TOURNAMENT_GAME_NAMESPACE, dtype=np.int32)
        ),
        "seat_ranks": seat_ranks_col,
        "winning_score": pa.array(
            np.ma.masked_array(winning_score.astype(np.int32), mask=~completed)
        ),
        "victory_margin": pa.array(
            np.ma.masked_array(res["margin"].astype(np.int32), mask=~completed)
        ),
        "n_rounds": pa.array(res["n_rounds"].astype(np.int16)),
    }

    loss_margin = winning_score[:, None] - scores  # valid only for completed
    for i in range(k):
        p = f"P{i + 1}"
        data[f"{p}_score"] = pa.array(scores[:, i].astype(np.int32))
        data[f"{p}_farkles"] = pa.array(res["n_farkles"][:, i].astype(np.int16))
        data[f"{p}_rolls"] = pa.array(res["n_rolls"][:, i].astype(np.int16))
        data[f"{p}_highest_turn"] = pa.array(res["highest_turn"][:, i].astype(np.int16))
        data[f"{p}_strategy"] = pa.array(seat_ids[:, i].astype(np.int32))
        data[f"{p}_rank"] = pa.array(
            np.ma.masked_array(ranks[:, i].astype(np.int8), mask=~completed)
        )
        data[f"{p}_loss_margin"] = pa.array(
            np.ma.masked_array(loss_margin[:, i].astype(np.int32), mask=~completed)
        )
        data[f"{p}_smart_five_uses"] = pa.array(
            res["smart_five_uses"][:, i].astype(np.int16)
        )
        data[f"{p}_n_smart_five_dice"] = pa.array(
            res["n_smart_five_dice"][:, i].astype(np.int16)
        )
        data[f"{p}_smart_one_uses"] = pa.array(
            res["smart_one_uses"][:, i].astype(np.int16)
        )
        data[f"{p}_n_smart_one_dice"] = pa.array(
            res["n_smart_one_dice"][:, i].astype(np.int16)
        )
        data[f"{p}_hot_dice"] = pa.array(res["n_hot_dice"][:, i].astype(np.int16))
        data[f"{p}_n_turns"] = pa.array(res["n_turns"][:, i].astype(np.int16))
        data[f"{p}_hit_max_rounds"] = pa.array(~completed)

    schema = raw_simulation_schema_for(k)
    return pa.table(data).cast(schema)


def validate_rows_table(table: pa.Table) -> None:
    """Vectorized closed-outcome invariants (validate_simulation_row parity)."""
    k = int(table["k"][0].as_py())
    completed = np.asarray(table["termination_status"].to_pandas() == "completed")
    hit_safety = np.asarray(table["hit_safety_limit"])
    if not (completed == ~hit_safety).all():
        raise ValueError("termination_status and hit_safety_limit disagree")
    if not (np.asarray(table["outcome_schema_version"]) == OUTCOME_SCHEMA_VERSION).all():
        raise ValueError("wrong outcome_schema_version")

    ranks = np.stack(
        [np.asarray(table[f"P{i}_rank"].to_pandas()) for i in range(1, k + 1)], axis=1
    )
    winner_strategy = np.asarray(table["winner_strategy"].to_pandas())
    winner_seat = np.asarray(table["winner_seat"].to_pandas(), dtype=object)
    winning_score = np.asarray(table["winning_score"].to_pandas())

    # completed rows: ranks are a permutation 1..k with a unique winner
    comp = completed
    if comp.any():
        r = ranks[comp]
        if np.isnan(r.astype(float)).any():
            raise ValueError("completed rows must have all ranks")
        sorted_r = np.sort(r.astype(int), axis=1)
        if not (sorted_r == np.arange(1, k + 1)[None, :]).all():
            raise ValueError("completed ranks must be the permutation 1..k")
        if np.isnan(winning_score[comp].astype(float)).any():
            raise ValueError("completed rows must have winning_score")
        if pd.isna(winner_seat[comp]).any():
            raise ValueError("completed rows must name a winner seat")
        if np.isnan(winner_strategy[comp].astype(float)).any():
            raise ValueError("completed rows must name a winner strategy")
    # safety rows: no winner-conditioned fields
    safe = ~completed
    if safe.any():
        if not np.isnan(ranks[safe].astype(float)).all():
            raise ValueError("safety rows cannot assign ranks")
        # string nulls surface as None or float nan depending on the
        # arrow->pandas path; pd.isna handles both
        if (~pd.isna(winner_seat[safe])).any():
            raise ValueError("safety rows cannot name a winner")
        if not np.isnan(winning_score[safe].astype(float)).all():
            raise ValueError("safety rows cannot have winning_score")


@functools.lru_cache(maxsize=64)
def _fingerprint_jit(purpose: int, root_seed: int, k: int):
    """Jitted fingerprint kernel per (purpose, root_seed, k).

    The eager fold-in chain re-traced ~12 vmapped hashes per call and was
    ~80% of every warm row-shard write (round-5 profile); jitting it (and
    re-using the executable across the run's identical chunk shapes) makes
    the fingerprint columns a sub-millisecond afterthought.
    """
    import jax

    from farkle_ii_tpu.ops import rng as _rng

    def fn(shuffle_index, game_index):
        keys = _rng.vector_coordinate_keys(
            purpose, root_seed=root_seed, k=k,
            shuffle_index=shuffle_index, game_index=game_index,
        )
        return jax.random.key_data(keys)[..., 0]

    return jax.jit(fn)


def coordinate_fingerprints(
    purpose: int,
    *,
    root_seed: int,
    k: int,
    shuffle_index: np.ndarray,
    game_index: np.ndarray | int = 0,
) -> np.ndarray:
    """Vectorized uint32 diagnostic fingerprints for provenance columns.

    Mirror of the reference's reduced ``coordinate_seed`` scalars
    (utils/random.py:191) — never used as RNG roots. Always computed on
    the host CPU backend: these are provenance columns on the row-export
    path, and a remote accelerator round trip per shard would dwarf the
    write itself.
    """
    import jax
    import jax.numpy as jnp

    fn = _fingerprint_jit(int(purpose), int(root_seed), int(k))
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        data = np.asarray(
            fn(
                jnp.asarray(shuffle_index, dtype=jnp.uint32),
                jnp.asarray(game_index, dtype=jnp.uint32),
            )
        )
    return data.astype(np.int64)
