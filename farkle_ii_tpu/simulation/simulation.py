"""Batch game simulation API: play arbitrary strategy line-ups on device.

Reference parity (``/root/reference/src/farkle/simulation/simulation.py``):
``simulate_many_games`` plays N games of a fixed (or per-game) seating and
returns a tidy DataFrame of flattened rows; ``experiment_size`` reports the
configured grid size. The execution backend is the fused TPU kernel rather
than a process pool — one dispatch plays the whole batch.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from farkle_ii_tpu.ops.rng import RandomPurpose
from farkle_ii_tpu.simulation.strategies import (
    ThresholdStrategy,
    build_strategy_grid,
    pack_strategy_params,
)


def experiment_size(**grid_kwargs) -> int:
    """Number of strategies in the configured grid."""
    return len(build_strategy_grid(**grid_kwargs))


def simulate_many_games(
    *,
    n_games: int,
    strategies: Sequence[ThresholdStrategy],
    target_score: int = 10_000,
    max_rounds: int = 200,
    seed: int = 0,
) -> pd.DataFrame:
    """Play ``n_games`` with a fixed seating order; return flattened rows.

    Every game's dice streams use PLAYER-namespace coordinates
    ``(root=seed, k, game_index, seat)`` — reproducible and independent of
    batching.
    """
    import jax
    import jax.numpy as jnp

    from farkle_ii_tpu.ops import game_kernel as gk, rng
    from farkle_ii_tpu.simulation import rows as rows_mod

    k = len(strategies)
    if k < 1:
        raise ValueError("at least one strategy is required")
    if n_games < 1:
        raise ValueError("n_games must be positive")
    p = pack_strategy_params(list(strategies))
    st = jnp.broadcast_to(jnp.asarray(p.score_threshold)[None, :], (n_games, k))
    dt = jnp.broadcast_to(jnp.asarray(p.dice_threshold)[None, :], (n_games, k))
    fl = jnp.broadcast_to(jnp.asarray(p.flags)[None, :], (n_games, k))
    base = rng.purpose_base_key(RandomPurpose.PLAYER, root_seed=seed, k=k)
    kd = gk.game_key_data_for_games(base, jnp.arange(n_games))
    result = jax.jit(
        lambda kd, st, dt, fl: gk.play_games(
            kd, st, dt, fl, target_score=target_score, max_rounds=max_rounds
        )
    )(kd, st, dt, fl)

    seat_ids = np.tile(
        np.asarray(
            [s.strategy_id if s.strategy_id is not None else i for i, s in enumerate(strategies)],
            dtype=np.int64,
        ),
        (n_games, 1),
    )
    table = rows_mod.rows_table(
        result,
        seat_ids,
        root_seed=seed,
        k=k,
        shuffle_index=np.zeros(n_games, dtype=np.int64),
        game_index=np.arange(n_games, dtype=np.int32),
        deterministic_batch_id=0,
        shuffle_seed=np.zeros(n_games, dtype=np.int64),
        game_seed=np.arange(n_games, dtype=np.int64),
    )
    return table.to_pandas()
