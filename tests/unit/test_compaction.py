"""Straggler compaction must be result-invariant vs the plain loop."""

import jax
import jax.numpy as jnp
import numpy as np

from farkle_ii_tpu.ops import game_kernel as gk, rng
from farkle_ii_tpu.simulation import strategies as S
import pytest

pytestmark = pytest.mark.slow  # >15s each: excluded from `make ci`


def test_compacted_equals_plain():
    grid = S.build_strategy_grid(
        score_thresholds=(250, 300), dice_thresholds=(0, 2)
    )
    k, b = 2, 4096  # meets _COMPACT_MIN_BATCH; dt=0 grid rows create stragglers
    ids = np.random.default_rng(1).integers(0, len(grid), size=(b, k))
    p = S.pack_strategy_params([grid[int(i)] for i in ids.reshape(-1)])
    st = jnp.asarray(p.score_threshold.reshape(b, k))
    dt = jnp.asarray(p.dice_threshold.reshape(b, k))
    fl = jnp.asarray(p.flags.reshape(b, k))
    base = rng.purpose_base_key(
        rng.RandomPurpose.TOURNAMENT_PLAYER, root_seed=9, k=k, shuffle_index=0
    )
    kd = gk.game_key_data_for_games(base, jnp.arange(b))

    plain = jax.jit(
        lambda *a: gk.play_games(*a, compact=False)
    )(kd, st, dt, fl)
    compacted = jax.jit(
        lambda *a: gk.play_games(*a, compact=True)
    )(kd, st, dt, fl)
    for name in gk.GameResult._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(plain, name)),
            np.asarray(getattr(compacted, name)),
            err_msg=name,
        )


def test_compacted_irregular_batch_equals_plain():
    """Non-multiple batch sizes pad internally; results still identical."""
    grid = S.build_strategy_grid(score_thresholds=(300,), dice_thresholds=(2,))
    k, b = 2, 5170  # odd size above the compaction threshold
    ids = np.random.default_rng(2).integers(0, len(grid), size=(b, k))
    p = S.pack_strategy_params([grid[int(i)] for i in ids.reshape(-1)])
    st = jnp.asarray(p.score_threshold.reshape(b, k))
    dt = jnp.asarray(p.dice_threshold.reshape(b, k))
    fl = jnp.asarray(p.flags.reshape(b, k))
    base = rng.purpose_base_key(rng.RandomPurpose.PLAYER, root_seed=3, k=k)
    kd = gk.game_key_data_for_games(base, jnp.arange(b))
    plain = jax.jit(lambda *a: gk.play_games(*a, compact=False))(kd, st, dt, fl)
    compacted = jax.jit(lambda *a: gk.play_games(*a, compact=True))(kd, st, dt, fl)
    for name in gk.GameResult._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(plain, name)),
            np.asarray(getattr(compacted, name)),
            err_msg=name,
        )


def test_take_impls_equivalent():
    """nonzero/searchsorted take-index variants == partition results."""
    import numpy as np
    import jax, jax.numpy as jnp

    from farkle_ii_tpu.ops import game_kernel as gk, rng
    from farkle_ii_tpu.simulation import strategies as S

    k, B = 2, 4096 + 128  # compaction active, odd size
    grid = S.build_strategy_grid()
    ids = np.random.default_rng(3).integers(0, len(grid), size=(B, k))
    p = S.pack_strategy_params([grid[i] for i in ids.ravel()])
    st = jnp.asarray(p.score_threshold).reshape(B, k)
    dt = jnp.asarray(p.dice_threshold).reshape(B, k)
    fl = jnp.asarray(p.flags).reshape(B, k)
    base = rng.purpose_base_key(
        rng.RandomPurpose.TOURNAMENT_PLAYER, root_seed=7, k=k, shuffle_index=1
    )
    kd = gk.game_key_data_for_games(base, jnp.arange(B))
    outs = {}
    for impl in ("partition", "nonzero", "searchsorted"):
        outs[impl] = jax.jit(
            lambda *x, _i=impl: gk.play_games(
                *x, compact=True, pad_multiple=1024, compact_take_impl=_i
            )
        )(kd, st, dt, fl)
    for impl in ("nonzero", "searchsorted"):
        for name in gk.GameResult._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(outs["partition"], name)),
                np.asarray(getattr(outs[impl], name)),
                err_msg=f"{impl}:{name}",
            )
