"""Pallas mega-kernel vs XLA kernel: bit-identical results (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from farkle_ii_tpu.ops import game_kernel as gk, rng
from farkle_ii_tpu.ops.pallas_kernel import play_games_pallas
from farkle_ii_tpu.simulation import strategies as S

pytestmark = pytest.mark.slow  # >15s each: excluded from `make ci`


@pytest.mark.parametrize("k,b", [(2, 256), (5, 128), (3, 200)])  # 200: padding path
def test_pallas_matches_xla(k, b):
    grid = S.build_strategy_grid(
        score_thresholds=(250, 300), dice_thresholds=(0, 2)
    )
    ids = np.random.default_rng(k).integers(0, len(grid), size=(b, k))
    p = S.pack_strategy_params([grid[int(i)] for i in ids.reshape(-1)])
    st = jnp.asarray(p.score_threshold.reshape(b, k))
    dt = jnp.asarray(p.dice_threshold.reshape(b, k))
    fl = jnp.asarray(p.flags.reshape(b, k))
    base = rng.purpose_base_key(
        rng.RandomPurpose.TOURNAMENT_PLAYER, root_seed=31, k=k, shuffle_index=0
    )
    kd = gk.game_key_data_for_games(base, jnp.arange(b))

    xla = jax.jit(lambda *a: gk.play_games(*a, compact=False))(kd, st, dt, fl)
    pallas = play_games_pallas(kd, st, dt, fl, interpret=True)
    for name in gk.GameResult._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(xla, name)),
            np.asarray(getattr(pallas, name)),
            err_msg=name,
        )


def test_pallas_low_target_final_round():
    k, b = 4, 128
    grid = S.build_strategy_grid(score_thresholds=(300,), dice_thresholds=(2,))
    ids = np.random.default_rng(7).integers(0, len(grid), size=(b, k))
    p = S.pack_strategy_params([grid[int(i)] for i in ids.reshape(-1)])
    st = jnp.asarray(p.score_threshold.reshape(b, k))
    dt = jnp.asarray(p.dice_threshold.reshape(b, k))
    fl = jnp.asarray(p.flags.reshape(b, k))
    base = rng.purpose_base_key(rng.RandomPurpose.PLAYER, root_seed=5, k=k)
    kd = gk.game_key_data_for_games(base, jnp.arange(b))
    xla = jax.jit(
        lambda *a: gk.play_games(*a, target_score=1000, compact=False)
    )(kd, st, dt, fl)
    pallas = play_games_pallas(kd, st, dt, fl, target_score=1000, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(xla.winner_seat), np.asarray(pallas.winner_seat)
    )
    np.testing.assert_array_equal(np.asarray(xla.scores), np.asarray(pallas.scores))
