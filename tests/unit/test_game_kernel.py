"""Lockstep validation: the batched TPU kernel vs the host oracle engine.

Both consume the exact same per-(game, seat, roll) threefry dice streams, so
every score, counter, rank and outcome must match *exactly* — this is the
strongest correctness statement available for the vectorized rewrite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from farkle_ii_tpu.ops import game_kernel as gk
from farkle_ii_tpu.ops import rng
from farkle_ii_tpu.rules.engine_host import HostGame
from farkle_ii_tpu.simulation import strategies as S


MAX_ROLLS = 1024


from functools import partial


@partial(jax.jit, static_argnums=1)
def _all_dice(game_key_data, k: int):
    """Precompute dice for every (game, seat, roll_index) in one XLA call."""
    from farkle_ii_tpu.ops.threefry import roll_dice

    b, _ = game_key_data.shape
    rolls = jnp.arange(MAX_ROLLS, dtype=jnp.uint32)
    seats = jnp.arange(k, dtype=jnp.uint32)
    dice = jax.vmap(  # over games
        lambda kd: jax.vmap(  # over seats
            lambda s: roll_dice(
                jnp.broadcast_to(kd[0], (MAX_ROLLS,)),
                jnp.broadcast_to(kd[1], (MAX_ROLLS,)),
                rolls,
                jnp.broadcast_to(s, (MAX_ROLLS,)),
            )
        )(seats)
    )(game_key_data)
    return dice  # (b, k, MAX_ROLLS, 6)


def make_dice_source(dice_row):
    """Host dice source replaying the kernel's precomputed streams."""

    def source(seat, roll_index, n):
        assert roll_index < MAX_ROLLS
        return [int(x) for x in dice_row[seat, roll_index, :n]]

    return source


def run_lockstep(k, n_games, seed, strategy_pool, target_score=10_000, max_rounds=200):
    rng_np = np.random.default_rng(seed)
    strat_ids = rng_np.integers(0, len(strategy_pool), size=(n_games, k))
    strats = [[strategy_pool[int(strat_ids[g, s])] for s in range(k)] for g in range(n_games)]
    params = S.pack_strategy_params(
        [strategy_pool[int(i)] for i in strat_ids.reshape(-1)]
    )
    st = jnp.asarray(params.score_threshold.reshape(n_games, k))
    dt = jnp.asarray(params.dice_threshold.reshape(n_games, k))
    fl = jnp.asarray(params.flags.reshape(n_games, k))

    base = rng.purpose_base_key(
        rng.RandomPurpose.TOURNAMENT_PLAYER, root_seed=seed, k=k, shuffle_index=0
    )
    key_data = gk.game_key_data_for_games(base, jnp.arange(n_games))

    result = jax.jit(
        lambda kd, a, b, c: gk.play_games(
            kd, a, b, c, target_score=target_score, max_rounds=max_rounds
        )
    )(key_data, st, dt, fl)
    result = jax.tree.map(np.asarray, result)

    all_dice = np.asarray(_all_dice(key_data, k))
    for g in range(n_games):
        host = HostGame(
            strats[g],
            make_dice_source(all_dice[g]),
            target_score=target_score,
            max_rounds=max_rounds,
        ).play()

        ctx = f"game {g} strategies {[str(s) for s in strats[g]]}"
        assert bool(result.completed[g]) == host.completed, ctx
        if host.completed:
            assert int(result.winner_seat[g]) == host.winner_seat, ctx
            assert int(result.winning_score[g]) == host.winning_score, ctx
            assert int(result.margin[g]) == host.margin, ctx
            assert list(result.ranks[g]) == host.ranks, ctx
        assert int(result.n_rounds[g]) == host.n_rounds, ctx
        for s in range(k):
            hp = host.players[s]
            sctx = f"{ctx} seat {s}"
            assert int(result.scores[g, s]) == hp.score, sctx
            assert int(result.n_turns[g, s]) == hp.n_turns, sctx
            assert int(result.n_rolls[g, s]) == hp.n_rolls, sctx
            assert int(result.n_farkles[g, s]) == hp.n_farkles, sctx
            assert int(result.highest_turn[g, s]) == hp.highest_turn, sctx
            assert int(result.smart_five_uses[g, s]) == hp.smart_five_uses, sctx
            assert int(result.n_smart_five_dice[g, s]) == hp.n_smart_five_dice, sctx
            assert int(result.smart_one_uses[g, s]) == hp.smart_one_uses, sctx
            assert int(result.n_smart_one_dice[g, s]) == hp.n_smart_one_dice, sctx
            assert int(result.n_hot_dice[g, s]) == hp.n_hot_dice, sctx
        assert int(result.roll_limit_hits[g]) == host.roll_limit_hits, ctx


@pytest.fixture(scope="module")
def diverse_pool():
    """A strategy pool covering every flag combination class."""
    pool = S.build_strategy_grid(
        score_thresholds=(200, 300, 500), dice_thresholds=(0, 2, 4)
    )
    # thin it out but keep full flag diversity (every 7th + extremes)
    return pool[::7] + [pool[0], pool[-1]]


def test_lockstep_2p(diverse_pool):
    run_lockstep(k=2, n_games=40, seed=101, strategy_pool=diverse_pool)


def test_lockstep_5p(diverse_pool):
    run_lockstep(k=5, n_games=16, seed=202, strategy_pool=diverse_pool)


def test_lockstep_1p(diverse_pool):
    run_lockstep(k=1, n_games=10, seed=303, strategy_pool=diverse_pool)


def test_lockstep_safety_limit(diverse_pool):
    # tiny max_rounds forces safety-limit outcomes through both engines
    run_lockstep(
        k=3, n_games=12, seed=404, strategy_pool=diverse_pool,
        target_score=100_000, max_rounds=3,
    )


def test_lockstep_low_target_final_round(diverse_pool):
    # low target exercises trigger + final-round catch-up heavily
    run_lockstep(
        k=4, n_games=16, seed=505, strategy_pool=diverse_pool, target_score=1_000
    )


def test_smart_discards_flat_matches_grid():
    """Running-best flat formulation == (B, 9) argmax formulation."""
    import numpy as np
    import jax.numpy as jnp

    from farkle_ii_tpu.ops import game_kernel as gk

    rng = np.random.default_rng(11)
    n = 4096
    raw_used = rng.integers(0, 7, n).astype(np.int32)
    roll_n = np.minimum(raw_used + rng.integers(0, 7 - raw_used.max(initial=0), n), 6).astype(np.int32)
    roll_n = np.maximum(roll_n, raw_used)
    sfives = np.minimum(rng.integers(0, 3, n), raw_used).astype(np.int32)
    sones = np.minimum(rng.integers(0, 3, n), raw_used - sfives).astype(np.int32)
    raw_score = (rng.integers(0, 60, n) * 50).astype(np.int32)
    args = dict(
        raw_score=jnp.asarray(raw_score),
        raw_used=jnp.asarray(raw_used),
        sfives=jnp.asarray(np.maximum(sfives, 0)),
        sones=jnp.asarray(np.maximum(sones, 0)),
        roll_n=jnp.asarray(roll_n),
        turn_score=jnp.asarray((rng.integers(0, 40, n) * 50).astype(np.int32)),
        score_threshold=jnp.asarray(rng.choice([200, 300, 500, 1000], n).astype(np.int32)),
        dice_threshold=jnp.asarray(rng.integers(0, 5, n).astype(np.int32)),
        flags=jnp.asarray(rng.integers(0, 256, n).astype(np.int32)),
    )
    grid_d5, grid_d1 = gk._smart_discards(**args)
    flat_d5, flat_d1 = gk._smart_discards_flat(**args)
    np.testing.assert_array_equal(np.asarray(grid_d5), np.asarray(flat_d5))
    np.testing.assert_array_equal(np.asarray(grid_d1), np.asarray(flat_d1))


@pytest.mark.slow
def test_packed_carry_matches_unpacked():
    """PackedState loop == GameState loop, every GameResult field."""
    import numpy as np
    import jax, jax.numpy as jnp

    from farkle_ii_tpu.ops import game_kernel as gk, rng
    from farkle_ii_tpu.simulation import strategies as S

    k, B = 3, 512
    grid = S.build_strategy_grid()
    ids = np.random.default_rng(5).integers(0, len(grid), size=(B, k))
    p = S.pack_strategy_params([grid[i] for i in ids.ravel()])
    st = jnp.asarray(p.score_threshold).reshape(B, k)
    dt = jnp.asarray(p.dice_threshold).reshape(B, k)
    fl = jnp.asarray(p.flags).reshape(B, k)
    base = rng.purpose_base_key(
        rng.RandomPurpose.TOURNAMENT_PLAYER, root_seed=99, k=k, shuffle_index=3
    )
    kd = gk.game_key_data_for_games(base, jnp.arange(B))
    a = jax.jit(lambda *x: gk.play_games(*x, packed=True, compact=False))(kd, st, dt, fl)
    b = jax.jit(lambda *x: gk.play_games(*x, packed=False, compact=False))(kd, st, dt, fl)
    for name in gk.GameResult._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)), err_msg=name
        )


def test_pack_unpack_state_roundtrip():
    import numpy as np
    import jax.numpy as jnp

    from farkle_ii_tpu.ops import game_kernel as gk

    s = gk.init_state(64, 4)
    # perturb fields to non-trivial in-range values
    s = s._replace(
        seat=jnp.full((64,), 2, jnp.int32),
        dice_left=jnp.full((64,), 3, jnp.int32),
        rolls_this_turn=jnp.full((64,), 999, jnp.int32),
        round_num=jnp.full((64,), 200, jnp.int32),
        final_round=jnp.ones((64,), bool),
        trigger_seat=jnp.full((64,), 3, jnp.int32),
        roll_limit_hits=jnp.full((64,), 7, jnp.int32),
        has_scored=tuple(jnp.ones((64,), bool) for _ in range(4)),
        n_turns=tuple(jnp.full((64,), 201, jnp.int32) for _ in range(4)),
        n_farkles=tuple(jnp.full((64,), 77, jnp.int32) for _ in range(4)),
    )
    rt = gk.unpack_state(gk.pack_state(s, 4), 4)
    for name in gk.GameState._fields:
        if name in ("safety", "n_rounds"):
            continue  # derived: defined only for done games
        a, b = getattr(s, name), getattr(rt, name)
        if isinstance(a, tuple):
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=name)
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)
