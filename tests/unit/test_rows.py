"""Row materialization tests: schema, invariants, host cross-check."""

import jax.numpy as jnp
import numpy as np
import pytest

from farkle_ii_tpu.simulation import rows as rows_mod
from farkle_ii_tpu.simulation import strategies as S
from farkle_ii_tpu.simulation import tournament as T
from farkle_ii_tpu.utils.schema_helpers import (
    n_players_from_schema,
    raw_simulation_schema_for,
)


@pytest.fixture(scope="module")
def played():
    grid = S.build_strategy_grid(
        score_thresholds=(300,), dice_thresholds=(2,),
        smart_one_opts=(False,), run_up_score_opts=(False,),
    )
    p = S.pack_strategy_params(grid)
    params = (
        jnp.asarray(p.score_threshold),
        jnp.asarray(p.dice_threshold),
        jnp.asarray(p.flags),
    )
    spec = T.TournamentSpec(root_seed=19, k=3, n_strategies=24)
    result, seat_ids = T.play_shuffles(spec, params, jnp.arange(2))
    return spec, result, np.asarray(seat_ids)


def _table(spec, result, seat_ids):
    g = spec.games_per_shuffle
    shuffle_per_game = np.repeat(np.arange(2, dtype=np.int64), g)
    game_index = np.tile(np.arange(g, dtype=np.int32), 2)
    return rows_mod.rows_table(
        result, seat_ids,
        root_seed=spec.root_seed, k=spec.k,
        shuffle_index=shuffle_per_game, game_index=game_index,
        deterministic_batch_id=0,
        shuffle_seed=np.zeros(len(game_index), dtype=np.int64),
        game_seed=np.arange(len(game_index), dtype=np.int64),
    )


def test_rows_schema_and_validation(played):
    spec, result, seat_ids = played
    table = _table(spec, result, seat_ids)
    assert table.schema.equals(raw_simulation_schema_for(3))
    assert table.num_rows == 2 * spec.games_per_shuffle
    rows_mod.validate_rows_table(table)
    assert n_players_from_schema(table.schema) == 3


def test_rows_match_result_arrays(played):
    spec, result, seat_ids = played
    table = _table(spec, result, seat_ids)
    completed = np.asarray(result.completed)
    winner_seat = np.asarray(result.winner_seat)
    d = table.to_pydict()
    for g in range(table.num_rows):
        if completed[g]:
            w = winner_seat[g]
            assert d["winner_seat"][g] == f"P{w + 1}"
            assert d["winner_strategy"][g] == seat_ids[g, w]
            assert d["winning_score"][g] == int(np.asarray(result.winning_score)[g])
            # seat_ranks[0] is the winner's seat name
            assert d["seat_ranks"][g][0] == f"P{w + 1}"
            # loss margins: winner 0, others positive
            assert d[f"P{w + 1}_loss_margin"][g] == 0
        else:
            assert d["winner_seat"][g] is None
            assert d["winner_strategy"][g] is None
            assert d["seat_ranks"][g] == [None, None, None]


def test_validation_rejects_fabricated_winner(played):
    spec, result, seat_ids = played
    table = _table(spec, result, seat_ids)
    bad = table.set_column(
        table.schema.get_field_index("termination_status"),
        "termination_status",
        [["safety_limit"] * table.num_rows],
    )
    with pytest.raises(ValueError):
        rows_mod.validate_rows_table(bad)


def test_coordinate_fingerprints_deterministic():
    a = rows_mod.coordinate_fingerprints(
        102, root_seed=1, k=2, shuffle_index=np.arange(4), game_index=np.arange(4)
    )
    b = rows_mod.coordinate_fingerprints(
        102, root_seed=1, k=2, shuffle_index=np.arange(4), game_index=np.arange(4)
    )
    np.testing.assert_array_equal(a, b)
    assert len(set(a.tolist())) == 4


def test_bit_packed_rows_roundtrip(played):
    """pack_result_rows_bits -> unpack must reproduce every exported field
    exactly (and agree with the wide format), with no overflow on real
    games."""
    spec, result, seat_ids = played
    words, overflow = T.pack_result_rows_bits(result, jnp.asarray(seat_ids))
    assert not bool(np.asarray(overflow))
    slots, n_words = T.row_bits_layout(spec.k)
    assert np.asarray(words).shape == (n_words, seat_ids.shape[0])

    got, got_sids = T.unpack_result_rows_bits(words, spec.k)
    wide = T.pack_result_rows(result, jnp.asarray(seat_ids))
    want, want_sids = T.unpack_result_rows(wide, spec.k)
    np.testing.assert_array_equal(got_sids, want_sids)
    for field in want._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(got, field)),
            np.asarray(getattr(want, field)),
            err_msg=field,
        )


def test_bit_packed_rows_overflow_flag(played):
    """A value beyond its validated width must raise the overflow flag."""
    spec, result, seat_ids = played
    doctored = result._replace(
        winning_score=result.winning_score.at[0].set(1 << 18)
    )
    _, overflow = T.pack_result_rows_bits(doctored, jnp.asarray(seat_ids))
    assert bool(np.asarray(overflow))
