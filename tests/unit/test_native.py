"""Native C++ scoring oracle vs Python oracle/tables: exact agreement."""

import numpy as np
import pytest

from farkle_ii_tpu import native
from farkle_ii_tpu.rules import oracle, tables

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_score_counts_exhaustive():
    for key in oracle.all_count_keys():
        assert native.score_counts(key) == oracle.score_counts(key), key


def test_table_matches_python_builder_bytes():
    np.testing.assert_array_equal(
        native.build_score_table(), tables.build_packed_score_table()
    )


def test_batch_scorer_random_rolls():
    rng = np.random.default_rng(0)
    n = 50_000
    faces = np.zeros((n, 6), dtype=np.int8)
    for i in range(n):
        d = rng.integers(1, 7)
        faces[i, :d] = rng.integers(1, 7, size=d)
    out = native.score_rolls(faces)
    # spot-check a sample against the Python oracle
    for i in rng.integers(0, n, size=200):
        active = [int(x) for x in faces[i] if x > 0]
        assert tuple(out[i]) == oracle.score_faces(active)


def test_batch_scorer_validation():
    with pytest.raises(ValueError):
        native.score_rolls(np.zeros((3, 5), dtype=np.int8))
    with pytest.raises(ValueError):
        native.score_counts([1, 2, 3])


@pytest.mark.slow  # >15 s compile-heavy; ci-full still runs it
def test_native_engine_matches_device_kernel():
    """The C++ engine twin is bit-identical to the device kernel on shared
    threefry streams — a third independent implementation of the full game
    loop (scoring, smart discards, entry gate, hot dice, final round,
    safety limit) triangulating the rules."""
    import jax, jax.numpy as jnp

    from farkle_ii_tpu import native as N
    from farkle_ii_tpu.ops import game_kernel as gk, rng
    from farkle_ii_tpu.simulation import strategies as S

    if not N.engine_available():
        pytest.skip("native toolchain unavailable")

    k, B = 3, 768
    grid = S.build_strategy_grid()
    ids = np.random.default_rng(17).integers(0, len(grid), size=(B, k))
    p = S.pack_strategy_params([grid[i] for i in ids.ravel()])
    st = np.asarray(p.score_threshold).reshape(B, k)
    dt = np.asarray(p.dice_threshold).reshape(B, k)
    fl = np.asarray(p.flags).reshape(B, k)
    base = rng.purpose_base_key(
        rng.RandomPurpose.TOURNAMENT_PLAYER, root_seed=5, k=k, shuffle_index=2
    )
    kd = np.asarray(gk.game_key_data_for_games(base, jnp.arange(B)))

    native = N.play_games(kd, st, dt, fl)
    device = jax.jit(gk.play_games)(
        jnp.asarray(kd), jnp.asarray(st), jnp.asarray(dt), jnp.asarray(fl)
    )

    np.testing.assert_array_equal(native["completed"], np.asarray(device.completed))
    np.testing.assert_array_equal(native["winner_seat"], np.asarray(device.winner_seat))
    np.testing.assert_array_equal(native["winning_score"], np.asarray(device.winning_score))
    np.testing.assert_array_equal(native["margin"], np.asarray(device.margin))
    np.testing.assert_array_equal(native["n_rounds"], np.asarray(device.n_rounds))
    comp = native["completed"]
    np.testing.assert_array_equal(
        native["ranks"][comp], np.asarray(device.ranks)[comp]
    )
    for name in ("scores", "n_farkles", "n_rolls", "n_turns", "highest_turn",
                 "smart_five_uses", "n_smart_five_dice", "smart_one_uses",
                 "n_smart_one_dice", "n_hot_dice"):
        np.testing.assert_array_equal(
            native[name], np.asarray(getattr(device, name)), err_msg=name
        )
