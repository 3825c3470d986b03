"""Tournament-driver negative surface: resume validation, guards, configs.

Mirror of the reference's run_tournament negative tests
(``/root/reference/tests/unit/simulation/test_run_tournament*.py``): a
resume must reject blocks with mismatched coordinates, corrupted payloads,
or missing metric context, and the driver must reject nonsense
configuration rather than degrade silently. All host-side — no kernel
compiles — so the whole file runs in milliseconds.
"""

from __future__ import annotations

import numpy as np
import pytest

from farkle_ii_tpu.simulation import tournament as T
from farkle_ii_tpu.simulation import runner as R


@pytest.fixture()
def block(tmp_path):
    """One persisted 24-strategy block with known coordinates."""
    acc = T.TournamentAccumulator(24)
    acc.wins[:] = 1
    acc.attempted_exposures[:] = 3
    acc.completed_exposures[:] = 3
    acc.games_attempted = 24
    acc.games_completed = 24
    coords = {
        "batch_id": 4, "root_seed": 7, "k": 3,
        "shuffle_lo": 8, "shuffle_hi": 10, "games_per_shuffle": 12,
    }
    path = tmp_path / "block_000004.npz"
    R.save_block_aggregate(path, acc, batch_id=4, coordinates=coords)
    return path, coords


def test_resume_accepts_exact_coordinates(block):
    path, coords = block
    acc = R.load_block_aggregate(path, expected_coordinates=coords)
    assert acc.games_attempted == 24


@pytest.mark.parametrize(
    "key,wrong",
    [
        ("root_seed", 8),
        ("k", 4),
        ("shuffle_lo", 0),
        ("games_per_shuffle", 9),
        ("dice_stream", 1),
    ],
)
def test_resume_rejects_mismatched_coordinates(block, key, wrong):
    path, coords = block
    bad = dict(coords, **{key: wrong})
    with pytest.raises(ValueError, match="coordinate|dice_stream|mismatch"):
        R.load_block_aggregate(path, expected_coordinates=bad)


def test_resume_rejects_counts_only_without_group_context(block, tmp_path):
    acc = R.load_block_aggregate(block[0], expected_coordinates=block[1])
    coords = dict(block[1], counts_only=True)
    path = tmp_path / "counts_only.npz"
    R.save_block_aggregate(path, acc, batch_id=4, coordinates=coords)
    with pytest.raises(ValueError, match="counts-only"):
        R.load_block_aggregate(path, expected_coordinates=block[1])
    # but the group-resume path may absorb it explicitly
    got = R.load_block_aggregate(
        path, expected_coordinates=block[1], allow_counts_only=True
    )
    assert got.games_attempted == 24


def test_resume_rejects_corrupted_payload(block):
    path, coords = block
    raw = bytearray(path.read_bytes())
    raw[len(raw) // 2] ^= 0xFF
    path.write_bytes(bytes(raw))
    with pytest.raises(Exception):  # sidecar hash mismatch surfaces
        R.load_block_aggregate(path, expected_coordinates=coords)


def test_group_metrics_reject_mismatched_coordinates(tmp_path):
    sums = np.ones((24, T.N_METRICS), dtype=np.int64)
    sq = np.ones((24, T.N_METRICS), dtype=np.int64)
    coords = {"batch_lo": 0, "batch_hi": 4, "root_seed": 7, "k": 3}
    path = tmp_path / "group.npz"
    R.save_group_metrics(path, sums, sq, coordinates=coords)
    got_sums, got_sq = R.load_group_metrics(path, expected_coordinates=coords)
    np.testing.assert_array_equal(got_sums, sums)
    with pytest.raises(ValueError, match="coordinates"):
        R.load_group_metrics(
            path, expected_coordinates=dict(coords, batch_hi=8)
        )


def test_resolve_game_impl_contract():
    assert R.resolve_game_impl("xla", 12) == "xla"
    assert R.resolve_game_impl("pallas", 2) == "pallas"
    # auto on CPU always picks the XLA kernel (Mosaic needs a real TPU)
    assert R.resolve_game_impl("auto", 12) == "xla"
    with pytest.raises(ValueError, match="game_impl"):
        R.resolve_game_impl("cuda", 5)


def test_play_games_rejects_unknown_impl():
    import jax.numpy as jnp

    from farkle_ii_tpu.ops import game_kernel as gk

    kd = jnp.zeros((4, 2), dtype=jnp.uint32)
    z = jnp.zeros((4, 2), dtype=jnp.int32)
    with pytest.raises(ValueError, match="impl"):
        gk.play_games(kd, z, z, z, impl="tensorcore")
    with pytest.raises(ValueError, match="dice_scheme|prio"):
        gk.play_games(kd, z, z, z, impl="pallas", dice_scheme="2h")


def test_matmul_metrics_rejects_exactness_violation():
    """The bf16 limb reduction must refuse shuffle counts beyond its
    proven-exact bound instead of silently accumulating error."""
    import jax

    spec = T.TournamentSpec(root_seed=1, k=2, n_strategies=4)
    n_over = (1 << 24) // 127 + 2  # shuffles past the bf16-exactness bound

    del jax, spec
    # the guard fires on the implied shuffle count before any compute
    b = n_over * 2  # games = shuffles * (4 strategies / k=2 seats)
    seat_ids = np.zeros((b, 2), dtype=np.int8)  # never touched
    with pytest.raises(ValueError, match="exactness"):
        T.aggregate_from_permutation(None, seat_ids, 4, 2)


def test_unpack_block_counts_conservation():
    spec_games, nsb, gps, s = 16, 2, 8, 24
    counts = np.zeros(2 * s + 3, dtype=np.int64)
    counts[:s] = 0
    counts[-3] = spec_games  # attempted
    counts[-2] = spec_games  # completed
    counts[-1] = 0
    # completed exposures must equal completed * k for conservation;
    # leave them zero -> the accumulator must flag it
    acc = T.unpack_block_counts(counts, nsb, gps, s)
    with pytest.raises(Exception):
        acc.check_conservation()
