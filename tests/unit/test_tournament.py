"""Tournament aggregation tests: conservation, exactness, shard invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from farkle_ii_tpu.parallel.mesh import make_mesh, sharded_play_and_aggregate
from farkle_ii_tpu.simulation import strategies as S
from farkle_ii_tpu.simulation import tournament as T


@pytest.fixture(scope="module")
def small_grid():
    # 24 strategies -> divisible by k in {2, 3, 4}
    grid = S.build_strategy_grid(
        score_thresholds=(300,),
        dice_thresholds=(2,),
        smart_one_opts=(False,),
        run_up_score_opts=(False,),
    )
    assert len(grid) == 24, len(grid)
    return grid


@pytest.fixture(scope="module")
def params(small_grid):
    p = S.pack_strategy_params(small_grid)
    return (
        jnp.asarray(p.score_threshold),
        jnp.asarray(p.dice_threshold),
        jnp.asarray(p.flags),
    )


def test_spec_validation():
    with pytest.raises(ValueError):
        T.TournamentSpec(root_seed=1, k=5, n_strategies=24)
    spec = T.TournamentSpec(root_seed=1, k=3, n_strategies=24)
    assert spec.games_per_shuffle == 8


def test_shuffle_seat_ids_are_permutations(small_grid):
    spec = T.TournamentSpec(root_seed=7, k=2, n_strategies=24)
    ids = np.asarray(T.shuffle_seat_ids(spec, jnp.arange(5)))
    assert ids.shape == (5, 12, 2)
    for i in range(5):
        assert sorted(ids[i].reshape(-1).tolist()) == list(range(24))
    # distinct shuffles permute differently
    assert not (ids[0] == ids[1]).all()
    # deterministic per coordinate
    again = np.asarray(T.shuffle_seat_ids(spec, jnp.arange(5)))
    np.testing.assert_array_equal(ids, again)


def test_aggregate_conservation_and_wins(params):
    spec = T.TournamentSpec(root_seed=11, k=2, n_strategies=24)
    agg = jax.jit(lambda sh: T.play_and_aggregate(spec, params, sh))(jnp.arange(4))
    acc = T.TournamentAccumulator(24)
    acc.absorb(agg)
    acc.check_conservation()
    # every strategy is seated exactly once per shuffle
    assert (acc.attempted_exposures == 4).all()
    assert acc.games_attempted == 4 * 12
    # winner metric sums only where wins happened
    assert (acc.metric_sums[:, 0] > 0).sum() == (acc.wins > 0).sum()
    # winning_score sums are plausible (>= 10_000 per win)
    won = acc.wins > 0
    assert (acc.metric_sums[won, 0] >= 10_000 * acc.wins[won]).all()
    # exact square sums: sq >= sum^2 / n (Cauchy-Schwarz)
    w = acc.wins[won].astype(float)
    s = acc.metric_sums[won, 0].astype(float)
    q = acc.metric_sq_sums[won, 0].astype(float)
    assert (q * w >= s * s - 1e-6).all()


def test_exact_square_sums_vs_bruteforce(params):
    spec = T.TournamentSpec(root_seed=13, k=3, n_strategies=24)
    result, seat_ids = jax.jit(
        lambda sh: T.play_shuffles(spec, params, sh)
    )(jnp.arange(3))
    agg = T.aggregate(result, seat_ids, 24)
    acc = T.TournamentAccumulator(24)
    acc.absorb(agg)

    metrics, _ = T.winner_metrics(result)
    metrics = np.asarray(metrics)
    seat_ids = np.asarray(seat_ids)
    completed = np.asarray(result.completed)
    winner_seat = np.asarray(result.winner_seat)
    expect_sums = np.zeros((24, T.N_METRICS), dtype=np.int64)
    expect_sq = np.zeros((24, T.N_METRICS), dtype=np.int64)
    for g in range(metrics.shape[0]):
        if not completed[g]:
            continue
        sid = seat_ids[g, winner_seat[g]]
        expect_sums[sid] += metrics[g]
        expect_sq[sid] += metrics[g].astype(np.int64) ** 2
    np.testing.assert_array_equal(acc.metric_sums, expect_sums)
    np.testing.assert_array_equal(acc.metric_sq_sums, expect_sq)


@pytest.mark.slow
def test_batch_split_additivity(params):
    """Playing shuffles in one batch or two must give identical totals."""
    spec = T.TournamentSpec(root_seed=17, k=2, n_strategies=24)
    run = jax.jit(lambda sh: T.play_and_aggregate(spec, params, sh))
    acc_one = T.TournamentAccumulator(24)
    acc_one.absorb(run(jnp.arange(6)))
    acc_two = T.TournamentAccumulator(24)
    acc_two.absorb(run(jnp.arange(4)))
    acc_two.absorb(run(jnp.arange(4, 6)))
    for name in ("wins", "attempted_exposures", "metric_sums", "metric_sq_sums"):
        np.testing.assert_array_equal(getattr(acc_one, name), getattr(acc_two, name))
    assert acc_one.games_completed == acc_two.games_completed


@pytest.mark.slow
def test_sharded_matches_single_device(params):
    """8-virtual-device shard_map totals == single-device totals exactly."""
    spec = T.TournamentSpec(root_seed=23, k=2, n_strategies=24)
    mesh = make_mesh(8)
    sharded = sharded_play_and_aggregate(spec, mesh)
    agg_sharded = sharded(params, jnp.arange(8))
    agg_single = jax.jit(lambda sh: T.play_and_aggregate(spec, params, sh))(
        jnp.arange(8)
    )
    a = T.TournamentAccumulator(24)
    a.absorb(agg_sharded)
    b = T.TournamentAccumulator(24)
    b.absorb(agg_single)
    np.testing.assert_array_equal(a.wins, b.wins)
    np.testing.assert_array_equal(a.metric_sums, b.metric_sums)
    np.testing.assert_array_equal(a.metric_sq_sums, b.metric_sq_sums)
    assert a.games_completed == b.games_completed


def test_accumulator_state_roundtrip(params):
    spec = T.TournamentSpec(root_seed=29, k=2, n_strategies=24)
    agg = jax.jit(lambda sh: T.play_and_aggregate(spec, params, sh))(jnp.arange(2))
    acc = T.TournamentAccumulator(24)
    acc.absorb(agg)
    restored = T.TournamentAccumulator.from_state_dict(acc.state_dict())
    np.testing.assert_array_equal(restored.wins, acc.wins)
    np.testing.assert_array_equal(restored.metric_sq_sums, acc.metric_sq_sums)
    restored.merge(acc)
    assert restored.games_attempted == 2 * acc.games_attempted


@pytest.mark.slow
def test_permutation_aggregate_equals_generic(params):
    """The production permutation-gather aggregation must equal the
    segment-sum reference exactly."""
    spec = T.TournamentSpec(root_seed=31, k=3, n_strategies=24)
    result, seat_ids = jax.jit(
        lambda sh: T.play_shuffles(spec, params, sh)
    )(jnp.arange(5))
    a = T.TournamentAccumulator(24)
    a.absorb(T.aggregate(result, seat_ids, 24))
    accs = {
        "perm": T.aggregate_from_permutation(result, seat_ids, 24, 3),
        "perm-gather": T.aggregate_from_permutation(
            result, seat_ids, 24, 3, metrics_impl="gather"
        ),
        "perm-matmul": T.aggregate_from_permutation(
            result, seat_ids, 24, 3, metrics_impl="matmul"
        ),
    }
    for label, agg in accs.items():
        b = T.TournamentAccumulator(24)
        b.absorb(agg)
        for name in ("wins", "attempted_exposures", "completed_exposures",
                     "safety_limit_exposures", "metric_sums", "metric_sq_sums"):
            np.testing.assert_array_equal(
                getattr(a, name), getattr(b, name), err_msg=f"{label}:{name}"
            )
        assert a.games_attempted == b.games_attempted
        assert a.games_completed == b.games_completed
        assert a.games_safety_limit == b.games_safety_limit


def test_winner_metric_matmul_exact_vs_bruteforce():
    """The MXU limb-plane metric reduction must be exactly integer,
    including at the metric-value bound (< 2^22) and with garbage winner
    ids on zeroed (safety) rows."""
    rng = np.random.default_rng(11)  # test-only stream
    b, m, s = 257, T.N_METRICS, 40
    masked = rng.integers(0, 1 << 22, size=(b, m)).astype(np.int32)
    masked[0] = (1 << 22) - 1  # boundary row
    sid = rng.integers(0, s, size=b).astype(np.int32)
    masked[5] = 0  # safety rows: payload zeroed, sid arbitrary garbage
    sid[5] = s - 1
    sums, hi2, hilo, lo2 = (
        np.asarray(x)
        for x in T.winner_metric_totals_matmul(
            jnp.asarray(masked), jnp.asarray(sid), s
        )
    )
    hi = masked // T._SPLIT
    lo = masked % T._SPLIT
    for arr, vals in (
        (sums, masked), (hi2, hi * hi), (hilo, hi * lo), (lo2, lo * lo)
    ):
        expect = np.zeros((s, m), dtype=np.int64)
        np.add.at(expect, sid, vals.astype(np.int64))
        np.testing.assert_array_equal(arr.astype(np.int64), expect)


def test_pack_unpack_aggregates_roundtrip():
    import numpy as np

    from farkle_ii_tpu.simulation import tournament as T

    s = 12
    rng = np.random.default_rng(3)  # test-only stream, not a production path
    agg = T.TournamentAggregates(
        *[
            (rng.integers(0, 1000, size=shape).astype(np.int32) if shape else np.int32(rng.integers(0, 1000)))
            for shape in T.aggregate_field_shapes(s)
        ]
    )
    packed = T.pack_aggregates(agg)
    back = T.unpack_aggregates(packed, s)
    for a, b in zip(agg, back):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow  # >15 s compile-heavy; ci-full still runs it
def test_block_group_bit_identical_to_per_block_dispatch(params):
    # one big play batch spanning m blocks must reproduce each block's
    # packed aggregate bit-for-bit (coordinate-addressed RNG => batch
    # placement invariance; per-block slicing => identical reductions)
    spec = T.TournamentSpec(root_seed=19, k=3, n_strategies=24)
    m, nsb = 3, 4
    sh = jnp.arange(m * nsb, dtype=jnp.uint32).reshape(m, nsb)
    grouped = np.asarray(
        jax.jit(lambda s: T.play_and_aggregate_blocks(spec, params, s))(sh)
    )
    assert grouped.shape == (m, T.packed_length(24))
    for b in range(m):
        single = np.asarray(
            jax.jit(
                lambda s: T.pack_aggregates(T.play_and_aggregate(spec, params, s))
            )(sh[b])
        )
        np.testing.assert_array_equal(grouped[b], single)


def test_block_group_rejects_oversized_blocks(params):
    spec = T.TournamentSpec(root_seed=19, k=2, n_strategies=24)
    sh = jnp.zeros((1, T.MAX_SHUFFLES_PER_BATCH + 1), dtype=jnp.uint32)
    with pytest.raises(ValueError):
        T.play_and_aggregate_blocks(spec, params, sh)


@pytest.mark.slow  # >15 s compile-heavy; ci-full still runs it
def test_scanned_blocks_bit_identical_to_flat_and_per_block(params):
    # the scan-family group program must reproduce the flat group's and each
    # single block's packed aggregates bit-for-bit (same per-block reductions,
    # different execution schedule)
    spec = T.TournamentSpec(root_seed=19, k=3, n_strategies=24)
    m, nsb = 3, 4
    sh = jnp.arange(m * nsb, dtype=jnp.uint32).reshape(m, nsb)
    scanned = np.asarray(
        jax.jit(lambda s: T.play_and_aggregate_blocks_scanned(spec, params, s))(sh)
    )
    flat = np.asarray(
        jax.jit(lambda s: T.play_and_aggregate_blocks(spec, params, s))(sh)
    )
    np.testing.assert_array_equal(scanned, flat)
    with pytest.raises(ValueError):
        T.play_and_aggregate_blocks_scanned(
            spec, params,
            jnp.zeros((1, T.MAX_SHUFFLES_PER_BATCH + 1), dtype=jnp.uint32),
        )


@pytest.mark.slow  # ~30 s of CPU compiles; the fast sharded-group test
# (tests/unit/test_mesh_steps.py) keeps play_blocks_compact covered
def test_compact_group_fetch_bit_identical(params):
    """play_blocks_compact (per-block counts + 16-bit-limb group metrics)
    must reproduce the per-block aggregation exactly, for both program
    families."""
    spec = T.TournamentSpec(root_seed=37, k=2, n_strategies=24)
    sh = jnp.arange(6, dtype=jnp.uint32).reshape(3, 2)

    want = T.TournamentAccumulator(24)
    for b in range(3):
        want.absorb(
            jax.jit(lambda s_: T.play_and_aggregate(spec, params, s_))(sh[b])
        )

    for family in ("scan", "flat"):
        counts, mlo, mhi = jax.jit(
            lambda s_: T.play_blocks_compact(spec, params, s_, family=family)
        )(sh)
        counts = np.asarray(counts)
        got = T.TournamentAccumulator(24)
        for b in range(3):
            acc_b = T.unpack_block_counts(
                counts[b], 2, spec.games_per_shuffle, 24
            )
            acc_b.check_conservation()
            got.merge(acc_b)
        sums, sq = T.group_metrics_from_limbs(
            np.asarray(mlo), np.asarray(mhi), 24
        )
        got.add_metric_totals(sums, sq)
        for name in ("wins", "attempted_exposures", "completed_exposures",
                     "safety_limit_exposures", "metric_sums", "metric_sq_sums"):
            np.testing.assert_array_equal(
                getattr(want, name), getattr(got, name), err_msg=f"{family}:{name}"
            )
        assert want.games_attempted == got.games_attempted
        assert want.games_safety_limit == got.games_safety_limit
