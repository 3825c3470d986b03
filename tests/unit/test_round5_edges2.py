"""Round-5 edge tests, batch 2: oracle discards, workload math, accumulators.

Host-side and millisecond-fast; widens the unit surface toward the
reference's (~572 test functions) on the subsystems the round-5 kernel
work touched.
"""

from __future__ import annotations

import numpy as np
import pytest

from farkle_ii_tpu.rules import oracle
from farkle_ii_tpu.simulation import tournament as T
from farkle_ii_tpu.simulation.workload import (
    minimum_shuffles_for_resolution,
    plan_tournament_workload,
    worst_case_wilson_width,
)


def _score(faces, **kw):
    defaults = dict(
        turn_score_pre=0, smart_five=False, smart_one=False,
        consider_score=True, consider_dice=True, require_both=False,
        score_threshold=300, dice_threshold=2, favor_score=True,
    )
    defaults.update(kw)
    return oracle.default_score(list(faces), **defaults)


def test_oracle_smart_five_discard_takes_effect():
    # two lone fives, nothing else: smart five discards one to keep a die
    # (keeping both would end the roll; priorities favor dice retention
    # when favor_score=False)
    pts, used, reroll, d5, d1 = _score(
        [5, 5, 2, 3, 4, 6], smart_five=True, favor_score=False,
        score_threshold=10_000, dice_threshold=0,
    )
    assert d5 >= 1
    assert pts == 50 * (2 - d5)
    assert used == 2 - d5 and reroll == 4 + d5


def test_oracle_smart_five_disabled_keeps_five():
    pts, used, reroll, d5, d1 = _score([2, 2, 2, 5, 3, 4])
    assert (d5, d1) == (0, 0)
    assert pts == 250 and used == 4 and reroll == 2


def test_oracle_smart_one_requires_smart_five():
    # smart_one alone never discards: the chain is gated on smart_five
    pts1, _, _, d5a, d1a = _score(
        [1, 1, 2, 3, 4, 6], smart_five=False, smart_one=True,
        score_threshold=10_000, dice_threshold=0, favor_score=False,
    )
    assert (d5a, d1a) == (0, 0) and pts1 == 200
    pts2, _, _, d5b, d1b = _score(
        [1, 1, 2, 3, 4, 6], smart_five=True, smart_one=True,
        score_threshold=10_000, dice_threshold=0, favor_score=False,
    )
    assert d1b >= 1 and pts2 == 100 * (2 - d1b)


def test_oracle_never_discards_into_zero():
    # a lone five alone cannot be discarded (score must stay positive)
    pts, used, reroll, d5, d1 = _score(
        [5, 2, 3, 4, 6, 6], smart_five=True, score_threshold=10_000,
        dice_threshold=0,
    )
    assert d5 == 0 and pts == 50


def test_oracle_farkle_is_zero_regardless_of_flags():
    pts, *_ = _score([2, 3, 4, 6, 6, 2], smart_five=True, smart_one=True)
    assert pts == 0


def test_wilson_width_monotone_in_shuffles():
    w1 = worst_case_wilson_width(100, confidence=0.95)
    w2 = worst_case_wilson_width(400, confidence=0.95)
    assert w2 < w1 < 1.0


def test_minimum_shuffles_meets_resolution():
    n = minimum_shuffles_for_resolution(0.03, confidence=0.95)
    assert n > 0
    # the minimum actually satisfies the Wilson contract, minimality holds
    assert worst_case_wilson_width(n, confidence=0.95) <= 0.03
    assert worst_case_wilson_width(n - 1, confidence=0.95) > 0.03


def test_plan_shapes_and_invariants():
    plan = plan_tournament_workload(
        root_seed=1, k=5, strategy_count=5160, resolution_delta=0.03,
        confidence=0.95, batch_count=100, min_shuffles_per_batch=30,
    )
    assert plan.shuffles_per_batch >= 30
    assert (
        plan.batch_count * plan.shuffles_per_batch
        >= minimum_shuffles_for_resolution(0.03, confidence=0.95)
    )
    assert plan.games_per_shuffle == 5160 // 5


def test_plan_rejects_bad_resolution():
    with pytest.raises(Exception):
        plan_tournament_workload(
            root_seed=1, k=5, strategy_count=5160, resolution_delta=0.0,
            confidence=0.95,
        )


def test_accumulator_merge_is_commutative():
    a = T.TournamentAccumulator(4)
    b = T.TournamentAccumulator(4)
    rng = np.random.default_rng(3)  # test-only stream
    for acc in (a, b):
        acc.wins[:] = rng.integers(0, 5, 4)
        acc.attempted_exposures[:] = 10
        acc.completed_exposures[:] = 10
        acc.games_attempted = 10
        acc.games_completed = 10
    ab = T.TournamentAccumulator(4)
    ab.merge(a)
    ab.merge(b)
    ba = T.TournamentAccumulator(4)
    ba.merge(b)
    ba.merge(a)
    np.testing.assert_array_equal(ab.wins, ba.wins)
    assert ab.games_attempted == ba.games_attempted


def test_accumulator_rejects_size_mismatch():
    a = T.TournamentAccumulator(4)
    b = T.TournamentAccumulator(5)
    with pytest.raises(Exception):
        a.merge(b)


def test_packed_length_matches_field_shapes():
    s = 24
    assert T.packed_length(s) == sum(
        int(np.prod(shape)) if shape else 1
        for shape in T.aggregate_field_shapes(s)
    )
    vec = np.arange(T.packed_length(s), dtype=np.int32)
    agg = T.unpack_aggregates(vec, s)
    assert agg.metric_sums.shape == (s, T.N_METRICS)
    with pytest.raises(ValueError):
        T.unpack_aggregates(np.arange(T.packed_length(s) + 7), s)


def test_group_metrics_from_limbs_recombines_exactly():
    s = 6
    metr = np.arange(4 * s * T.N_METRICS, dtype=np.int64) * 100_003
    lo = (metr & 0xFFFF).astype(np.int64)
    hi = (metr >> 16).astype(np.int64)
    sums, sq = T.group_metrics_from_limbs(lo, hi, s)
    flat = np.concatenate([sums.ravel(), *[x.ravel() for x in [sq]]])
    # sums reshapes the first quarter; spot-check exact recombination
    np.testing.assert_array_equal(sums.ravel(), metr[: s * T.N_METRICS])


def test_spec_games_per_shuffle_divisibility_guard():
    with pytest.raises(ValueError, match="divisible"):
        T.TournamentSpec(root_seed=0, k=7, n_strategies=24)


def test_metric_labels_are_reference_ordered():
    assert T.METRIC_LABELS[0] == "winning_score"
    assert T.METRIC_LABELS[-1] == "winner_hit_max_rounds"
    assert len(set(T.METRIC_LABELS)) == T.N_METRICS
