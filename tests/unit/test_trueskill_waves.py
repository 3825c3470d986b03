"""Wave-batched TrueSkill rating: sequential equivalence + scheduling.

The wave pass (run_trueskill.rate_games) must reproduce the per-game
sequential EP pass (reference semantics,
/root/reference/src/farkle/analysis/run_trueskill.py:700) to numerical
noise: games sharing no strategy commute, so the earliest-wave schedule
(native/wave_schedule.cpp) batches only commuting games.
"""

from __future__ import annotations

import numpy as np
import pytest

from farkle_ii_tpu.analysis.run_trueskill import (
    _rate_games_scalar,
    _wave_schedule_py,
    rate_games,
)
from farkle_ii_tpu.analysis.trueskill_model import Rating, TrueSkillEnv


def _random_games(rng, n_games: int, n_strats: int, k: int):
    strategies = np.stack(
        [rng.choice(n_strats, size=k, replace=False) for _ in range(n_games)]
    )
    ranks = np.stack([rng.permutation(k) + 1 for _ in range(n_games)])
    return strategies, ranks


def test_wave_schedule_earliest_conflict_free():
    codes = np.array([[0, 1], [2, 3], [0, 2], [1, 3], [4, 5]], dtype=np.int32)
    waves = _wave_schedule_py(codes, 6)
    # games 0,1 disjoint -> wave 0; games 2,3 conflict with both -> wave 1;
    # game 4 fresh strategies -> wave 0 (earliest, not append-order).
    assert waves.tolist() == [0, 0, 1, 1, 0]
    # schedule invariant: within a wave every strategy appears at most once
    for w in np.unique(waves):
        seen = codes[waves == w].ravel()
        assert len(seen) == len(set(seen.tolist()))


def test_native_wave_schedule_matches_python():
    native = pytest.importorskip("farkle_ii_tpu.native")
    if not native.waves_available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(3)
    codes = np.stack([rng.choice(50, size=4, replace=False) for _ in range(2000)])
    codes = codes.astype(np.int32)
    np.testing.assert_array_equal(
        native.wave_schedule(codes, 50), _wave_schedule_py(codes, 50)
    )


@pytest.mark.parametrize("k", [2, 3, 5])
def test_wave_rating_matches_sequential(k):
    rng = np.random.default_rng(11 + k)
    strategies, ranks = _random_games(rng, 3000, 500, k)
    env = TrueSkillEnv()
    seq = _rate_games_scalar(env, strategies, ranks)
    wave = rate_games(env, strategies, ranks)
    assert seq.keys() == wave.keys()
    for s in seq:
        assert seq[s].mu == pytest.approx(wave[s].mu, abs=1e-9)
        assert seq[s].sigma == pytest.approx(wave[s].sigma, abs=1e-9)


def test_wave_rating_resumes_from_prior_ratings():
    rng = np.random.default_rng(5)
    strategies, ranks = _random_games(rng, 2000, 200, 2)
    env = TrueSkillEnv()
    prior = {7: Rating(30.0, 4.0), 11: Rating(18.5, 6.0)}
    seq = _rate_games_scalar(env, strategies, ranks, ratings=dict(prior))
    wave = rate_games(env, strategies, ranks, ratings=dict(prior))
    for s in seq:
        assert seq[s].mu == pytest.approx(wave[s].mu, abs=1e-9)


def test_wave_rating_blocked_equals_one_shot():
    # per-block invocation (the checkpointed stage path) must chain exactly
    rng = np.random.default_rng(9)
    strategies, ranks = _random_games(rng, 4096, 300, 3)
    env = TrueSkillEnv()
    one = rate_games(env, strategies, ranks)
    acc: dict[int, Rating] = {}
    for lo in range(0, 4096, 1024):
        acc = rate_games(env, strategies[lo : lo + 1024], ranks[lo : lo + 1024], ratings=acc)
    for s in one:
        assert one[s].mu == pytest.approx(acc[s].mu, abs=1e-9)


def test_wave_rating_rejects_non_permutation_ranks():
    strategies = np.tile(np.arange(2), (100, 1)) + np.arange(100)[:, None] * 2
    ranks = np.ones((100, 2), dtype=np.int64)
    with pytest.raises(ValueError):
        rate_games(TrueSkillEnv(), strategies, ranks)


def test_duplicate_strategy_games_fall_back_to_scalar_semantics():
    rng = np.random.default_rng(2)
    strategies, ranks = _random_games(rng, 200, 50, 2)
    strategies[17] = [3, 3]  # self-play row
    seq = _rate_games_scalar(TrueSkillEnv(), strategies, ranks)
    wave = rate_games(TrueSkillEnv(), strategies, ranks)
    for s in seq:
        assert seq[s].mu == pytest.approx(wave[s].mu, abs=1e-12)
