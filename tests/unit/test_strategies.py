"""Strategy space tests: grid size parity, encoder determinism, invariants."""

import numpy as np
import pytest

from farkle_ii_tpu.simulation import strategies as S


def test_invariants():
    with pytest.raises(ValueError):
        S.ThresholdStrategy(smart_one=True, smart_five=False)
    with pytest.raises(ValueError):
        S.ThresholdStrategy(require_both=True, consider_score=False)
    S.ThresholdStrategy(smart_one=True, smart_five=True)  # ok


def test_default_grid_size_is_5160():
    # parity anchor: the default grid enumerates exactly 5,160 strategies
    # (SURVEY.md §2.2, derived from the reference's DEFAULT_STRATEGY_GRID)
    enc = S.build_strategy_encoder()
    assert len(enc) == 5160


def test_encoder_bijection_and_order_stability():
    enc = S.build_strategy_encoder()
    for sid in (0, 1, 137, 5159):
        attrs = enc.decode_id(sid)
        combo = tuple(attrs[f] for f in S.STRATEGY_TUPLE_FIELDS)
        assert enc.encode_tuple(combo) == sid
    # second build returns the identical ordering
    enc2 = S.build_strategy_encoder()
    assert enc.tuples == enc2.tuples


def test_grid_strategies_have_ids_and_valid_invariants():
    grid = S.build_strategy_grid(
        score_thresholds=(300, 500), dice_thresholds=(1, 2)
    )
    assert [s.strategy_id for s in grid] == list(range(len(grid)))
    for s in grid:
        assert not (s.smart_one and not s.smart_five)
        assert not (s.require_both and not (s.consider_score and s.consider_dice))


def test_string_roundtrip():
    grid = S.build_strategy_grid(score_thresholds=(300,), dice_thresholds=(2,))
    for s in grid[:50]:
        parsed = S.parse_strategy(str(s))
        assert S.strategy_tuple(parsed) == S.strategy_tuple(s)


def test_inactive_threshold_sentinels():
    opts = S.StrategyGridOptions.from_inputs(
        score_thresholds=(300, 500), dice_thresholds=(0, 2)
    )
    assert opts.inactive_score_threshold == 299
    assert opts.inactive_dice_threshold == -1
    grid = S.build_strategy_grid(score_thresholds=(300, 500), dice_thresholds=(0, 2))
    for s in grid:
        if not s.consider_score:
            assert s.score_threshold == 299
        if not s.consider_dice:
            assert s.dice_threshold == -1


def test_decide_entry_gate_and_final_round():
    s = S.ThresholdStrategy(score_threshold=300, dice_threshold=2)
    # entry gate: must keep rolling below 500 before first score
    assert s.decide(turn_score=400, dice_left=1, has_scored=False)
    # normal banking once thresholds hit
    assert not s.decide(turn_score=400, dice_left=1, has_scored=True)
    # final-round catch-up forces rolling
    assert s.decide(
        turn_score=400, dice_left=1, has_scored=True,
        final_round=True, score_to_beat=10_000, running_total=9_000,
    )
    # ahead in final round without run_up -> bank
    assert not s.decide(
        turn_score=400, dice_left=5, has_scored=True,
        final_round=True, score_to_beat=10_000, running_total=10_500,
    )


def test_decide_require_both_semantics():
    s = S.ThresholdStrategy(
        score_threshold=300, dice_threshold=2, require_both=True
    )
    # require_both: keep rolling while EITHER target unmet
    assert s.decide(turn_score=350, dice_left=5, has_scored=True)  # dice unmet
    assert s.decide(turn_score=100, dice_left=1, has_scored=True)  # score unmet
    assert not s.decide(turn_score=350, dice_left=1, has_scored=True)  # both met


def test_pack_strategy_params_flags():
    s = S.ThresholdStrategy(
        score_threshold=450, dice_threshold=3, smart_five=True, smart_one=True,
        consider_score=True, consider_dice=False, auto_hot_dice=True,
        run_up_score=True, favor_dice_or_score=S.FavorDiceOrScore.DICE,
    )
    p = S.pack_strategy_params([s])
    assert p.score_threshold[0] == 450 and p.dice_threshold[0] == 3
    f = int(p.flags[0])
    assert f & S.FLAG_SMART_FIVE and f & S.FLAG_SMART_ONE
    assert f & S.FLAG_CONSIDER_SCORE and not (f & S.FLAG_CONSIDER_DICE)
    assert f & S.FLAG_AUTO_HOT_DICE and f & S.FLAG_RUN_UP_SCORE
    assert not (f & S.FLAG_FAVOR_SCORE)
    assert p.score_threshold.dtype == np.int32


def test_random_threshold_strategy_valid():
    rng = np.random.default_rng(0)
    for _ in range(100):
        s = S.random_threshold_strategy(rng)
        assert 50 <= s.score_threshold <= 950
        assert 0 <= s.dice_threshold <= 4
