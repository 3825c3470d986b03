"""Scoring-oracle unit tests: hand-computed rule cases + structural invariants."""

import itertools

import pytest

from farkle_ii_tpu.rules import oracle


def faces_to_counts(faces):
    return tuple(list(faces).count(f) for f in range(1, 7))


# (faces, expected (score, used, single_fives, single_ones))
CASES = [
    # singles
    ([1], (100, 1, 0, 1)),
    ([5], (50, 1, 1, 0)),
    ([2], (0, 0, 0, 0)),
    ([1, 5], (150, 2, 1, 1)),
    ([2, 3, 4, 6], (0, 0, 0, 0)),
    ([1, 1], (200, 2, 0, 2)),
    ([5, 5], (100, 2, 2, 0)),
    # triples
    ([1, 1, 1], (300, 3, 0, 0)),
    ([2, 2, 2], (200, 3, 0, 0)),
    ([5, 5, 5], (500, 3, 0, 0)),
    ([6, 6, 6], (600, 3, 0, 0)),
    ([3, 3, 3, 1, 5], (450, 5, 1, 1)),
    # n-of-a-kind
    ([4, 4, 4, 4], (1000, 4, 0, 0)),
    ([2, 2, 2, 2, 2], (2000, 5, 0, 0)),
    ([3, 3, 3, 3, 3, 3], (3000, 6, 0, 0)),
    ([1, 1, 1, 1], (1000, 4, 0, 0)),
    # six-dice specials
    ([1, 2, 3, 4, 5, 6], (1500, 6, 0, 0)),
    ([2, 2, 3, 3, 4, 4], (1500, 6, 0, 0)),
    ([1, 1, 5, 5, 6, 6], (1500, 6, 0, 0)),  # three pairs beats singles
    ([2, 2, 2, 3, 3, 3], (2500, 6, 0, 0)),
    ([1, 1, 1, 5, 5, 5], (2500, 6, 0, 0)),  # two triplets beats 300+500
    ([4, 4, 4, 4, 2, 2], (1500, 6, 0, 0)),
    ([1, 1, 1, 1, 5, 5], (1500, 6, 0, 0)),  # 4-kind+pair beats 1000+100
    # mixed sets + singles
    ([2, 2, 2, 1, 5], (350, 5, 1, 1)),
    ([6, 6, 6, 5, 5], (700, 5, 2, 0)),
    ([4, 4, 4, 2, 3, 6], (400, 3, 0, 0)),
    # 4-kind + non-pair remainder is NOT the special
    ([4, 4, 4, 4, 2, 3], (1000, 4, 0, 0)),
    ([5, 5, 5, 5, 1, 2], (1100, 5, 0, 1)),  # four fives (1000) + lone one
]


@pytest.mark.parametrize("faces,expected", CASES)
def test_score_faces_cases(faces, expected):
    assert oracle.score_faces(faces) == expected


def test_score_counts_validation():
    with pytest.raises(ValueError):
        oracle.score_counts((1, 2, 3))
    with pytest.raises(ValueError):
        oracle.score_counts((-1, 0, 0, 0, 0, 0))
    with pytest.raises(ValueError):
        oracle.score_counts((7, 0, 0, 0, 0, 0))
    with pytest.raises(ValueError):
        oracle.score_faces([0])
    with pytest.raises(ValueError):
        oracle.score_faces([7])
    with pytest.raises(ValueError):
        oracle.score_faces([1] * 7)


def test_count_key_enumeration_size():
    # parity anchor: 923 unique nonempty count-keys (reference comment
    # scoring_lookup.py:240)
    assert len(oracle.all_count_keys()) == oracle.N_NONEMPTY_COUNT_KEYS


def test_exhaustive_ordered_rolls_match_counts():
    """Every ordered roll of d dice scores identically to its count multiset."""
    for d in (1, 2, 3):
        for roll in itertools.product(range(1, 7), repeat=d):
            assert oracle.score_faces(roll) == oracle.score_counts(faces_to_counts(roll))


def test_structural_invariants_all_keys():
    for key in oracle.all_count_keys():
        score, used, sf, so = oracle.score_counts(key)
        n = sum(key)
        assert 0 <= used <= n
        assert 0 <= score <= 3000
        assert sf <= key[4] and so <= key[0]
        assert sf + so <= used
        # lone fives/ones are each worth exactly 50/100 on top of set score
        if score > 0:
            assert used > 0
        # removing a lone five reduces score by exactly 50 (the smart-discard
        # table identity the kernel relies on)
        if sf > 0:
            reduced = list(key)
            reduced[4] -= 1
            s2, u2, sf2, so2 = oracle.score_counts(tuple(reduced))
            assert (s2, u2, sf2, so2) == (score - 50, used - 1, sf - 1, so)
        if so > 0:
            reduced = list(key)
            reduced[0] -= 1
            s2, u2, sf2, so2 = oracle.score_counts(tuple(reduced))
            assert (s2, u2, sf2, so2) == (score - 100, used - 1, sf, so - 1)


def test_smart_discards_disabled_cases():
    # not smart_five -> never discard
    assert oracle.decide_smart_discards(
        counts=(1, 0, 0, 0, 1, 0), single_fives=1, single_ones=1,
        raw_score=150, raw_used=2, dice_roll_len=3, turn_score_pre=0,
        score_threshold=300, dice_threshold=2, smart_five=False, smart_one=False,
    ) == (0, 0)
    # all dice used -> never discard
    assert oracle.decide_smart_discards(
        counts=(1, 0, 0, 0, 1, 0), single_fives=1, single_ones=1,
        raw_score=150, raw_used=2, dice_roll_len=2, turn_score_pre=0,
        score_threshold=300, dice_threshold=0, smart_five=True, smart_one=True,
    ) == (0, 0)


def test_smart_discards_basic_five():
    # roll [1,5,2,3]: score 150, used 2, reroll 2. With dice_threshold=2 the
    # (0,0) candidate banks (2 <= 2); discarding the five leaves 3 dice
    # (> threshold) at score 100 -> keep rolling with the five thrown back.
    d5, d1 = oracle.decide_smart_discards(
        counts=(1, 1, 1, 0, 1, 0), single_fives=1, single_ones=1,
        raw_score=150, raw_used=2, dice_roll_len=4, turn_score_pre=0,
        score_threshold=10_000, dice_threshold=2, smart_five=True, smart_one=False,
    )
    assert (d5, d1) == (1, 0)


def test_smart_discards_favor_dice_vs_score():
    # roll [1,1,5,2]: raw 250 used 3. smart_one on. turn_pre=0,
    # thresholds never bank (score_threshold huge, dice_threshold=-1).
    # favor_score picks max (score_after, dice_left) -> keep all (250, 1).
    kwargs = dict(
        counts=(2, 1, 0, 0, 1, 0), single_fives=1, single_ones=2,
        raw_score=250, raw_used=3, dice_roll_len=4, turn_score_pre=0,
        score_threshold=10_000, dice_threshold=-1, smart_five=True, smart_one=True,
    )
    assert oracle.decide_smart_discards(**kwargs, favor_score=True) == (0, 0)
    # favor_dice picks max (dice_left, score_after) -> discard everything
    # discardable that keeps score>0: d5=1,d1=2 -> score 50? 250-50-200=0 ->
    # invalid; best dice_left: d5=1,d1=1 -> score 100, dice_left 3... check:
    # candidates (d5,d1): (1,2)->0 invalid; (0,2)->50, used 1, left 3;
    # (1,1)->100, used 1, left 3; (1,0) -> 200, left 2; (0,1)->150, left 2.
    # max (left, score): (3,100) from (1,1) beats (3,50) from (0,2).
    assert oracle.decide_smart_discards(**kwargs, favor_score=False) == (1, 1)


def test_smart_discards_must_bank_filter():
    # If every candidate (including keep-all) would bank, return (0,0).
    d5, d1 = oracle.decide_smart_discards(
        counts=(0, 1, 1, 1, 1, 0), single_fives=1, single_ones=0,
        raw_score=50, raw_used=1, dice_roll_len=4, turn_score_pre=1000,
        score_threshold=100, dice_threshold=-1, smart_five=True, smart_one=False,
    )
    assert (d5, d1) == (0, 0)


def test_default_score_discard_application():
    final_score, final_used, reroll, d5, d1 = oracle.default_score(
        [1, 5, 2, 3],
        turn_score_pre=0,
        smart_five=True,
        score_threshold=10_000,
        dice_threshold=2,
    )
    assert (final_score, final_used, reroll, d5, d1) == (100, 1, 3, 1, 0)
