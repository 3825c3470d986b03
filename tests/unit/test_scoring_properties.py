"""Property-based scoring tests (reference test_scoring_properties.py analogue).

Hypothesis-driven invariants over the host oracle and the vectorized device
scorer, plus smart-discard optimality against brute force.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from farkle_ii_tpu.rules import oracle

faces_strategy = st.lists(st.integers(1, 6), min_size=1, max_size=6)


@given(faces_strategy)
@settings(max_examples=300, deadline=None)
def test_oracle_scoring_invariants(faces):
    score, used, sf, so = oracle.score_faces(faces)
    n = len(faces)
    assert 0 <= used <= n
    assert (score == 0) == (used == 0)
    assert score % 50 == 0
    assert 0 <= sf <= 2 and 0 <= so <= 2
    assert sf <= faces.count(5) and so <= faces.count(1)
    # lone singles are worth exactly their face value contribution
    if used < n or (sf + so) > 0:  # not a six-dice special
        assert score >= 100 * so + 50 * sf


@given(faces_strategy, st.randoms())
@settings(max_examples=200, deadline=None)
def test_scoring_permutation_invariant(faces, rnd):
    shuffled = list(faces)
    rnd.shuffle(shuffled)
    assert oracle.score_faces(faces) == oracle.score_faces(shuffled)


@pytest.mark.slow  # >15 s compile-heavy; ci-full still runs it
@given(st.lists(st.lists(st.integers(1, 6), min_size=6, max_size=6), min_size=1, max_size=32))
@settings(max_examples=50, deadline=None)
def test_vectorized_scorer_matches_oracle(rolls):
    import jax.numpy as jnp

    from farkle_ii_tpu.ops.scoring import faces_to_counts_vec, score_counts_vec

    faces = jnp.asarray(np.array(rolls, dtype=np.int32))
    score, used, sf, so = score_counts_vec(faces_to_counts_vec(faces))
    for i, roll in enumerate(rolls):
        expected = oracle.score_faces(roll)
        got = (int(score[i]), int(used[i]), int(sf[i]), int(so[i]))
        assert got == expected, f"roll {roll}: {got} != {expected}"


@given(
    faces_strategy,
    st.integers(0, 5000),  # turn_score_pre
    st.sampled_from([200, 300, 500, 1000]),
    st.integers(0, 4),
    st.booleans(),  # smart_one
    st.booleans(),  # consider_score
    st.booleans(),  # consider_dice
    st.booleans(),  # favor_score
)
@settings(max_examples=400, deadline=None)
def test_smart_discard_optimality_brute_force(
    faces, turn_pre, st_thresh, dt_thresh, smart_one, cs, cd, favor_score
):
    """The decision equals brute-force argmax over every valid discard pair."""
    raw_score, raw_used, sf, so = oracle.score_faces(faces)
    kwargs = dict(
        counts=[faces.count(f) for f in range(1, 7)],
        single_fives=sf, single_ones=so,
        raw_score=raw_score, raw_used=raw_used,
        dice_roll_len=len(faces), turn_score_pre=turn_pre,
        score_threshold=st_thresh, dice_threshold=dt_thresh,
        smart_five=True, smart_one=smart_one,
        consider_score=cs, consider_dice=cd, require_both=False,
        favor_score=favor_score,
    )
    d5, d1 = oracle.decide_smart_discards(**kwargs)
    # validity of the chosen candidate
    assert 0 <= d5 <= sf
    assert 0 <= d1 <= (so if smart_one else 0)
    if (d5, d1) != (0, 0):
        assert raw_score - 50 * d5 - 100 * d1 > 0
    # brute force: evaluate every candidate exactly as documented
    best_key, best = None, (0, 0)
    if raw_used != len(faces) and (sf > 0 or so > 0):
        for c5 in range(sf + 1):
            for c1 in range((so if smart_one else 0) + 1):
                cand_score = raw_score - 50 * c5 - 100 * c1
                if cand_score <= 0:
                    continue
                score_after = turn_pre + cand_score
                dice_left_after = len(faces) - (raw_used - c5 - c1)
                if oracle.must_bank(
                    score_after, dice_left_after,
                    score_threshold=st_thresh, dice_threshold=dt_thresh,
                    consider_score=cs, consider_dice=cd, require_both=False,
                ):
                    continue
                key = (
                    (score_after, dice_left_after)
                    if favor_score
                    else (dice_left_after, score_after)
                )
                if best_key is None or key > best_key:
                    best_key, best = key, (c5, c1)
    assert (d5, d1) == best
