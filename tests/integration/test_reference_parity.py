"""Exact rules parity against the reference implementation itself.

The reference's Numba kernels run as plain Python under an identity-decorator
stub (the same technique its own test suite uses at
``/root/reference/tests/conftest.py:104-113``), which lets us execute the
*actual reference scoring and smart-discard code* and require exact
agreement with this framework's oracle — the strongest possible rules-parity
statement. Statistical engine-level parity is covered by the win-rate
comparison test at the bottom.
"""

import sys
import types
from itertools import product

import numpy as np
import pytest

REFERENCE_SRC = "/root/reference/src"


@pytest.fixture(scope="module")
def reference_scoring():
    """Import the reference scoring stack with numba stubbed to identity."""
    if "numba" not in sys.modules:
        numba_stub = types.ModuleType("numba")

        def njit(*args, **kwargs):
            if args and callable(args[0]):
                return args[0]
            return lambda fn: fn

        numba_stub.njit = njit
        numba_stub.jit = njit
        sys.modules["numba"] = numba_stub
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    scoring_lookup = pytest.importorskip("farkle.game.scoring_lookup")
    scoring = pytest.importorskip("farkle.game.scoring")
    return scoring_lookup, scoring


def test_scoring_exact_parity_all_923_keys(reference_scoring):
    scoring_lookup, _ = reference_scoring
    from farkle_ii_tpu.rules import oracle

    keys = oracle.all_count_keys()
    assert len(keys) == 923
    for key in keys:
        ref = scoring_lookup.evaluate(key)
        ours = oracle.score_counts(key)
        assert tuple(ref) == ours, f"key={key}: reference {ref} != ours {ours}"


def test_smart_discard_exact_parity_sampled(reference_scoring):
    _, scoring = reference_scoring
    from farkle_ii_tpu.rules import oracle

    rng = np.random.default_rng(0)
    checked = 0
    for _ in range(4000):
        n = int(rng.integers(1, 7))
        faces = [int(f) for f in rng.integers(1, 7, size=n)]
        key = tuple(faces.count(f) for f in range(1, 7))
        raw_score, raw_used, _, sf, so = scoring.score_roll_cached(tuple(faces))
        turn_pre = int(rng.integers(0, 8)) * 50
        st = int(rng.integers(1, 12)) * 50
        dt = int(rng.integers(-1, 5))
        smart_five = bool(rng.integers(0, 2))
        smart_one = smart_five and bool(rng.integers(0, 2))
        cs = bool(rng.integers(0, 2))
        cd = bool(rng.integers(0, 2))
        rb = bool(rng.integers(0, 2)) and cs and cd
        favor = bool(rng.integers(0, 2))
        from farkle.simulation.strategies import FavorDiceOrScore

        ref = scoring.decide_smart_discards(
            counts=key, single_fives=sf, single_ones=so,
            raw_score=raw_score, raw_used=raw_used, dice_roll_len=n,
            turn_score_pre=turn_pre, score_threshold=st, dice_threshold=dt,
            smart_five=smart_five, smart_one=smart_one,
            consider_score=cs, consider_dice=cd, require_both=rb,
            favor_dice_or_score=(
                FavorDiceOrScore.SCORE if favor else FavorDiceOrScore.DICE
            ),
        )
        ours = oracle.decide_smart_discards(
            counts=key, single_fives=sf, single_ones=so,
            raw_score=raw_score, raw_used=raw_used, dice_roll_len=n,
            turn_score_pre=turn_pre, score_threshold=st, dice_threshold=dt,
            smart_five=smart_five, smart_one=smart_one,
            consider_score=cs, consider_dice=cd, require_both=rb,
            favor_score=favor,
        )
        assert tuple(ref) == ours, (
            f"faces={faces} pre={turn_pre} st={st} dt={dt} "
            f"sf={smart_five} so={smart_one} cs={cs} cd={cd} rb={rb} "
            f"favor={favor}: reference {ref} != ours {ours}"
        )
        checked += 1
    assert checked == 4000


@pytest.mark.slow
def test_engine_statistical_parity(reference_scoring):
    """Win rates from the reference engine vs our kernel at a matched config.

    Different RNG families -> compare statistically: two-proportion score
    test on P1 win rates over N games of the same 2-strategy matchup must
    not reject at alpha=0.01 (and the rates must be within 5 points).
    """
    del reference_scoring
    import jax
    import jax.numpy as jnp

    from farkle.game.engine import FarkleGame, FarklePlayer
    from farkle.simulation.strategies import ThresholdStrategy as RefStrategy
    from farkle.utils.random import RandomPurpose as RefPurpose, coordinate_rng

    from farkle_ii_tpu.analysis.h2h_inference import two_proportion_score_test
    from farkle_ii_tpu.ops import game_kernel as gk, rng
    from farkle_ii_tpu.simulation import strategies as S

    n_ref, n_ours = 400, 4096
    spec_a = dict(score_threshold=300, dice_threshold=2, smart_five=True)
    spec_b = dict(score_threshold=500, dice_threshold=1)

    # reference games (pure-Python engine, numba stubbed)
    ref_p1_wins = 0
    for game_index in range(n_ref):
        players = [
            FarklePlayer(
                name=f"P{i + 1}",
                strategy=RefStrategy(**spec),
                rng=coordinate_rng(
                    RefPurpose.TOURNAMENT_PLAYER, root_seed=7, k=2,
                    game_index=game_index, seat_index=i,
                ),
            )
            for i, spec in enumerate((spec_a, spec_b))
        ]
        gm = FarkleGame(players, target_score=10_000).play()
        if gm.winner == "P1":
            ref_p1_wins += 1

    # our kernel at scale
    ours_a = S.ThresholdStrategy(**spec_a)
    ours_b = S.ThresholdStrategy(**spec_b)
    p = S.pack_strategy_params([ours_a, ours_b])
    st = jnp.broadcast_to(jnp.asarray(p.score_threshold)[None, :], (n_ours, 2))
    dt = jnp.broadcast_to(jnp.asarray(p.dice_threshold)[None, :], (n_ours, 2))
    fl = jnp.broadcast_to(jnp.asarray(p.flags)[None, :], (n_ours, 2))
    base = rng.purpose_base_key(rng.RandomPurpose.TOURNAMENT_PLAYER, root_seed=7, k=2)
    kd = gk.game_key_data_for_games(base, jnp.arange(n_ours))
    res = jax.jit(gk.play_games)(kd, st, dt, fl)
    ours_p1_wins = int(np.asarray((res.winner_seat == 0) & res.completed).sum())

    result = two_proportion_score_test(ref_p1_wins, n_ref, ours_p1_wins, n_ours)
    ref_rate = ref_p1_wins / n_ref
    ours_rate = ours_p1_wins / n_ours
    assert abs(ref_rate - ours_rate) < 0.05, (ref_rate, ours_rate)
    assert result.p_value > 0.01, (
        f"reference {ref_rate:.3f} vs ours {ours_rate:.3f}: "
        f"p={result.p_value:.4f}"
    )


def test_retired_config_key_coverage():
    """Our retired-key migration map covers every key the reference retires
    (``/root/reference/src/farkle/config.py:62-119``), each with non-empty
    migration guidance."""
    import ast
    from pathlib import Path

    from farkle_ii_tpu.config import RETIRED_CONFIG_KEYS

    src = Path(REFERENCE_SRC) / "farkle" / "config.py"
    if not src.exists():
        pytest.skip("reference tree not mounted")
    # collect the reference's retired keys without importing its module:
    # the literal dict plus the f-string comprehension over analysis.* names
    tree = ast.parse(src.read_text())
    ref_keys: set[str] = set()
    for node in ast.walk(tree):
        targets = []
        if isinstance(node, ast.Assign):
            targets = node.targets
        elif isinstance(node, ast.AnnAssign) and node.value is not None:
            targets = [node.target]
        if targets and any(
            isinstance(t, ast.Name) and t.id == "RETIRED_CONFIG_KEYS"
            for t in targets
        ) and isinstance(node.value, ast.Dict):
            ref_keys |= {
                ast.literal_eval(k) for k in node.value.keys if k is not None
            }
        if isinstance(node, ast.DictComp):
            gen = node.generators[0]
            if isinstance(gen.iter, ast.Tuple):
                names = [ast.literal_eval(e) for e in gen.iter.elts]
                if "run_interseed" in names:
                    ref_keys |= {f"analysis.{n}" for n in names}
    assert len(ref_keys) >= 45, ref_keys
    missing = ref_keys - set(RETIRED_CONFIG_KEYS)
    assert not missing, f"reference retired keys without migration guidance: {missing}"
    assert all(RETIRED_CONFIG_KEYS.values())
