"""Final-round and entry-gate edge matrix on the host oracle engine.

Mirror of the reference's scripted-RNG final-round suite
(``/root/reference/tests/unit/game/test_engine_final_round.py``): exact
score/turn/rank accounting for hand-built dice scripts around the
final-round trigger, the moving score-to-beat, run-up, and the 500-point
entry gate. The kernel inherits these semantics through the lockstep
suite (tests/unit/test_game_kernel.py feeds the kernel's own dice streams
to this engine and asserts every counter equal), so scripting the host
engine pins the rules themselves.
"""

from __future__ import annotations

import pytest

from farkle_ii_tpu.rules.engine_host import HostGame
from farkle_ii_tpu.simulation.strategies import ThresholdStrategy


def quiet() -> ThresholdStrategy:
    """Bank immediately after any scoring roll (reference _QuietStrategy)."""
    return ThresholdStrategy(
        consider_score=False, consider_dice=False,
        smart_five=False, smart_one=False,
        auto_hot_dice=False, run_up_score=False,
    )


def scripted(per_seat: dict[int, list[list[int]]]):
    """Dice source returning each seat's scripted rolls in order."""
    pos = {seat: 0 for seat in per_seat}

    def source(seat: int, roll_index: int, n: int) -> list[int]:
        del roll_index
        script = per_seat[seat]
        if pos[seat] >= len(script):
            raise AssertionError(f"seat {seat} ran out of scripted rolls")
        faces = script[pos[seat]]
        pos[seat] += 1
        assert len(faces) == n, (seat, faces, n)
        return faces

    return source


def test_final_round_respects_score_to_beat_and_margin():
    """Reference scenario: opener triggers at 500, bust farkles, closer
    banks 2500 (two triplets) — exact scores, margin, rounds, ranks."""
    game = HostGame(
        [quiet(), quiet(), quiet()],
        scripted({
            0: [[5, 5, 5, 2, 3, 4]],  # triple fives: 500, banks, triggers
            1: [[2, 3, 4, 6, 2, 4]],  # farkle in the final round
            2: [[1, 1, 1, 2, 2, 2]],  # two triplets: 2500, banks
        }),
        target_score=500, max_rounds=5,
    )
    out = game.play()
    assert out.completed
    assert out.winner_seat == 2
    assert out.winning_score == 2500
    assert out.margin == 2000
    assert out.n_rounds == 1
    assert [p.score for p in out.players] == [500, 0, 2500]
    assert [p.n_turns for p in out.players] == [1, 1, 1]
    assert [p.n_rolls for p in out.players] == [1, 1, 1]
    assert [p.n_farkles for p in out.players] == [0, 1, 0]
    assert out.ranks == [2, 3, 1]


@pytest.mark.parametrize("trigger_seat", [0, 1, 2])
def test_turn_counts_follow_final_round_trigger_position(trigger_seat):
    """Earlier seats get a normal turn plus one closing turn after a later
    trigger; the trigger seat and later seats play exactly once."""
    scripts: dict[int, list[list[int]]] = {}
    for seat in range(3):
        if seat == trigger_seat:
            scripts[seat] = [[1, 1, 1, 2, 2, 2]]  # 2500: triggers at 2000
        elif seat < trigger_seat:
            scripts[seat] = [
                [5, 5, 5, 2, 3, 4],  # normal turn: banks 500
                [2, 3, 4, 6, 2, 4],  # closing turn: farkle
            ]
        else:
            scripts[seat] = [[2, 3, 4, 6, 2, 4]]  # closing turn only
    out = HostGame(
        [quiet(), quiet(), quiet()], scripted(scripts),
        target_score=2_000, max_rounds=5,
    ).play()
    assert out.completed
    assert out.winner_seat == trigger_seat
    assert [p.n_turns for p in out.players] == [
        2 if seat < trigger_seat else 1 for seat in range(3)
    ]


def test_moving_score_to_beat_within_final_round():
    """A final-round overtake raises the bar for every later seat."""
    game = HostGame(
        [quiet(), quiet(), quiet()],
        scripted({
            0: [[5, 5, 5, 2, 3, 4]],  # 500: triggers, beat = 500
            # roll 1: two lone ones = 200 of 6, reroll 4; 200 <= 500 ->
            # forced keep. roll 2 (4 dice): triple fours +400 -> 600,
            # ahead -> banks; beat moves to 600
            1: [[1, 1, 2, 3, 4, 6], [4, 4, 4, 2]],
            # roll 1: 150 of 6 (lone 1 + lone 5; NOT a straight), reroll
            # 4; 150 <= 600 (the MOVED bar) -> forced keep. roll 2: farkle.
            2: [[1, 5, 2, 2, 4, 6], [2, 3, 4, 6]],
        }),
        target_score=500, max_rounds=5,
    )
    out = game.play()
    assert out.completed
    assert out.winner_seat == 1
    assert [p.score for p in out.players] == [500, 600, 0]
    assert out.margin == 100


def test_entry_gate_forces_rolling_below_500():
    """A seat that has never banked must keep rolling under 500 points,
    even when its thresholds say bank."""
    eager = ThresholdStrategy(
        score_threshold=50, dice_threshold=5,
        consider_score=True, consider_dice=True,
    )
    game = HostGame(
        [eager],
        scripted({
            0: [
                [5, 2, 3, 4, 6, 6],  # 50 points, threshold met BUT gate unmet
                [5, 2, 3, 4, 6],     # +50 = 100, still under the gate
                [1, 1, 2, 3],        # +200 = 300, still under
                [1, 5],              # +150 = 450, still under
                # hot dice: all remaining dice scored -> fresh six
                [6, 6, 6, 2, 3, 4],  # triple sixes +600 = 1050: banks
            ],
        }),
        target_score=10_000, max_rounds=1,
    )
    out = game.play()
    p = out.players[0]
    assert p.has_scored
    assert p.score == 1050
    assert p.n_rolls == 5
    assert not out.completed  # nobody reached 10k; safety-limited


def test_run_up_score_keeps_rolling_past_the_beat():
    """run_up_score=True ignores the final-round early-exit once ahead —
    and accepts the risk: a run-up farkle forfeits the whole turn."""
    runner = ThresholdStrategy(
        score_threshold=99_999, consider_score=True, consider_dice=False,
        run_up_score=True,
    )
    game = HostGame(
        [quiet(), runner],
        scripted({
            0: [[5, 5, 5, 2, 3, 4]],  # 500: triggers
            1: [
                [1, 1, 1, 2, 2, 2],   # 2500 (two triplets), hot dice; ahead
                #                       but run-up + unmet threshold rolls on
                [2, 3, 4, 6, 2, 4],   # farkle: loses the whole turn
            ],
        }),
        target_score=500, max_rounds=5,
    )
    out = game.play()
    # the run-up farkle wiped seat 1's 2500 -> trigger wins unchallenged
    assert out.winner_seat == 0
    assert out.winning_score == 500
    assert [p.score for p in out.players] == [500, 0]
    assert [p.n_farkles for p in out.players] == [0, 1]


def test_trigger_tie_does_not_win():
    """Exactly matching the score-to-beat is a loss: decide() must keep
    the tied player rolling, and the forced extra roll can farkle."""
    game = HostGame(
        [quiet(), quiet()],
        scripted({
            0: [[5, 5, 5, 2, 3, 4]],  # 500: triggers
            1: [
                [5, 5, 5, 2, 3, 4],   # 500: running == beat -> forced keep
                [2, 3, 4],            # 3 remaining dice: farkle
            ],
        }),
        target_score=500, max_rounds=5,
    )
    out = game.play()
    assert out.completed
    assert out.winner_seat == 0
    assert [p.score for p in out.players] == [500, 0]
    assert out.ranks == [1, 2]
