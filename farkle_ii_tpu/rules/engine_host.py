"""Host-side reference game engine (oracle for the TPU kernel).

A deliberately simple, pure-Python implementation of the full game loop with
the same semantics as the TPU kernel (and the reference engine at
``/root/reference/src/farkle/game/engine.py`` — re-derived from the rules, not
copied). Its purpose:

* lockstep validation: tests feed it the *same* per-(seat, roll) dice streams
  the kernel draws, and every counter/score/rank must match exactly;
* the interactive ``watch`` command;
* tiny-scale sanity runs without a device.

Dice are supplied by a ``dice_source`` callable ``(seat, roll_index, n) ->
list[int]`` so the engine is RNG-agnostic. ``roll_index`` is the seat's
monotonic roll counter across the whole game (the coordinate the TPU kernel
folds into the seat key).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

from farkle_ii_tpu.rules import oracle
from farkle_ii_tpu.simulation.strategies import FavorDiceOrScore, ThresholdStrategy

ROLL_LIMIT = 1000
DEFAULT_TARGET_SCORE = 10_000
DEFAULT_MAX_ROUNDS = 200

DiceSource = Callable[[int, int, int], Sequence[int]]


@dataclass
class HostPlayer:
    """Per-seat mutable state and counters."""

    seat: int
    strategy: ThresholdStrategy
    score: int = 0
    has_scored: bool = False
    n_turns: int = 0
    n_farkles: int = 0
    n_rolls: int = 0
    highest_turn: int = 0
    smart_five_uses: int = 0
    n_smart_five_dice: int = 0
    smart_one_uses: int = 0
    n_smart_one_dice: int = 0
    n_hot_dice: int = 0


@dataclass
class HostGameResult:
    """Flat outcome mirror of the kernel's GameResult for one game."""

    completed: bool
    winner_seat: int | None
    winning_score: int | None
    margin: int | None
    n_rounds: int
    ranks: list[int | None]
    players: list[HostPlayer] = field(default_factory=list)
    roll_limit_hits: int = 0


class HostGame:
    """Single-game driver with pluggable dice source."""

    def __init__(
        self,
        strategies: Sequence[ThresholdStrategy],
        dice_source: DiceSource,
        *,
        target_score: int = DEFAULT_TARGET_SCORE,
        max_rounds: int = DEFAULT_MAX_ROUNDS,
    ) -> None:
        self.players = [HostPlayer(seat=i, strategy=s) for i, s in enumerate(strategies)]
        self.dice_source = dice_source
        self.target_score = target_score
        self.max_rounds = max_rounds
        self.roll_limit_hits = 0

    # ------------------------------------------------------------------
    def _take_turn(self, p: HostPlayer, *, final_round: bool, score_to_beat: int) -> None:
        p.n_turns += 1
        dice = 6
        turn_score = 0
        rolls_this_turn = 0
        while dice > 0:
            faces = list(self.dice_source(p.seat, p.n_rolls, dice))
            p.n_rolls += 1
            rolls_this_turn += 1
            s = p.strategy
            pts, used, reroll, d5, d1 = oracle.default_score(
                faces,
                turn_score_pre=turn_score,
                smart_five=s.smart_five,
                smart_one=s.smart_one,
                consider_score=s.consider_score,
                consider_dice=s.consider_dice,
                require_both=s.require_both,
                score_threshold=s.score_threshold,
                dice_threshold=s.dice_threshold,
                favor_score=s.favor_dice_or_score is FavorDiceOrScore.SCORE,
            )
            if pts == 0:
                p.n_farkles += 1
                turn_score = 0
                break
            if d5 > 0:
                p.smart_five_uses += 1
                p.n_smart_five_dice += d5
            if d1 > 0:
                p.smart_one_uses += 1
                p.n_smart_one_dice += d1
            dice = 6 if (used == len(faces) and reroll == 0) else reroll
            turn_score += pts

            if s.auto_hot_dice and dice == 6:
                p.n_hot_dice += 1
                if rolls_this_turn >= ROLL_LIMIT:
                    self.roll_limit_hits += 1
                    break
                continue

            running_total = p.score + turn_score
            if final_round and running_total > score_to_beat and not s.run_up_score:
                break
            keep = s.decide(
                turn_score=turn_score,
                dice_left=dice,
                has_scored=p.has_scored,
                score_needed=max(0, self.target_score - running_total),
                final_round=final_round,
                score_to_beat=score_to_beat,
                running_total=running_total,
            )
            if final_round and running_total <= score_to_beat:
                keep = True
            if not keep:
                break
            if rolls_this_turn >= ROLL_LIMIT:
                # kernel-parity deviation from the reference (which raises):
                # force-bank and count it.
                self.roll_limit_hits += 1
                break

        if not p.has_scored and turn_score >= 500:
            p.has_scored = True
        if p.has_scored:
            p.score += turn_score
            p.highest_turn = max(p.highest_turn, turn_score)

    # ------------------------------------------------------------------
    def play(self) -> HostGameResult:
        k = len(self.players)
        final_round = False
        score_to_beat = self.target_score
        rounds = 0
        while rounds < self.max_rounds:
            rounds += 1
            for p in self.players:
                self._take_turn(p, final_round=False, score_to_beat=score_to_beat)
                if not final_round and p.score >= self.target_score:
                    final_round = True
                    score_to_beat = p.score
                    for q in self.players:
                        if q.seat == p.seat:
                            continue
                        self._take_turn(q, final_round=True, score_to_beat=score_to_beat)
                        if q.score > score_to_beat:
                            score_to_beat = q.score
                    break
            if final_round:
                break

        completed = final_round
        order = sorted(self.players, key=lambda q: q.score, reverse=True)
        if completed:
            ranks: list[int | None] = [0] * k
            for r, q in enumerate(order, start=1):
                ranks[q.seat] = r
            winner = order[0]
            runner = order[1] if k > 1 else None
            return HostGameResult(
                completed=True,
                winner_seat=winner.seat,
                winning_score=winner.score,
                margin=winner.score - (runner.score if runner else 0),
                n_rounds=rounds,
                ranks=ranks,
                players=self.players,
                roll_limit_hits=self.roll_limit_hits,
            )
        return HostGameResult(
            completed=False,
            winner_seat=None,
            winning_score=None,
            margin=None,
            n_rounds=rounds,
            ranks=[None] * k,
            players=self.players,
            roll_limit_hits=self.roll_limit_hits,
        )
