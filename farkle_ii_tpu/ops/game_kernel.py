"""Batched Farkle game kernel: one `lax.while_loop` over a game batch.

TPU-native re-design of the reference's per-game Python loops
(``/root/reference/src/farkle/game/engine.py:208`` take_turn, ``:436`` play).
Instead of nested per-turn/per-roll ``while`` statements per game object, the
whole batch advances through a single flattened *roll-step* loop:

* state is a struct-of-arrays over a static batch of ``B`` games with ``K``
  seats each; **per-seat quantities are K-tuples of flat ``(B,)`` arrays**
  (not ``(B, K)`` matrices: flat vectors measured ~1.7-2x higher effective
  HBM bandwidth in the loop carry, and the loop carry is the traffic floor
  of the whole simulation). A packed-carry variant (``PackedState``,
  ``packed=True``: bounded control/counter fields share int32 words, ≈ -30%
  carry bytes) measured ~5% *slower* on v5e — the fori-loop body's carry
  traffic is already amortized by fusion, so the extra unpack/repack ALU
  outweighs the bytes; kept as a tested alternate;
* every iteration performs exactly one roll for the current seat of every
  still-active game: draw dice (two threefry hashes), score with branchless
  vector math, run the vectorized smart-discard scan, apply the
  continue/bank algebra, and handle turn/round/final-round transitions with
  masks. Per-seat reads/updates are unrolled K-way selects over the flat
  arrays — no dynamic gathers anywhere (TPU dynamic gathers measured ~100x
  slower than the equivalent VPU arithmetic);
* games that finish keep riding the loop as masked no-ops until the whole
  batch is done. The loop condition (an any-active reduction) is only
  checked every ``_COND_CHECK_EVERY`` roll-steps — an inner ``fori_loop``
  advances the batch between checks, so the per-iteration reduce+sync cost
  amortizes away (finished games are no-ops, so overshooting is harmless).

Rule semantics match the reference exactly (validated by lockstep tests
against the host oracle engine):

* 500-point entry gate (engine.py:267), hot-dice auto-reroll (engine.py:149),
  final-round catch-up with a moving score-to-beat (engine.py:189-205,523),
  stable seat-order tie-breaking for ranks (engine.py:477), target 10,000,
  ``max_rounds=200`` safety limit with no winner (engine.py:472-489).
* One deliberate deviation: the reference *raises* when a single turn exceeds
  ``ROLL_LIMIT=1000`` rolls (engine.py:241-243), killing the whole run. A
  vectorized kernel cannot raise per game, so the turn is force-banked
  instead and counted in ``roll_limit_hits`` (always 0 in practice; the limit
  is unreachable for real strategies).

Randomness: each *game* owns a coordinate-addressed threefry key (the fold
chain evaluated at seat 0); each roll hashes the counter words
``(roll_index, seat * 4 + block)``, so dice streams are pure functions of
``(coordinates..., seat, roll_index)`` — independent of batch placement,
shard layout, and iteration order, which is the TPU analogue of the
reference's "worker order is not a coordinate" rule.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from farkle_ii_tpu.ops.scoring import score_packed_flat
from farkle_ii_tpu.ops.threefry import roll_dice_words, roll_faces_1h

ROLL_LIMIT = 1000
DEFAULT_TARGET_SCORE = 10_000

# version of the production dice-stream definition (``dice_scheme`` default:
# "1h" mixed-radix = 2; the round-1/2 "2h" stream = 1). Changing the stream
# changes outcomes, so persisted per-block aggregates record this and a
# resume never merges blocks played under a different stream.
DICE_STREAM_VERSION = 2
DEFAULT_MAX_ROUNDS = 200

# Strategy flag bits — must match farkle_ii_tpu.simulation.strategies.
FLAG_SMART_FIVE = 1 << 0
FLAG_SMART_ONE = 1 << 1
FLAG_CONSIDER_SCORE = 1 << 2
FLAG_CONSIDER_DICE = 1 << 3
FLAG_REQUIRE_BOTH = 1 << 4
FLAG_AUTO_HOT_DICE = 1 << 5
FLAG_RUN_UP_SCORE = 1 << 6
FLAG_FAVOR_SCORE = 1 << 7

# 9 smart-discard candidates: d5 outer 0..2, d1 inner 0..2. Lone fives/ones
# are provably <= 2 each (three or more of a face form a set), so 3x3 covers
# the whole candidate space. Selection is order-independent because candidate
# keys are provably unique.
_CAND_D5 = jnp.arange(9, dtype=jnp.int32) // 3
_CAND_D1 = jnp.arange(9, dtype=jnp.int32) % 3

# roll-steps between active-count checks of the outer while condition
_COND_CHECK_EVERY = 8


class GameState(NamedTuple):
    """Struct-of-arrays state for a batch of B games with K seats.

    Per-seat fields are K-tuples of ``(B,)`` int32 (bool for has_scored);
    per-game fields are flat ``(B,)`` arrays.
    """

    # per-seat: K-tuples of (B,)
    scores: tuple
    has_scored: tuple  # bool
    n_turns: tuple
    n_farkles: tuple
    n_rolls: tuple
    highest_turn: tuple
    smart_five_uses: tuple
    n_smart_five_dice: tuple
    smart_one_uses: tuple
    n_smart_one_dice: tuple
    n_hot_dice: tuple
    # per-game (B,) int32 unless noted
    turn_score: jax.Array
    dice_left: jax.Array
    seat: jax.Array
    round_num: jax.Array
    rolls_this_turn: jax.Array
    final_round: jax.Array  # bool
    score_to_beat: jax.Array
    trigger_seat: jax.Array
    done: jax.Array  # bool
    safety: jax.Array  # bool
    n_rounds: jax.Array
    roll_limit_hits: jax.Array
    step: jax.Array  # () int32 global iteration counter


class GameResult(NamedTuple):
    """Final per-game outputs (host-decodable)."""

    scores: jax.Array  # (B, K)
    ranks: jax.Array  # (B, K) 1-based; undefined content for safety games
    completed: jax.Array  # (B,) bool
    winner_seat: jax.Array  # (B,) 0-based; -1 for safety games
    winning_score: jax.Array  # (B,)
    margin: jax.Array  # (B,) victory margin; 0 for safety games
    n_rounds: jax.Array  # (B,)
    # per-seat counters (B, K)
    n_farkles: jax.Array
    n_rolls: jax.Array
    n_turns: jax.Array
    highest_turn: jax.Array
    smart_five_uses: jax.Array
    n_smart_five_dice: jax.Array
    smart_one_uses: jax.Array
    n_smart_one_dice: jax.Array
    n_hot_dice: jax.Array
    roll_limit_hits: jax.Array  # (B,)


def init_state(batch: int, k: int) -> GameState:
    """Fresh game state: seat 0 about to take its first turn of round 1."""
    bi = (batch,)
    zeros = jnp.zeros(bi, dtype=jnp.int32)
    ones = jnp.ones(bi, dtype=jnp.int32)
    false = jnp.zeros(bi, dtype=bool)

    def zt():
        return tuple(zeros for _ in range(k))

    return GameState(
        scores=zt(),
        has_scored=tuple(false for _ in range(k)),
        n_turns=(ones, *[zeros for _ in range(k - 1)]),
        n_farkles=zt(),
        n_rolls=zt(),
        highest_turn=zt(),
        smart_five_uses=zt(),
        n_smart_five_dice=zt(),
        smart_one_uses=zt(),
        n_smart_one_dice=zt(),
        n_hot_dice=zt(),
        turn_score=zeros,
        dice_left=jnp.full(bi, 6, dtype=jnp.int32),
        seat=zeros,
        round_num=ones,
        rolls_this_turn=zeros,
        final_round=false,
        score_to_beat=jnp.full(bi, DEFAULT_TARGET_SCORE, dtype=jnp.int32),
        trigger_seat=jnp.full(bi, -1, dtype=jnp.int32),
        done=false,
        safety=false,
        n_rounds=zeros,
        roll_limit_hits=zeros,
        step=jnp.zeros((), dtype=jnp.int32),
    )


def _thresholds_continue(turn_score, dice_left, score_threshold, dice_threshold, flags):
    """Branchless threshold continue/bank rule (strategies.py:124 semantics)."""
    consider_score = (flags & FLAG_CONSIDER_SCORE) != 0
    consider_dice = (flags & FLAG_CONSIDER_DICE) != 0
    require_both = (flags & FLAG_REQUIRE_BOTH) != 0
    want_score = consider_score & (turn_score < score_threshold)
    want_dice = consider_dice & (dice_left > dice_threshold)
    both = consider_score & consider_dice
    either = want_score | want_dice
    both_unmet = want_score & want_dice
    return jnp.where(both, jnp.where(require_both, either, both_unmet), either)


def _must_bank(score_after, dice_left_after, score_threshold, dice_threshold, flags):
    """Vectorized bank predicate over the (B, 9) candidate grid."""
    consider_score = ((flags & FLAG_CONSIDER_SCORE) != 0)[:, None]
    consider_dice = ((flags & FLAG_CONSIDER_DICE) != 0)[:, None]
    require_both = ((flags & FLAG_REQUIRE_BOTH) != 0)[:, None]
    hit_score = consider_score & (score_after >= score_threshold[:, None])
    hit_dice = consider_dice & (dice_left_after <= dice_threshold[:, None])
    need_both = consider_score & consider_dice & require_both
    return jnp.where(need_both, hit_score & hit_dice, hit_score | hit_dice)


def _smart_discards(
    *, raw_score, raw_used, sfives, sones, roll_n, turn_score,
    score_threshold, dice_threshold, flags,
):
    """Vectorized Smart-5/Smart-1 discard decision over 9 (d5, d1) candidates.

    Candidate score/used follow from the identity that lone fives/ones are
    worth exactly 50/100 and one die each (scoring.py:196-366 semantics
    without the sequence re-enumeration; see rules/oracle.py for the proof
    obligations, validated exhaustively in tests).
    """
    smart_five = (flags & FLAG_SMART_FIVE) != 0
    smart_one = (flags & FLAG_SMART_ONE) != 0
    favor_score = (flags & FLAG_FAVOR_SCORE) != 0

    enabled = smart_five & (raw_used != roll_n) & ((sfives > 0) | (sones > 0))

    max_d1 = jnp.where(smart_one, sones, 0)
    valid = (_CAND_D5[None, :] <= sfives[:, None]) & (_CAND_D1[None, :] <= max_d1[:, None])
    cand_score = raw_score[:, None] - 50 * _CAND_D5[None, :] - 100 * _CAND_D1[None, :]
    valid &= cand_score > 0
    cand_used = raw_used[:, None] - _CAND_D5[None, :] - _CAND_D1[None, :]
    score_after = turn_score[:, None] + cand_score
    dice_left_after = roll_n[:, None] - cand_used
    valid &= ~_must_bank(score_after, dice_left_after, score_threshold, dice_threshold, flags)

    # Lexicographic (major, minor) packed into one int32 rank. Bounds: turn
    # scores are < ROLL_LIMIT * 3000 + 3000 < 2**22, dice_left_after <= 6.
    rank = jnp.where(
        favor_score[:, None],
        score_after * 8 + dice_left_after,
        dice_left_after * (1 << 22) + score_after,
    )
    rank = jnp.where(valid, rank, jnp.int32(-1))
    best = jnp.argmax(rank, axis=1)
    has_valid = jnp.any(valid, axis=1)
    take = enabled & has_valid
    d5 = jnp.where(take, _CAND_D5[best], 0)
    d1 = jnp.where(take, _CAND_D1[best], 0)
    return d5, d1


def _must_bank_flat(score_after, dice_left_after, score_threshold, dice_threshold, flags):
    """Flat-array bank predicate (same rule as :func:`_must_bank`)."""
    consider_score = (flags & FLAG_CONSIDER_SCORE) != 0
    consider_dice = (flags & FLAG_CONSIDER_DICE) != 0
    require_both = (flags & FLAG_REQUIRE_BOTH) != 0
    hit_score = consider_score & (score_after >= score_threshold)
    hit_dice = consider_dice & (dice_left_after <= dice_threshold)
    need_both = consider_score & consider_dice & require_both
    return jnp.where(need_both, hit_score & hit_dice, hit_score | hit_dice)


def _smart_discards_flat(
    *, raw_score, raw_used, sfives, sones, roll_n, turn_score,
    score_threshold, dice_threshold, flags,
):
    """Flat-array twin of :func:`_smart_discards`: nine candidates unrolled
    as a running-best chain over (B,) arrays instead of a (B, 9) grid with a
    cross-axis argmax — one fusable elementwise DAG, no lane-padded
    intermediate. Selection is order-independent (candidate ranks are
    provably unique), so the running strict-max matches argmax exactly.
    """
    smart_five = (flags & FLAG_SMART_FIVE) != 0
    smart_one = (flags & FLAG_SMART_ONE) != 0
    favor_score = (flags & FLAG_FAVOR_SCORE) != 0

    enabled = smart_five & (raw_used != roll_n) & ((sfives > 0) | (sones > 0))
    max_d1 = jnp.where(smart_one, sones, 0)

    # candidate ranks differ from the (0,0) rank by compile-time constants
    # (each discarded five shifts the packed rank by exactly -399 / each one
    # by -799 under favor_score, and by (1<<22)-50 / (1<<22)-100 under
    # favor_dice), so the per-candidate rank is one constant-select + add
    # instead of re-deriving the packed key. The step is VPU-issue-bound;
    # every op in this 9x chain counts.
    consider_score = (flags & FLAG_CONSIDER_SCORE) != 0
    consider_dice = (flags & FLAG_CONSIDER_DICE) != 0
    need_both = consider_score & consider_dice & ((flags & FLAG_REQUIRE_BOTH) != 0)
    base_sa = turn_score + raw_score
    base_dl = roll_n - raw_used
    rank_base = jnp.where(
        favor_score, base_sa * 8 + base_dl, base_dl * (1 << 22) + base_sa
    )

    best_rank = jnp.full_like(raw_score, -1)
    best_d5 = jnp.zeros_like(raw_score)
    best_d1 = jnp.zeros_like(raw_score)
    for d5c in range(3):
        for d1c in range(3):
            score_delta = 50 * d5c + 100 * d1c
            valid = (d5c <= sfives) & (d1c <= max_d1)
            valid &= raw_score > score_delta
            score_after = base_sa - score_delta
            dice_left_after = base_dl + (d5c + d1c)
            hit_score = consider_score & (score_after >= score_threshold)
            hit_dice = consider_dice & (dice_left_after <= dice_threshold)
            bank = jnp.where(need_both, hit_score & hit_dice, hit_score | hit_dice)
            valid &= ~bank
            off_fs = -399 * d5c - 799 * d1c
            off_fd = ((1 << 22) - 50) * d5c + ((1 << 22) - 100) * d1c
            rank = (
                rank_base
                if d5c == d1c == 0
                else rank_base + jnp.where(favor_score, off_fs, off_fd)
            )
            take = valid & (rank > best_rank)
            best_rank = jnp.where(take, rank, best_rank)
            best_d5 = jnp.where(take, d5c, best_d5)
            best_d1 = jnp.where(take, d1c, best_d1)
    take = enabled & (best_rank >= 0)
    return jnp.where(take, best_d5, 0), jnp.where(take, best_d1, 0)


# Static candidate priorities for the smart-discard scan. The packed-rank
# chain in _smart_discards_flat orders candidates by rank_base + a constant
# per-candidate offset, so the relative order of candidates never depends on
# the data — only on the favor mode. Ordering the offsets once (host-side,
# here) replaces the rank arithmetic with one constant-select per candidate.
#   favor_score offsets: -399*d5 - 799*d1  (descending)
#   favor_dice offsets: (2^22-50)*d5 + (2^22-100)*d1  (descending)
_PRIO_FS = {
    (0, 0): 8, (1, 0): 7, (2, 0): 6, (0, 1): 5, (1, 1): 4,
    (2, 1): 3, (0, 2): 2, (1, 2): 1, (2, 2): 0,
}
_PRIO_FD = {
    (2, 2): 8, (2, 1): 7, (1, 2): 6, (2, 0): 5, (1, 1): 4,
    (0, 2): 3, (1, 0): 2, (0, 1): 1, (0, 0): 0,
}


def _smart_discards_flat_prio(
    *, raw_score, raw_used, sfives, sones, roll_n, turn_score,
    score_threshold, dice_threshold, flags,
):
    """Static-priority twin of :func:`_smart_discards_flat`.

    Selection = highest-priority *valid* candidate, with priorities the
    compile-time constants above — provably the same choice as the packed
    rank argmax (rank order across candidates is data-independent; ranks are
    distinct). Saves the rank_base computation and the per-candidate rank
    adds in a VPU-issue-bound step.
    """
    smart_five = (flags & FLAG_SMART_FIVE) != 0
    smart_one = (flags & FLAG_SMART_ONE) != 0
    favor_score = (flags & FLAG_FAVOR_SCORE) != 0

    enabled = smart_five & (raw_used != roll_n) & ((sfives > 0) | (sones > 0))
    max_d1 = jnp.where(smart_one, sones, 0)
    consider_score = (flags & FLAG_CONSIDER_SCORE) != 0
    consider_dice = (flags & FLAG_CONSIDER_DICE) != 0
    need_both = consider_score & consider_dice & ((flags & FLAG_REQUIRE_BOTH) != 0)
    # candidate-loop-invariant margins: hit_score(c) is monotone in the
    # candidate's score delta and hit_dice(c) in its discard count, so both
    # threshold tests collapse to one compare against a precomputed margin.
    # The consider_* gates fold into -1 sentinels (deltas/counts are >= 0,
    # so the compare is then constant-false) — each candidate's bank test
    # costs 5 eqns instead of the former ~10 in a VPU-issue-bound step.
    base_sa = turn_score + raw_score
    base_dl = roll_n - raw_used
    margin_s = jnp.where(consider_score, base_sa - score_threshold, -1)
    margin_d = jnp.where(consider_dice, dice_threshold - base_dl, -1)

    best_prio = jnp.full_like(raw_score, -1)
    best_d5 = jnp.zeros_like(raw_score)
    best_d1 = jnp.zeros_like(raw_score)
    for d5c in range(3):
        for d1c in range(3):
            delta = 50 * d5c + 100 * d1c
            valid = (d5c <= sfives) & (d1c <= max_d1) & (raw_score > delta)
            hit_score = delta <= margin_s  # score_after >= threshold
            hit_dice = (d5c + d1c) <= margin_d  # dice_left_after <= threshold
            bank = jnp.where(need_both, hit_score & hit_dice, hit_score | hit_dice)
            valid &= ~bank
            prio = jnp.where(
                favor_score, _PRIO_FS[(d5c, d1c)], _PRIO_FD[(d5c, d1c)]
            )
            take = valid & (prio > best_prio)
            best_prio = jnp.where(take, prio, best_prio)
            best_d5 = jnp.where(take, d5c, best_d5)
            best_d1 = jnp.where(take, d1c, best_d1)
    take = enabled & (best_prio >= 0)
    return jnp.where(take, best_d5, 0), jnp.where(take, best_d1, 0)


def make_game_step(
    *,
    k: int,
    target_score: int = DEFAULT_TARGET_SCORE,
    max_rounds: int = DEFAULT_MAX_ROUNDS,
    dice_scheme: str = "1h",
    discard_impl: str = "prio",
):
    """Build the single roll-step body for K-seat games.

    Performance notes: per-seat state is K-tuples of flat ``(B,)`` arrays;
    seat reads are unrolled select chains and seat updates unrolled masked
    adds — no dynamic gathers, no ``(B, K)`` carry traffic.

    ``dice_scheme``: ``"1h"`` (default, stream v2) draws six dice from one
    threefry hash by mixed-radix extraction; ``"2h"`` is the round-1/2
    stream (two hashes, four full words + two high halves). ``discard_impl``:
    ``"prio"`` selects the best smart-discard candidate by static priority
    constants; ``"rank"`` is the packed-rank chain. Both choices change only
    speed, never rule semantics; dice_scheme changes the dice stream (and
    therefore outcomes), so it is part of the RNG contract version.
    """

    def step(
        state: GameState,
        k0: jax.Array,  # (B,) uint32 game threefry key word 0
        k1: jax.Array,  # (B,) uint32 game threefry key word 1
        st_t: tuple,  # K x (B,) int32 per-seat score thresholds
        dt_t: tuple,  # K x (B,) int32 per-seat dice thresholds
        fl_t: tuple,  # K x (B,) int32 per-seat flag words
    ) -> GameState:
        active = ~state.done
        seat = state.seat
        seat_is = tuple(seat == i for i in range(k))  # K x (B,) bool

        def gather(tup):
            out = tup[0]
            for i in range(1, k):
                out = jnp.where(seat_is[i], tup[i], out)
            return out

        def bump(tup, inc, mask):
            """tup[seat] += inc where mask (unrolled masked adds)."""
            return tuple(
                jnp.where(mask & seat_is[i], tup[i] + inc, tup[i])
                for i in range(k)
            )

        def set_at_seat(tup, value, mask):
            return tuple(
                jnp.where(mask & seat_is[i], value, tup[i]) for i in range(k)
            )

        st = gather(st_t)
        dt = gather(dt_t)
        flags = gather(fl_t)

        # ---- roll --------------------------------------------------------
        # All-flat formulation: dice stay six separate (B,) words and every
        # scoring/discard intermediate is (B,)-shaped, so the whole roll-step
        # is one elementwise DAG — no (B, 6)/(B, 9) minor dimensions whose
        # lane padding and cross-axis reductions split the fusion and
        # multiply HBM passes over the loop carry.
        roll_n = state.dice_left
        roll_index = gather(state.n_rolls)
        if dice_scheme == "1h":
            faces = roll_faces_1h(
                k0, k1, roll_index.astype(jnp.uint32), seat.astype(jnp.uint32)
            )
        else:
            words = roll_dice_words(
                k0, k1, roll_index.astype(jnp.uint32), seat.astype(jnp.uint32)
            )
            faces = [(w % jnp.uint32(6)).astype(jnp.int32) for w in words]

        n_rolls = bump(state.n_rolls, 1, active)
        rolls_this_turn = jnp.where(active, state.rolls_this_turn + 1, state.rolls_this_turn)

        # ---- score (branchless, no table) ---------------------------------
        # Nibble-packed face counts: each active die contributes 1 << 4*face
        # to one accumulator word (counts <= 6 < 16 per face, no nibble
        # carries), replacing the 36-compare face/count matrix with ~1/3 the
        # vector ops; the SWAR scorer then tests every nibble at once
        # (ops/scoring.score_packed_flat, ~87 eqns vs ~178 for extract +
        # score_counts_flat). The step is VPU-issue-bound, so op count is
        # the cost.
        acc = jnp.zeros_like(roll_n)
        for i, face in enumerate(faces):
            acc = acc + jnp.where(roll_n > i, jnp.int32(1) << (face * 4), 0)
        raw_score, raw_used, sfives, sones = score_packed_flat(acc, roll_n)

        # ---- smart discards ------------------------------------------------
        discards = (
            _smart_discards_flat_prio if discard_impl == "prio"
            else _smart_discards_flat
        )
        d5, d1 = discards(
            raw_score=raw_score, raw_used=raw_used, sfives=sfives, sones=sones,
            roll_n=roll_n, turn_score=state.turn_score,
            score_threshold=st, dice_threshold=dt, flags=flags,
        )
        final_score = raw_score - 50 * d5 - 100 * d1
        final_used = raw_used - d5 - d1
        reroll = roll_n - final_used

        bust = raw_score == 0
        n_farkles = bump(state.n_farkles, 1, active & bust)
        smart_five_uses = bump(state.smart_five_uses, 1, active & (d5 > 0))
        n_smart_five_dice = bump(state.n_smart_five_dice, d5, active & (d5 > 0))
        smart_one_uses = bump(state.smart_one_uses, 1, active & (d1 > 0))
        n_smart_one_dice = bump(state.n_smart_one_dice, d1, active & (d1 > 0))

        # hot dice: all rolled dice scored -> fresh 6 dice
        hot = ~bust & (final_used == roll_n)
        next_dice = jnp.where(hot, 6, reroll)
        turn_score_new = jnp.where(bust, 0, state.turn_score + final_score)

        auto_hot = (flags & FLAG_AUTO_HOT_DICE) != 0
        auto_hot_continue = ~bust & hot & auto_hot
        n_hot_dice = bump(state.n_hot_dice, 1, active & auto_hot_continue)

        # ---- continue / bank decision --------------------------------------
        has_scored_seat = gather(state.has_scored)
        banked = gather(state.scores)
        running_total = banked + turn_score_new
        run_up = (flags & FLAG_RUN_UP_SCORE) != 0
        beat = state.score_to_beat
        keep = _thresholds_continue(turn_score_new, next_dice, st, dt, flags)
        keep |= ~has_scored_seat & (turn_score_new < 500)
        keep |= state.final_round & (running_total <= beat)
        keep &= ~(state.final_round & (running_total > beat) & ~run_up)
        keep |= auto_hot_continue  # hot-dice auto-reroll skips the decision

        hit_roll_limit = rolls_this_turn >= ROLL_LIMIT
        turn_end = bust | ~keep | hit_roll_limit
        roll_limit_hits = jnp.where(
            active & hit_roll_limit & ~bust & keep,
            state.roll_limit_hits + 1,
            state.roll_limit_hits,
        )

        # ---- turn-end bookkeeping ------------------------------------------
        end = active & turn_end
        entered = ~has_scored_seat & (turn_score_new >= 500)
        has_scored_now = has_scored_seat | entered
        bank_amount = jnp.where(end & has_scored_now, turn_score_new, 0)
        bank_mask = end & has_scored_now
        scores = bump(state.scores, bank_amount, bank_mask)
        has_scored = tuple(
            state.has_scored[i] | (bank_mask & seat_is[i]) for i in range(k)
        )
        new_banked = banked + bank_amount
        highest = jnp.maximum(
            gather(state.highest_turn),
            jnp.where(end & has_scored_now, turn_score_new, 0),
        )
        highest_turn = set_at_seat(state.highest_turn, highest, end)

        # trigger: first player to reach the target starts the final round
        triggered = end & ~state.final_round & (new_banked >= target_score)
        final_round = state.final_round | triggered
        trigger_seat = jnp.where(triggered, seat, state.trigger_seat)
        # moving bar: trigger sets it; later final-round banks raise it
        beat = jnp.where(triggered, new_banked, beat)
        final_bank = end & state.final_round & (seat != state.trigger_seat)
        beat = jnp.where(final_bank, jnp.maximum(beat, new_banked), beat)

        # ---- seat advance ----------------------------------------------------
        # Final round: seats 0..K-1 in order, skipping the trigger seat
        # (engine.py:465 keeps original list order). A just-triggered game
        # enters with a virtual seat of -1.
        base_final = jnp.where(triggered, 0, seat + 1)
        cand_final = base_final + (base_final == trigger_seat).astype(jnp.int32)
        finished_final = cand_final >= k
        # Normal round-robin
        cand_normal = (seat + 1) % k
        wrapped = cand_normal == 0
        round_next = jnp.where(end & ~final_round & wrapped, state.round_num + 1, state.round_num)
        hit_max_rounds = end & ~final_round & wrapped & (round_next > max_rounds)

        next_seat = jnp.where(final_round, cand_final, cand_normal)
        game_done = end & (jnp.where(final_round, finished_final, hit_max_rounds))
        done = state.done | game_done
        safety = state.safety | (game_done & ~final_round)
        n_rounds = jnp.where(game_done, state.round_num, state.n_rounds)

        # ---- next turn init / intra-turn continue ---------------------------
        continue_turn = active & ~turn_end
        start_next = end & ~game_done
        n_turns = tuple(
            jnp.where(start_next & (next_seat == i), state.n_turns[i] + 1, state.n_turns[i])
            for i in range(k)
        )

        seat_out = jnp.where(start_next, next_seat, seat)
        dice_out = jnp.where(continue_turn, next_dice, 6)
        turn_score_out = jnp.where(continue_turn, turn_score_new, 0)
        rolls_out = jnp.where(continue_turn, rolls_this_turn, 0)
        round_out = round_next

        return GameState(
            scores=scores,
            has_scored=has_scored,
            n_turns=n_turns,
            n_farkles=n_farkles,
            n_rolls=n_rolls,
            highest_turn=highest_turn,
            smart_five_uses=smart_five_uses,
            n_smart_five_dice=n_smart_five_dice,
            smart_one_uses=smart_one_uses,
            n_smart_one_dice=n_smart_one_dice,
            n_hot_dice=n_hot_dice,
            turn_score=turn_score_out,
            dice_left=dice_out,
            seat=seat_out,
            round_num=round_out,
            rolls_this_turn=rolls_out,
            final_round=final_round,
            score_to_beat=beat,
            trigger_seat=trigger_seat,
            done=done,
            safety=safety,
            n_rounds=n_rounds,
            roll_limit_hits=roll_limit_hits,
            step=state.step + 1,
        )

    return step


# ── packed loop carry ────────────────────────────────────────────────────────
# Alternate carry layout (``play_games(packed=True)``): bounded
# control/counter fields share int32 words (≈ -30% carry bytes). Re-measured
# in round 5 ON THE PRODUCTION BLOCK-SCAN PROGRAM (the round-4 fori-only
# microbenchmark had suggested 1.44x the other way): 2-3% SLOWER than the
# flat carry at k=5/ns=128 (results/headline_ab_k5.json — the step is
# op-count bound at production batches and the pack/unpack ALU is pure
# overhead), so it is NOT the production default — kept tested as the
# starting point if a future backend shifts the balance. GameState stays
# the external interface; PackedState exists only between
# pack_state/unpack_state inside play_games.
#
# Bit layouts (int32):
#   ctrl:  dice_left 0-2 | seat 3-6 | rolls_this_turn 7-16 | round_num 17-25
#          | final_round 26 | done 27 | trigger_seat+1 28-31
#   tf[i]: n_turns 0-15 | n_farkles 16-31          (bounds <= max_rounds+2)
#   hs:    has_scored bitmask 0..K-1 | roll_limit_hits 16-25
#   param: (score_threshold+1) 0-15 | (dice_threshold+1) 16-19 | flags 20-27
#          (thresholds biased by +1 so the grid's `min - 1` sentinels, which
#          can be -1, stay in range; contract: -1 <= st <= 65534,
#          -1 <= dt <= 14 — enforced host-side in pack_strategy_params)
#
# Eligibility (else play_games falls back to the unpacked step): k <= 12
# (seat/trigger nibbles), max_rounds + 1 < 512, ROLL_LIMIT < 1024. Dropped
# fields are derivable: safety == done & ~final_round at completion and
# n_rounds == frozen round_num (both masked post-done), so unpack_state
# reconstructs them exactly.


class PackedState(NamedTuple):
    """Internal packed twin of GameState (per-seat tuples of (B,) int32)."""

    scores: tuple
    n_rolls: tuple
    highest_turn: tuple
    smart_five_uses: tuple
    n_smart_five_dice: tuple
    smart_one_uses: tuple
    n_smart_one_dice: tuple
    n_hot_dice: tuple
    tf: tuple  # n_turns | n_farkles << 16
    ctrl: jax.Array
    turn_score: jax.Array
    score_to_beat: jax.Array
    hs: jax.Array  # has_scored bits | roll_limit_hits << 16
    step: jax.Array


def packed_eligible(k: int, max_rounds: int) -> bool:
    return k <= 12 and (max_rounds + 2) < (1 << 9) and ROLL_LIMIT < (1 << 10)


def pack_params_word(st: jax.Array, dt: jax.Array, flags: jax.Array) -> jax.Array:
    """One int32 per seat: biased thresholds + flags (layout above)."""
    return (st + 1) | ((dt + 1) << 16) | (flags << 20)


def pack_state(s: GameState, k: int) -> PackedState:
    ctrl = (
        s.dice_left
        | (s.seat << 3)
        | (s.rolls_this_turn << 7)
        | (s.round_num << 17)
        | (s.final_round.astype(jnp.int32) << 26)
        | (s.done.astype(jnp.int32) << 27)
        | ((s.trigger_seat + 1) << 28)
    )
    hs_bits = jnp.zeros_like(s.turn_score)
    for i in range(k):
        hs_bits = hs_bits | (s.has_scored[i].astype(jnp.int32) << i)
    return PackedState(
        scores=s.scores,
        n_rolls=s.n_rolls,
        highest_turn=s.highest_turn,
        smart_five_uses=s.smart_five_uses,
        n_smart_five_dice=s.n_smart_five_dice,
        smart_one_uses=s.smart_one_uses,
        n_smart_one_dice=s.n_smart_one_dice,
        n_hot_dice=s.n_hot_dice,
        tf=tuple(s.n_turns[i] | (s.n_farkles[i] << 16) for i in range(k)),
        ctrl=ctrl,
        turn_score=s.turn_score,
        score_to_beat=s.score_to_beat,
        hs=hs_bits | (s.roll_limit_hits << 16),
        step=s.step,
    )


def unpack_state(p: PackedState, k: int) -> GameState:
    ctrl = p.ctrl
    done = ((ctrl >> 27) & 1) != 0
    final_round = ((ctrl >> 26) & 1) != 0
    round_num = (ctrl >> 17) & 511
    return GameState(
        scores=p.scores,
        has_scored=tuple(((p.hs >> i) & 1) != 0 for i in range(k)),
        n_turns=tuple(t & 0xFFFF for t in p.tf),
        n_farkles=tuple((t >> 16) & 0xFFFF for t in p.tf),
        n_rolls=p.n_rolls,
        highest_turn=p.highest_turn,
        smart_five_uses=p.smart_five_uses,
        n_smart_five_dice=p.n_smart_five_dice,
        smart_one_uses=p.smart_one_uses,
        n_smart_one_dice=p.n_smart_one_dice,
        n_hot_dice=p.n_hot_dice,
        turn_score=p.turn_score,
        dice_left=ctrl & 7,
        seat=(ctrl >> 3) & 15,
        round_num=round_num,
        rolls_this_turn=(ctrl >> 7) & 1023,
        final_round=final_round,
        score_to_beat=p.score_to_beat,
        trigger_seat=((ctrl >> 28) & 15) - 1,
        done=done,
        safety=done & ~final_round,
        n_rounds=jnp.where(done, round_num, 0),
        roll_limit_hits=(p.hs >> 16) & 1023,
        step=p.step,
    )


def make_game_step_packed(
    *,
    k: int,
    target_score: int = DEFAULT_TARGET_SCORE,
    max_rounds: int = DEFAULT_MAX_ROUNDS,
    dice_scheme: str = "1h",
    discard_impl: str = "prio",
):
    """Packed-carry twin of :func:`make_game_step` (same rule algebra)."""
    if not packed_eligible(k, max_rounds):
        raise ValueError(f"packed step ineligible for k={k}, max_rounds={max_rounds}")

    def step(
        s: PackedState,
        k0: jax.Array,  # (B,) uint32 game threefry key word 0
        k1: jax.Array,  # (B,) uint32 game threefry key word 1
        pp_t: tuple,  # K x (B,) int32 packed per-seat param words
    ) -> PackedState:
        ctrl = s.ctrl
        done_bit = (ctrl >> 27) & 1
        active = done_bit == 0
        seat = (ctrl >> 3) & 15
        dice_left = ctrl & 7
        round_num = (ctrl >> 17) & 511
        final_round = ((ctrl >> 26) & 1) != 0
        trigger_seat = ((ctrl >> 28) & 15) - 1
        seat_is = tuple(seat == i for i in range(k))

        def gather(tup):
            out = tup[0]
            for i in range(1, k):
                out = jnp.where(seat_is[i], tup[i], out)
            return out

        def bump(tup, inc, mask):
            return tuple(
                jnp.where(mask & seat_is[i], tup[i] + inc, tup[i])
                for i in range(k)
            )

        pw = gather(pp_t)
        st = (pw & 0xFFFF) - 1
        dt = ((pw >> 16) & 15) - 1
        flags = (pw >> 20) & 255

        # ---- roll (flat formulation; see make_game_step) -----------------
        roll_n = dice_left
        roll_index = gather(s.n_rolls)
        if dice_scheme == "1h":
            faces0 = roll_faces_1h(
                k0, k1, roll_index.astype(jnp.uint32), seat.astype(jnp.uint32)
            )
        else:
            words = roll_dice_words(
                k0, k1, roll_index.astype(jnp.uint32), seat.astype(jnp.uint32)
            )
            faces0 = [(w % jnp.uint32(6)).astype(jnp.int32) for w in words]
        faces = [
            jnp.where(roll_n > i, f + 1, 0) for i, f in enumerate(faces0)
        ]
        n_rolls = bump(s.n_rolls, 1, active)
        rolls_this_turn = ((ctrl >> 7) & 1023) + active.astype(jnp.int32)

        # faces here are pre-zeroed (0 = inactive) and 1-based: accumulate
        # into seven nibbles (inactive dice land in nibble 0) and shift the
        # inactive nibble out — no per-die mask needed
        acc = jnp.zeros_like(roll_n)
        for f in faces:
            acc = acc + (jnp.int32(1) << (f * 4))
        acc = acc >> 4
        raw_score, raw_used, sfives, sones = score_packed_flat(acc, roll_n)

        discards = (
            _smart_discards_flat_prio if discard_impl == "prio"
            else _smart_discards_flat
        )
        d5, d1 = discards(
            raw_score=raw_score, raw_used=raw_used, sfives=sfives, sones=sones,
            roll_n=roll_n, turn_score=s.turn_score,
            score_threshold=st, dice_threshold=dt, flags=flags,
        )
        final_score = raw_score - 50 * d5 - 100 * d1
        final_used = raw_used - d5 - d1
        reroll = roll_n - final_used

        bust = raw_score == 0
        tf = bump(s.tf, 1 << 16, active & bust)  # n_farkles in the high half
        smart_five_uses = bump(s.smart_five_uses, 1, active & (d5 > 0))
        n_smart_five_dice = bump(s.n_smart_five_dice, d5, active & (d5 > 0))
        smart_one_uses = bump(s.smart_one_uses, 1, active & (d1 > 0))
        n_smart_one_dice = bump(s.n_smart_one_dice, d1, active & (d1 > 0))

        hot = ~bust & (final_used == roll_n)
        next_dice = jnp.where(hot, 6, reroll)
        turn_score_new = jnp.where(bust, 0, s.turn_score + final_score)

        auto_hot = (flags & FLAG_AUTO_HOT_DICE) != 0
        auto_hot_continue = ~bust & hot & auto_hot
        n_hot_dice = bump(s.n_hot_dice, 1, active & auto_hot_continue)

        # ---- continue / bank decision ------------------------------------
        has_scored_seat = ((s.hs >> seat) & 1) != 0
        banked = gather(s.scores)
        running_total = banked + turn_score_new
        run_up = (flags & FLAG_RUN_UP_SCORE) != 0
        beat = s.score_to_beat
        keep = _thresholds_continue(turn_score_new, next_dice, st, dt, flags)
        keep |= ~has_scored_seat & (turn_score_new < 500)
        keep |= final_round & (running_total <= beat)
        keep &= ~(final_round & (running_total > beat) & ~run_up)
        keep |= auto_hot_continue

        hit_roll_limit = rolls_this_turn >= ROLL_LIMIT
        turn_end = bust | ~keep | hit_roll_limit
        rlh_inc = (active & hit_roll_limit & ~bust & keep).astype(jnp.int32)

        # ---- turn-end bookkeeping ----------------------------------------
        end = active & turn_end
        entered = ~has_scored_seat & (turn_score_new >= 500)
        has_scored_now = has_scored_seat | entered
        bank_amount = jnp.where(end & has_scored_now, turn_score_new, 0)
        bank_mask = end & has_scored_now
        scores = bump(s.scores, bank_amount, bank_mask)
        # has_scored bits OR in; roll_limit_hits is a counter in the high
        # half, so it accumulates by addition (no carry crosses bit 16)
        hs = (s.hs | (bank_mask.astype(jnp.int32) << seat)) + (rlh_inc << 16)
        new_banked = banked + bank_amount
        highest = jnp.maximum(
            gather(s.highest_turn),
            jnp.where(end & has_scored_now, turn_score_new, 0),
        )
        highest_turn = tuple(
            jnp.where(end & seat_is[i], highest, s.highest_turn[i])
            for i in range(k)
        )

        triggered = end & ~final_round & (new_banked >= target_score)
        final_round_out = final_round | triggered
        trigger_out = jnp.where(triggered, seat, trigger_seat)
        beat = jnp.where(triggered, new_banked, beat)
        final_bank = end & final_round & (seat != trigger_seat)
        beat = jnp.where(final_bank, jnp.maximum(beat, new_banked), beat)

        # ---- seat advance --------------------------------------------------
        base_final = jnp.where(triggered, 0, seat + 1)
        cand_final = base_final + (base_final == trigger_out).astype(jnp.int32)
        finished_final = cand_final >= k
        cand_normal = (seat + 1) % k
        wrapped = cand_normal == 0
        round_next = jnp.where(
            end & ~final_round_out & wrapped, round_num + 1, round_num
        )
        hit_max_rounds = end & ~final_round_out & wrapped & (round_next > max_rounds)

        next_seat = jnp.where(final_round_out, cand_final, cand_normal)
        game_done = end & (
            jnp.where(final_round_out, finished_final, hit_max_rounds)
        )
        done_out = done_bit | game_done.astype(jnp.int32)

        # ---- next turn init / intra-turn continue -------------------------
        continue_turn = active & ~turn_end
        start_next = end & ~game_done
        tf = tuple(
            jnp.where(start_next & (next_seat == i), tf[i] + 1, tf[i])
            for i in range(k)
        )

        seat_out = jnp.where(start_next, next_seat, seat)
        dice_out = jnp.where(continue_turn, next_dice, 6)
        turn_score_out = jnp.where(continue_turn, turn_score_new, 0)
        rolls_out = jnp.where(continue_turn, rolls_this_turn, 0)

        # at game_done the unpacked step records n_rounds = the PRE-increment
        # round (a safety game that wraps past max_rounds reports
        # max_rounds, not max_rounds + 1); freeze the stored round likewise
        round_store = jnp.where(game_done, round_num, round_next)
        ctrl_out = (
            dice_out
            | (seat_out << 3)
            | (rolls_out << 7)
            | (round_store << 17)
            | (final_round_out.astype(jnp.int32) << 26)
            | (done_out << 27)
            | ((trigger_out + 1) << 28)
        )

        return PackedState(
            scores=scores,
            n_rolls=n_rolls,
            highest_turn=highest_turn,
            smart_five_uses=smart_five_uses,
            n_smart_five_dice=n_smart_five_dice,
            smart_one_uses=smart_one_uses,
            n_smart_one_dice=n_smart_one_dice,
            n_hot_dice=n_hot_dice,
            tf=tf,
            ctrl=ctrl_out,
            turn_score=turn_score_out,
            score_to_beat=beat,
            hs=hs,
            step=s.step + 1,
        )

    return step


# compaction: below this batch size, straggler compaction isn't worth the
# gather/scatter; above it, once the active count drops under B/ratio the
# remaining games are gathered into a dense small batch
_COMPACT_MIN_BATCH = 4096
_COMPACT_RATIOS = (8, 64, 512)


def _gather_state(state: GameState, idx: jax.Array) -> GameState:
    return jax.tree.map(lambda leaf: leaf if leaf.ndim == 0 else leaf[idx], state)


def _scatter_state(full: GameState, compact: GameState, idx: jax.Array) -> GameState:
    def put(full_leaf, compact_leaf):
        if full_leaf.ndim == 0:
            return compact_leaf  # step counter: keep the latest
        return full_leaf.at[idx].set(compact_leaf)

    return jax.tree.map(put, full, compact)


def _partition_indices(done: jax.Array) -> jax.Array:
    """Deterministic stable partition permutation: unfinished lanes first.

    Cheaper than a full ``argsort`` (two cumsums + one scatter, all O(B)) and
    avoids the argsort path that triggered libtpu faults at irregular batch
    shapes (tests/FAILURE_NOTES.md).
    """
    b = done.shape[0]
    undone_i = (~done).astype(jnp.int32)
    done_i = done.astype(jnp.int32)
    n_undone = undone_i.sum()
    pos_undone = jnp.cumsum(undone_i) - 1
    pos_done = n_undone + jnp.cumsum(done_i) - 1
    target = jnp.where(done, pos_done, pos_undone)
    return (
        jnp.zeros((b,), jnp.int32)
        .at[target]
        .set(jnp.arange(b, dtype=jnp.int32))
    )


def _take_indices(done: jax.Array, cap: int, impl: str) -> jax.Array:
    """Indices of (at most ``cap``) unfinished lanes, padded arbitrarily.

    Padding slots may point at *any* lane — even an unfinished one already
    taken: a duplicated unfinished game plays identically in the compact
    batch (dice streams are pure functions of coordinates) and the
    scatter-back writes identical values, so results are unchanged by
    construction. That freedom admits implementations without the 1-D
    scatter of :func:`_partition_indices`, which XLA:TPU lowers to a device
    sort (measured tens of ms at B ~ 10^5 per compaction boundary).
    """
    if impl == "partition":
        return _partition_indices(done)[:cap]
    undone = ~done
    if impl == "nonzero":
        return jnp.nonzero(undone, size=cap, fill_value=0)[0].astype(jnp.int32)
    if impl == "searchsorted":
        cum = jnp.cumsum(undone.astype(jnp.int32))
        idx = jnp.searchsorted(
            cum, jnp.arange(1, cap + 1, dtype=jnp.int32), side="left"
        )
        return jnp.minimum(idx, done.shape[0] - 1).astype(jnp.int32)
    raise ValueError(f"unknown compact_take_impl {impl!r}")


def play_games(
    game_key_data: jax.Array,  # (B, 2) uint32
    score_thresholds: jax.Array,  # (B, K) int32
    dice_thresholds: jax.Array,  # (B, K) int32
    flags: jax.Array,  # (B, K) int32
    *,
    target_score: int = DEFAULT_TARGET_SCORE,
    max_rounds: int = DEFAULT_MAX_ROUNDS,
    compact: bool = True,
    pad_multiple: int | None = None,
    packed: bool = False,
    compact_ratios: tuple = _COMPACT_RATIOS,
    cond_check_every: int = _COND_CHECK_EVERY,
    compact_take_impl: str = "partition",
    dice_scheme: str = "1h",
    discard_impl: str = "prio",
    impl: str = "xla",
    pallas_tile_rows: int = 16,
) -> GameResult:
    """Play a full batch of K-seat games to completion. Jit-compatible.

    ``impl="pallas"`` routes to the gridded VMEM-resident mega-kernel
    (ops/pallas_kernel.play_games_pallas, bit-identical; measured faster
    from k >= 8 where the while-loop kernel's carry width dominates —
    results/impl_race.json); every compaction knob is then irrelevant
    (tile granularity replaces compaction).

    All arguments are data; B and K are static from the array shapes.

    Straggler compaction: game lengths are heavy-tailed (typical games need a
    few hundred roll-steps; rare near-safety-limit games need thousands), and
    the while_loop pays full-batch cost per iteration until the *last* game
    finishes. For large batches the loop therefore runs in phases: once the
    active count drops below B/8 (then B/64, B/512), the unfinished games
    are gathered into a dense small batch that continues alone, and their
    final state is scattered back. Results are bit-identical — games are
    independent and every dice stream is coordinate-addressed — only the
    wasted masked-lane work disappears.
    """
    batch, k = score_thresholds.shape
    if impl == "pallas":
        if dice_scheme != "1h" or discard_impl != "prio":
            raise ValueError(
                "pallas impl implements only the production dice_scheme='1h'"
                f" / discard_impl='prio' (got {dice_scheme!r}/{discard_impl!r})"
            )
        from farkle_ii_tpu.ops.pallas_kernel import play_games_pallas

        return play_games_pallas(
            game_key_data, score_thresholds, dice_thresholds, flags,
            target_score=target_score, max_rounds=max_rounds,
            tile_rows=pallas_tile_rows,
        )
    if impl != "xla":
        raise ValueError(f"unknown game-kernel impl {impl!r}")
    pad_multiple = _COMPACT_MIN_BATCH if pad_multiple is None else int(pad_multiple)
    use_packed = packed and packed_eligible(k, max_rounds)
    if use_packed:
        step = make_game_step_packed(
            k=k, target_score=target_score, max_rounds=max_rounds,
            dice_scheme=dice_scheme, discard_impl=discard_impl,
        )
    else:
        step = make_game_step(
            k=k, target_score=target_score, max_rounds=max_rounds,
            dice_scheme=dice_scheme, discard_impl=discard_impl,
        )
    # Absolute backstop: every turn ends within ROLL_LIMIT rolls and there are
    # at most (max_rounds * k + k) turns per game.
    max_steps = (max_rounds + 1) * k * (ROLL_LIMIT + 2)

    def split_ops(kd, st2, dt2, fl2):
        if use_packed:
            return (
                kd[:, 0],
                kd[:, 1],
                tuple(
                    pack_params_word(st2[:, i], dt2[:, i], fl2[:, i])
                    for i in range(k)
                ),
            )
        return (
            kd[:, 0],
            kd[:, 1],
            tuple(st2[:, i] for i in range(k)),
            tuple(dt2[:, i] for i in range(k)),
            tuple(fl2[:, i] for i in range(k)),
        )

    def make_init(b: int):
        s = init_state(b, k)
        return pack_state(s, k) if use_packed else s

    def done_of(s):
        return (((s.ctrl >> 27) & 1) != 0) if use_packed else s.done

    def mark_done_tail(s, lo: int):
        if use_packed:
            return s._replace(
                ctrl=s.ctrl.at[lo:].set(s.ctrl[lo:] | (1 << 27))
            )
        return s._replace(done=s.done.at[lo:].set(True))

    def run_phase(state, ops, active_floor):
        floor = max(active_floor or 0, 0)

        def cond(s):
            return ((~done_of(s)).sum() > floor) & (s.step < max_steps)

        def body(s):
            return jax.lax.fori_loop(
                0, cond_check_every, lambda i, s2: step(s2, *ops), s
            )

        return jax.lax.while_loop(cond, body, state)

    def to_result(state) -> GameResult:
        return finalize(unpack_state(state, k) if use_packed else state, k=k)

    if not compact or batch < pad_multiple:
        final = run_phase(
            make_init(batch),
            split_ops(game_key_data, score_thresholds, dice_thresholds, flags),
            None,
        )
        return to_result(final)

    # Pad the compacted path to a _COMPACT_MIN_BATCH multiple: irregular
    # batch sizes triggered hard TPU-runtime faults in the compaction
    # partition/gather sequence on some shapes (observed at B = 110,940);
    # padding games start done, never roll, and are sliced off before
    # finalize.
    padded = -(-batch // pad_multiple) * pad_multiple
    pad = padded - batch

    def pad_rows(arr):
        if pad == 0:
            return arr
        return jnp.pad(arr, [(0, pad)] + [(0, 0)] * (arr.ndim - 1))

    kd = pad_rows(game_key_data)
    st = pad_rows(score_thresholds)
    dt = pad_rows(dice_thresholds)
    fl = pad_rows(flags)
    state = make_init(padded)
    if pad:
        state = mark_done_tail(state, batch)

    chain: list[tuple[Any, jax.Array]] = []
    for ratio in compact_ratios:
        cap = padded // ratio
        state = run_phase(state, split_ops(kd, st, dt, fl), cap)
        # gather the (at most cap) unfinished games into a dense batch
        take = _take_indices(done_of(state), cap, compact_take_impl)
        chain.append((state, take))
        state = _gather_state(state, take)
        kd = kd[take]
        st = st[take]
        dt = dt[take]
        fl = fl[take]
    state = run_phase(state, split_ops(kd, st, dt, fl), None)
    # scatter the finished stragglers back up the chain
    for parent_state, take in reversed(chain):
        state = _scatter_state(parent_state, state, take)
    if pad:
        state = jax.tree.map(
            lambda leaf: leaf if leaf.ndim == 0 else leaf[:batch], state
        )
    return to_result(state)


def finalize(state: GameState, *, k: int) -> GameResult:
    """Rank seats and extract winner fields from a finished batch."""
    scores = jnp.stack(state.scores, axis=1)  # (B, K)
    seats = jnp.arange(k, dtype=jnp.int32)
    # rank 1 = highest score, ties broken by earlier seat (stable sort parity
    # with engine.py:477's `sorted(..., key=score, reverse=True)`).
    order_key = scores * jnp.int32(k) + (jnp.int32(k) - 1 - seats)[None, :]
    winner_seat_completed = jnp.argmax(order_key, axis=1).astype(jnp.int32)
    # rank[b, i] = 1 + number of seats strictly better in (score, -seat) order
    better = (scores[:, :, None] > scores[:, None, :]) | (
        (scores[:, :, None] == scores[:, None, :]) & (seats[None, :, None] < seats[None, None, :])
    )
    ranks = 1 + better.sum(axis=1, dtype=jnp.int32)  # (B, K) rank of each seat

    completed = ~state.safety
    winner_seat = jnp.where(completed, winner_seat_completed, -1)
    winning_score = jnp.where(
        completed,
        jnp.take_along_axis(scores, winner_seat_completed[:, None], axis=1)[:, 0],
        0,
    )
    if k > 1:
        sorted_scores = jnp.sort(scores, axis=1)
        second = sorted_scores[:, -2]
        # seat-order tie-break never affects the margin (scores only)
        margin = jnp.where(completed, winning_score - second, 0)
    else:
        margin = jnp.where(completed, winning_score, 0)

    def stk(tup):
        return jnp.stack(tup, axis=1)

    return GameResult(
        scores=scores,
        ranks=ranks,
        completed=completed,
        winner_seat=winner_seat,
        winning_score=winning_score,
        margin=margin,
        n_rounds=state.n_rounds,
        n_farkles=stk(state.n_farkles),
        n_rolls=stk(state.n_rolls),
        n_turns=stk(state.n_turns),
        highest_turn=stk(state.highest_turn),
        smart_five_uses=stk(state.smart_five_uses),
        n_smart_five_dice=stk(state.n_smart_five_dice),
        smart_one_uses=stk(state.smart_one_uses),
        n_smart_one_dice=stk(state.n_smart_one_dice),
        n_hot_dice=stk(state.n_hot_dice),
        roll_limit_hits=state.roll_limit_hits,
    )


def game_key_data_for_games(
    base_key: jax.Array, game_indices: jax.Array
) -> jax.Array:
    """Derive (B, 2) uint32 game-key data from a purpose base key.

    ``base_key`` must come from :func:`farkle_ii_tpu.ops.rng.purpose_base_key`
    (folded over scheme/purpose/root/k/shuffle/pair/order); this folds the
    trailing ``(game_index, seat_index=0, replicate=0)`` coordinates. The
    game key is the chain evaluated at seat 0; individual seats separate via
    the dice counter words (see ops/threefry.roll_dice_words), which removes
    the K-fold key-derivation cost that dominated step setup.
    """
    from farkle_ii_tpu.ops.rng import fold_trailing

    g = jnp.asarray(game_indices, dtype=jnp.uint32)
    keys = fold_trailing(base_key, game_index=g)
    return jax.random.key_data(keys)
