"""Pallas TPU mega-kernel: the game loop VMEM-resident, gridded in tiles.

PRODUCTION path for high player counts (round 5): with a 1-D grid of
``(tile_rows * 128)``-game VMEM tiles — each looped to completion while
pallas double-buffers the next tile's DMA — this kernel beats the
compacted XLA while-loop kernel from k >= 6 and by 1.5-1.8x at k >= 10
(``results/impl_race.json``; the round-2 "5x slower" verdict applied to
the gridless whole-batch variant, which both OOMed VMEM near B=32k and
ran every straggler at full batch width). The runner selects it per k
under ``tpu.game_impl = "auto"`` (simulation/runner.resolve_game_impl).
Wins come from what the while-loop kernel cannot avoid: the wide loop
carry (~80 arrays, growing with K) stays in VMEM across iterations with
zero per-iteration kernel-launch overhead, and a rare safety-limit game
only holds its own tile on the long tail — no compaction gathers, and no
compaction fault surface (the libtpu fault boundary that forces small
probed chunks at high k lives in the XLA compaction path).

Layout: all mutable state packs into one ``(S, R, 128)`` int32 array
(``B = R * 128`` games; slot ``S`` indexed statically), which satisfies the
(8, 128) int32 tile constraint. Seats are unrolled at trace time (K is
static), so there are no gathers — per-seat reads are K-way selects and
commits are K-way wheres. Dice come from the same Threefry-2x32 streams as
the XLA kernel (ops/threefry.py), so results are bit-identical; tests prove
it in interpret mode and on-device.

Rule semantics are the same single roll-step state machine as
ops/game_kernel.py — see its docstring for the contract and the deliberate
ROLL_LIMIT deviation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from farkle_ii_tpu.ops.game_kernel import (
    DEFAULT_MAX_ROUNDS,
    DEFAULT_TARGET_SCORE,
    FLAG_AUTO_HOT_DICE,
    FLAG_CONSIDER_DICE,
    FLAG_CONSIDER_SCORE,
    FLAG_FAVOR_SCORE,
    FLAG_REQUIRE_BOTH,
    FLAG_RUN_UP_SCORE,
    FLAG_SMART_FIVE,
    FLAG_SMART_ONE,
    ROLL_LIMIT,
    _PRIO_FD,
    _PRIO_FS,
    GameResult,
    GameState,
    finalize,
)
from farkle_ii_tpu.ops.scoring import score_packed_flat
from farkle_ii_tpu.ops.threefry import roll_faces_1h

LANES = 128

# per-game scalar slots
_GAME_SLOTS = (
    "turn_score", "dice_left", "seat", "round_num", "rolls_this_turn",
    "final_round", "score_to_beat", "trigger_seat", "done", "safety",
    "n_rounds", "roll_limit_hits",
)
# per-seat slots (repeated K times each)
_SEAT_SLOTS = (
    "scores", "has_scored", "n_turns", "n_farkles", "n_rolls", "highest_turn",
    "smart_five_uses", "n_smart_five_dice", "smart_one_uses",
    "n_smart_one_dice", "n_hot_dice",
)

def _slot_index(k: int) -> dict[str, int]:
    index: dict[str, int] = {}
    for i, name in enumerate(_GAME_SLOTS):
        index[name] = i
    base = len(_GAME_SLOTS)
    for j in range(k):
        for m, name in enumerate(_SEAT_SLOTS):
            index[f"{name}_{j}"] = base + j * len(_SEAT_SLOTS) + m
    return index


def n_slots(k: int) -> int:
    return len(_GAME_SLOTS) + k * len(_SEAT_SLOTS)


def _select_seat(values: list[jax.Array], seat: jax.Array) -> jax.Array:
    out = values[0]
    for j in range(1, len(values)):
        out = jnp.where(seat == j, values[j], out)
    return out


def _commit_seat(
    values: list[jax.Array], seat: jax.Array, mask: jax.Array, new: jax.Array
) -> list[jax.Array]:
    return [
        jnp.where((seat == j) & mask, new, values[j]) for j in range(len(values))
    ]


def _game_step_tiled(
    state: dict, consts: dict, *, k, target_score, max_rounds, debug_stage=None
):
    """One roll-step on (R, 128)-tiled arrays; same algebra as game_kernel.

    ``debug_stage`` (dev only): truncate the body after stage N, folding the
    values computed so far into a dummy update, to bisect backend-compiler
    rejections of the full kernel.
    """

    def _truncate(*values):
        out = dict(state)
        acc = state["turn_score"]
        for v in values:
            acc = acc + v.astype(jnp.int32)
        out["turn_score"] = acc
        out["done"] = jnp.where(acc >= -1, 1, state["done"])  # force all-done
        return out

    active = state["done"] == 0
    seat = state["seat"]

    def per_seat(name):
        return [state[f"{name}_{j}"] for j in range(k)]

    st = _select_seat(consts["st"], seat)
    dt = _select_seat(consts["dt"], seat)
    flags = _select_seat(consts["fl"], seat)

    # ---- roll ----------------------------------------------------------
    roll_n = state["dice_left"]
    nr = per_seat("n_rolls")
    roll_index = _select_seat(nr, seat).astype(jnp.uint32)
    key0 = consts["k0"]
    key1 = consts["k1"]
    dice = [f + 1 for f in roll_faces_1h(key0, key1, roll_index, seat.astype(jnp.uint32))]
    faces = [jnp.where(roll_n > lane, d, 0) for lane, d in enumerate(dice)]

    if debug_stage == 1:
        return _truncate(faces[0], faces[5])
    nr = _commit_seat(nr, seat, active, roll_index.astype(jnp.int32) + 1)
    rolls_this_turn = jnp.where(active, state["rolls_this_turn"] + 1, state["rolls_this_turn"])

    # ---- score (shared SWAR formulation, ops/scoring.py) ----------------
    # faces are pre-zeroed (0 = inactive) and 1-based: accumulate seven
    # nibbles, shift the inactive nibble out, score the packed word
    acc = jnp.zeros_like(roll_n)
    for f in faces:
        acc = acc + (jnp.int32(1) << (f * 4))
    acc = acc >> 4
    raw_score, raw_used, sfives, sones = score_packed_flat(acc, roll_n)

    if debug_stage == 2:
        return _truncate(raw_score, raw_used, sfives, sones)
    # ---- smart discards (9 unrolled candidates) ------------------------
    smart_five = (flags & FLAG_SMART_FIVE) != 0
    smart_one = (flags & FLAG_SMART_ONE) != 0
    favor_score = (flags & FLAG_FAVOR_SCORE) != 0
    consider_score = (flags & FLAG_CONSIDER_SCORE) != 0
    consider_dice = (flags & FLAG_CONSIDER_DICE) != 0
    require_both = (flags & FLAG_REQUIRE_BOTH) != 0
    enabled = smart_five & (raw_used != roll_n) & ((sfives > 0) | (sones > 0))
    max_d1 = jnp.where(smart_one, sones, 0)

    # candidate-loop-invariant margins (same algebra as the XLA kernel's
    # _smart_discards_flat_prio): threshold tests collapse to one compare
    # per candidate against a precomputed margin, with the consider_* gates
    # folded into -1 sentinels. Selection uses the static priority tables
    # (provably the same choice as the rank argmax; ranks are distinct).
    need_both = consider_score & consider_dice & require_both
    turn_pre = state["turn_score"]
    base_sa = turn_pre + raw_score
    base_dl = roll_n - raw_used
    cs_i = consider_score.astype(jnp.int32)
    cd_i = consider_dice.astype(jnp.int32)
    # int32 blend (i1-valued selects are rejected by this Mosaic backend)
    margin_s = cs_i * (base_sa - st) + (1 - cs_i) * -1
    margin_d = cd_i * (dt - base_dl) + (1 - cd_i) * -1

    best_prio = jnp.full_like(raw_score, -1)
    best_d5 = jnp.zeros_like(raw_score)
    best_d1 = jnp.zeros_like(raw_score)
    for d5c in range(3):
        for d1c in range(3):
            delta = 50 * d5c + 100 * d1c
            valid = (d5c <= sfives) & (d1c <= max_d1) & (raw_score > delta)
            hit_score = delta <= margin_s
            hit_dice = (d5c + d1c) <= margin_d
            bank = (need_both & hit_score & hit_dice) | (
                ~need_both & (hit_score | hit_dice)
            )
            valid &= ~bank
            prio = jnp.where(
                favor_score, _PRIO_FS[(d5c, d1c)], _PRIO_FD[(d5c, d1c)]
            )
            take = valid & (prio > best_prio)
            best_prio = jnp.where(take, prio, best_prio)
            best_d5 = jnp.where(take, d5c, best_d5)
            best_d1 = jnp.where(take, d1c, best_d1)
    take = enabled & (best_prio >= 0)
    d5 = jnp.where(take, best_d5, 0)
    d1 = jnp.where(take, best_d1, 0)

    if debug_stage == 3:
        return _truncate(d5, d1)
    final_score = raw_score - 50 * d5 - 100 * d1
    final_used = raw_used - d5 - d1
    reroll = roll_n - final_used

    bust = raw_score == 0
    nf = _commit_seat(
        per_seat("n_farkles"), seat, active & bust,
        _select_seat(per_seat("n_farkles"), seat) + 1,
    )
    s5u = _commit_seat(
        per_seat("smart_five_uses"), seat, active & (d5 > 0),
        _select_seat(per_seat("smart_five_uses"), seat) + 1,
    )
    s5d = _commit_seat(
        per_seat("n_smart_five_dice"), seat, active & (d5 > 0),
        _select_seat(per_seat("n_smart_five_dice"), seat) + d5,
    )
    s1u = _commit_seat(
        per_seat("smart_one_uses"), seat, active & (d1 > 0),
        _select_seat(per_seat("smart_one_uses"), seat) + 1,
    )
    s1d = _commit_seat(
        per_seat("n_smart_one_dice"), seat, active & (d1 > 0),
        _select_seat(per_seat("n_smart_one_dice"), seat) + d1,
    )

    hot = ~bust & (final_used == roll_n)
    next_dice = jnp.where(hot, 6, reroll)
    turn_score_new = jnp.where(bust, 0, turn_pre + final_score)
    auto_hot = (flags & FLAG_AUTO_HOT_DICE) != 0
    auto_hot_continue = hot & auto_hot
    hd = _commit_seat(
        per_seat("n_hot_dice"), seat, active & auto_hot_continue,
        _select_seat(per_seat("n_hot_dice"), seat) + 1,
    )

    # ---- continue / bank -------------------------------------------------
    hs = per_seat("has_scored")
    has_scored_seat = _select_seat(hs, seat) != 0
    banked = _select_seat(per_seat("scores"), seat)
    running_total = banked + turn_score_new
    run_up = (flags & FLAG_RUN_UP_SCORE) != 0
    beat = state["score_to_beat"]
    final_round = state["final_round"] != 0
    want_score = consider_score & (turn_score_new < st)
    want_dice = consider_dice & (next_dice > dt)
    both = consider_score & consider_dice
    either = want_score | want_dice
    both_unmet = want_score & want_dice
    keep = (both & require_both & either) | (both & ~require_both & both_unmet) | (
        ~both & either
    )
    keep |= ~has_scored_seat & (turn_score_new < 500)
    keep |= final_round & (running_total <= beat)
    keep &= ~(final_round & (running_total > beat) & ~run_up)
    keep |= auto_hot_continue

    if debug_stage == 4:
        return _truncate(keep.astype(jnp.int32), next_dice)
    hit_roll_limit = rolls_this_turn >= ROLL_LIMIT
    turn_end = bust | ~keep | hit_roll_limit
    roll_limit_hits = jnp.where(
        active & hit_roll_limit & ~bust & keep,
        state["roll_limit_hits"] + 1, state["roll_limit_hits"],
    )

    # ---- turn-end bookkeeping -------------------------------------------
    end = active & turn_end
    entered = ~has_scored_seat & (turn_score_new >= 500)
    has_scored_now = has_scored_seat | entered
    bank_amount = jnp.where(end & has_scored_now, turn_score_new, 0)
    scores = _commit_seat(per_seat("scores"), seat, end, banked + bank_amount)
    hs = _commit_seat(hs, seat, end & has_scored_now, jnp.ones_like(banked))
    new_banked = banked + bank_amount
    ht = per_seat("highest_turn")
    highest = jnp.maximum(
        _select_seat(ht, seat), jnp.where(end & has_scored_now, turn_score_new, 0)
    )
    ht = _commit_seat(ht, seat, end, highest)

    triggered = end & ~final_round & (new_banked >= target_score)
    final_round_new = final_round | triggered
    trigger_seat = jnp.where(triggered, seat, state["trigger_seat"])
    beat = jnp.where(triggered, new_banked, beat)
    final_bank = end & final_round & (seat != state["trigger_seat"])
    beat = jnp.where(final_bank, jnp.maximum(beat, new_banked), beat)

    base_final = jnp.where(triggered, 0, seat + 1)
    cand_final = base_final + (base_final == trigger_seat).astype(jnp.int32)
    finished_final = cand_final >= k
    cand_normal = jnp.where(seat + 1 >= k, 0, seat + 1)
    wrapped = cand_normal == 0
    round_next = jnp.where(
        end & ~final_round_new & wrapped, state["round_num"] + 1, state["round_num"]
    )
    hit_max_rounds = end & ~final_round_new & wrapped & (round_next > max_rounds)
    next_seat = jnp.where(final_round_new, cand_final, cand_normal)
    game_done = end & (
        (final_round_new & finished_final) | (~final_round_new & hit_max_rounds)
    )
    done = jnp.where(game_done, 1, state["done"])
    safety = jnp.where(game_done & ~final_round_new, 1, state["safety"])
    n_rounds = jnp.where(game_done, state["round_num"], state["n_rounds"])

    continue_turn = active & ~turn_end
    start_next = end & ~game_done
    nt = per_seat("n_turns")
    nt = _commit_seat(nt, next_seat, start_next, _select_seat(nt, next_seat) + 1)

    out = dict(state)
    out["seat"] = jnp.where(start_next, next_seat, seat)
    out["dice_left"] = jnp.where(continue_turn, next_dice, 6)
    out["turn_score"] = jnp.where(continue_turn, turn_score_new, 0)
    out["rolls_this_turn"] = jnp.where(continue_turn, rolls_this_turn, 0)
    out["round_num"] = round_next
    out["final_round"] = final_round_new.astype(jnp.int32)
    out["score_to_beat"] = beat
    out["trigger_seat"] = trigger_seat
    out["done"] = done
    out["safety"] = safety
    out["n_rounds"] = n_rounds
    out["roll_limit_hits"] = roll_limit_hits
    for j in range(k):
        out[f"scores_{j}"] = scores[j]
        out[f"has_scored_{j}"] = hs[j]
        out[f"n_turns_{j}"] = nt[j]
        out[f"n_farkles_{j}"] = nf[j]
        out[f"n_rolls_{j}"] = nr[j]
        out[f"highest_turn_{j}"] = ht[j]
        out[f"smart_five_uses_{j}"] = s5u[j]
        out[f"n_smart_five_dice_{j}"] = s5d[j]
        out[f"smart_one_uses_{j}"] = s1u[j]
        out[f"n_smart_one_dice_{j}"] = s1d[j]
        out[f"n_hot_dice_{j}"] = hd[j]
    return out


def make_advance_kernel(
    *, k: int, target_score: int, max_rounds: int, max_iters: int, interpret: bool = False,
    debug_stage=None, tile_rows: int | None = None,
):
    """Build the pallas advance: state (S,R,128) -> state after <=max_iters.

    ``tile_rows``: when set, the batch runs as a 1-D grid of
    ``(S, tile_rows, 128)`` VMEM blocks — each grid step loops *its own
    tile* to completion while pallas double-buffers the next tile's DMA.
    This removes the whole-batch VMEM cap (the gridless kernel OOMs near
    B=32k) and gives tile-granular straggler isolation: a rare
    safety-limit game only holds its ``tile_rows * 128``-lane tile on the
    long tail, not the entire batch (the XLA kernel needs three
    gather/scatter compaction phases for the same effect,
    game_kernel.play_games).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    slots = _slot_index(k)
    s_count = n_slots(k)

    def kernel(state_ref, params_ref, keys_ref, out_ref):
        state = {name: state_ref[i] for name, i in slots.items()}
        consts = {
            "st": [params_ref[j] for j in range(k)],
            "dt": [params_ref[k + j] for j in range(k)],
            "fl": [params_ref[2 * k + j] for j in range(k)],
            "k0": keys_ref[0],
            "k1": keys_ref[1],
        }
        names = sorted(state)

        def cond(carry):
            it, vals = carry
            state_c = dict(zip(names, vals))
            return (it < max_iters) & jnp.any(state_c["done"] == 0)

        def body(carry):
            it, vals = carry
            state_c = dict(zip(names, vals))
            new = _game_step_tiled(
                state_c, consts, k=k, target_score=target_score,
                max_rounds=max_rounds, debug_stage=debug_stage,
            )
            return it + 1, tuple(new[n] for n in names)

        init = (jnp.int32(0), tuple(state[n] for n in names))
        _, final_vals = jax.lax.while_loop(cond, body, init)
        final = dict(zip(names, final_vals))
        for name, i in slots.items():
            out_ref[i] = final[name]

    def advance(state, params, keys):
        r = state.shape[1]
        if tile_rows is None or r <= tile_rows:
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((s_count, r, LANES), jnp.int32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=interpret,
            )(state, params, keys)
        if r % tile_rows:
            raise ValueError(f"rows {r} not a multiple of tile_rows {tile_rows}")
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((s_count, r, LANES), jnp.int32),
            grid=(r // tile_rows,),
            in_specs=[
                pl.BlockSpec((s_count, tile_rows, LANES), lambda i: (0, i, 0)),
                pl.BlockSpec((3 * k, tile_rows, LANES), lambda i: (0, i, 0)),
                pl.BlockSpec((2, tile_rows, LANES), lambda i: (0, i, 0)),
            ],
            out_specs=pl.BlockSpec((s_count, tile_rows, LANES), lambda i: (0, i, 0)),
            interpret=interpret,
        )(state, params, keys)

    return advance


# ---------------------------------------------------------------------------
# host-side packing and the public entry point
# ---------------------------------------------------------------------------


def _pack_state(batch_padded: int, k: int) -> jax.Array:
    """Initial state in slot layout (fresh games, padding marked done)."""
    r = batch_padded // LANES
    slots = _slot_index(k)
    state = jnp.zeros((n_slots(k), r, LANES), dtype=jnp.int32)
    state = state.at[slots["dice_left"]].set(6)
    state = state.at[slots["round_num"]].set(1)
    state = state.at[slots["score_to_beat"]].set(DEFAULT_TARGET_SCORE)
    state = state.at[slots["trigger_seat"]].set(-1)
    state = state.at[slots["n_turns_0"]].set(1)
    return state


def _to_tiles(arr: jax.Array, batch_padded: int) -> jax.Array:
    """(B,) -> (R, 128) with zero padding."""
    pad = batch_padded - arr.shape[0]
    if pad:
        arr = jnp.concatenate([arr, jnp.zeros((pad,) + arr.shape[1:], arr.dtype)])
    return arr.reshape(batch_padded // LANES, LANES, *arr.shape[1:])


def play_games_pallas(
    game_key_data: jax.Array,  # (B, 2) uint32
    score_thresholds: jax.Array,  # (B, K) int32
    dice_thresholds: jax.Array,
    flags: jax.Array,
    *,
    target_score: int = DEFAULT_TARGET_SCORE,
    max_rounds: int = DEFAULT_MAX_ROUNDS,
    max_iters: int = 2_000_000,
    interpret: bool = False,
    tile_rows: int | None = None,
) -> GameResult:
    """Play a batch to completion inside the VMEM-resident pallas kernel.

    ``tile_rows``: grid the batch into ``(tile_rows * 128)``-game VMEM
    tiles, each looped to completion independently (see
    :func:`make_advance_kernel`). None keeps the single whole-batch block
    (VMEM-bounded near B=32k).
    """
    batch, k = score_thresholds.shape
    lane_quantum = LANES * (tile_rows or 1)
    batch_padded = -(-batch // lane_quantum) * lane_quantum
    r = batch_padded // LANES

    state = _pack_state(batch_padded, k)
    if batch_padded != batch:
        # mark padding lanes done so they never roll
        slots = _slot_index(k)
        done = state[slots["done"]].reshape(-1).at[batch:].set(1)
        state = state.at[slots["done"]].set(done.reshape(r, LANES))

    params = jnp.stack(
        [
            *[_to_tiles(score_thresholds[:, j], batch_padded) for j in range(k)],
            *[_to_tiles(dice_thresholds[:, j], batch_padded) for j in range(k)],
            *[_to_tiles(flags[:, j], batch_padded) for j in range(k)],
        ]
    )
    keys = jnp.stack(
        [
            _to_tiles(game_key_data[:, 0], batch_padded),
            _to_tiles(game_key_data[:, 1], batch_padded),
        ]
    )

    advance = make_advance_kernel(
        k=k, target_score=target_score, max_rounds=max_rounds,
        max_iters=max_iters, interpret=interpret, tile_rows=tile_rows,
    )
    final = advance(state, params, keys)

    # unpack back into a GameState for the shared finalize()
    slots = _slot_index(k)

    def game(name):
        return final[slots[name]].reshape(-1)[:batch]

    def seat(name):
        # GameState per-seat fields are K-tuples of flat (B,) arrays
        return tuple(final[slots[f"{name}_{j}"]].reshape(-1)[:batch] for j in range(k))

    state_out = GameState(
        scores=seat("scores"),
        has_scored=tuple(x.astype(bool) for x in seat("has_scored")),
        n_turns=seat("n_turns"),
        n_farkles=seat("n_farkles"),
        n_rolls=seat("n_rolls"),
        highest_turn=seat("highest_turn"),
        smart_five_uses=seat("smart_five_uses"),
        n_smart_five_dice=seat("n_smart_five_dice"),
        smart_one_uses=seat("smart_one_uses"),
        n_smart_one_dice=seat("n_smart_one_dice"),
        n_hot_dice=seat("n_hot_dice"),
        turn_score=game("turn_score"),
        dice_left=game("dice_left"),
        seat=game("seat"),
        round_num=game("round_num"),
        rolls_this_turn=game("rolls_this_turn"),
        final_round=game("final_round").astype(bool),
        score_to_beat=game("score_to_beat"),
        trigger_seat=game("trigger_seat"),
        done=game("done").astype(bool),
        safety=game("safety").astype(bool),
        n_rounds=game("n_rounds"),
        roll_limit_hits=game("roll_limit_hits"),
        step=jnp.zeros((), jnp.int32),
    )
    return finalize(state_out, k=k)
