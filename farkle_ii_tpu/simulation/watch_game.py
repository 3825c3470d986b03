"""``farkle-tpu watch``: replay one deterministic game roll by roll.

Reference parity: ``simulation/watch_game.py:157``. Uses the host oracle
engine with the same coordinate-addressed dice streams as the TPU kernel, so
what you watch is bit-for-bit what the device would play.
"""

from __future__ import annotations

import numpy as np

from farkle_ii_tpu.rules import oracle
from farkle_ii_tpu.rules.engine_host import HostGame
from farkle_ii_tpu.simulation.strategies import (
    parse_strategy_identifier,
    random_threshold_strategy,
)


def resolve_watch_strategies(
    strategy_specs: list[str] | None, *, seed: int, k: int
) -> list:
    """Explicit per-seat strategies (ids or canonical strings), else random.

    Reference parity: ``watch_game.py:157`` accepts explicit strategies; the
    random fallback draws from the namespace-11 STRATEGY stream.
    """
    if strategy_specs:
        parsed = [parse_strategy_identifier(spec) for spec in strategy_specs]
        # cycle if fewer specs than seats (one spec = self-play)
        return [parsed[i % len(parsed)] for i in range(k)]
    from farkle_ii_tpu.ops.rng import RandomPurpose, coordinate_numpy_rng

    nprng = coordinate_numpy_rng(RandomPurpose.STRATEGY, root_seed=seed, k=k)
    return [random_threshold_strategy(nprng) for _ in range(k)]


def watch_game(
    *, seed: int = 0, k: int = 2, strategy_specs: list[str] | None = None, out=print
) -> None:
    """Play one game with verbose per-roll commentary."""
    import jax
    import jax.numpy as jnp

    from farkle_ii_tpu.ops import game_kernel as gk, rng
    from farkle_ii_tpu.ops.threefry import roll_dice

    strategies = resolve_watch_strategies(strategy_specs, seed=seed, k=k)
    for i, s in enumerate(strategies):
        out(f"P{i + 1}: {s}")

    # threefry bits are backend-independent; replaying one game roll by roll
    # on a remote accelerator would cost a compile round-trip per roll, so
    # the watch path pins its tiny ops to the host CPU
    cpu = jax.devices("cpu")[0]

    with jax.default_device(cpu):
        base = rng.purpose_base_key(rng.RandomPurpose.PLAYER, root_seed=seed, k=k)
        key_data = np.asarray(gk.game_key_data_for_games(base, jnp.arange(1)))[0]

    def dice_source(seat: int, roll_index: int, n: int):
        with jax.default_device(cpu):
            d = np.asarray(
                roll_dice(
                    jnp.uint32(key_data[0]),
                    jnp.uint32(key_data[1]),
                    jnp.uint32(roll_index),
                    jnp.uint32(seat),
                )
            )[:n]
        faces = [int(x) for x in d]
        score, used, sf, so = oracle.score_faces(faces)
        out(f"  P{seat + 1} rolls {faces} -> score {score}, used {used}")
        return faces

    result = HostGame(strategies, dice_source).play()
    out("")
    if result.completed:
        out(
            f"Winner: P{result.winner_seat + 1} with "
            f"{result.winning_score} points (margin {result.margin}, "
            f"{result.n_rounds} rounds)"
        )
    else:
        out(f"Safety limit reached after {result.n_rounds} rounds; no winner.")
    for p in result.players:
        out(
            f"P{p.seat + 1}: score={p.score} turns={p.n_turns} rolls={p.n_rolls} "
            f"farkles={p.n_farkles} highest_turn={p.highest_turn}"
        )
