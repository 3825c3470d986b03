"""``farkle-tpu time``: throughput benchmark (reference time_farkle.py:49)."""

from __future__ import annotations

import logging
import time

import numpy as np

logger = logging.getLogger(__name__)


def measure_sim_times(cfg, *, n_games: int = 8192, k: int = 5) -> dict[str, float]:
    """Play batches of games and log single-game latency + batch throughput."""
    import jax
    import jax.numpy as jnp

    from farkle_ii_tpu.ops import game_kernel as gk, rng
    from farkle_ii_tpu.simulation import strategies as S

    grid = S.build_strategy_grid(
        score_thresholds=cfg.sim.score_thresholds,
        dice_thresholds=cfg.sim.dice_thresholds,
        smart_five_opts=cfg.sim.smart_five_opts,
        smart_one_opts=cfg.sim.smart_one_opts,
        consider_score_opts=cfg.sim.consider_score_opts,
        consider_dice_opts=cfg.sim.consider_dice_opts,
        auto_hot_dice_opts=cfg.sim.auto_hot_dice_opts,
        run_up_score_opts=cfg.sim.run_up_score_opts,
    )
    sample_rng = rng.coordinate_numpy_rng(rng.RandomPurpose.STRATEGY, root_seed=cfg.sim.seed, k=k)
    ids = sample_rng.integers(0, len(grid), size=(n_games, k))
    p = S.pack_strategy_params([grid[int(i)] for i in ids.reshape(-1)])
    st = jnp.asarray(p.score_threshold.reshape(n_games, k))
    dt = jnp.asarray(p.dice_threshold.reshape(n_games, k))
    fl = jnp.asarray(p.flags.reshape(n_games, k))
    base = rng.purpose_base_key(
        rng.RandomPurpose.PLAYER, root_seed=cfg.sim.seed, k=k
    )
    kd = gk.game_key_data_for_games(base, jnp.arange(n_games))

    run = jax.jit(gk.play_games)

    def fetch(r):
        # block_until_ready is a no-op on the axon remote backend
        # (tests/FAILURE_NOTES.md): only a device_get provably completes
        return int(np.asarray(r.completed).sum())

    # single game latency (batch of 1)
    t0 = time.perf_counter()
    fetch(run(kd[:1], st[:1], dt[:1], fl[:1]))
    single_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    fetch(run(kd[:1], st[:1], dt[:1], fl[:1]))
    single_warm = time.perf_counter() - t0

    # batch throughput (three warm-ups: the first-timed executable in a
    # fresh process runs 2-4x slower than steady state)
    for _ in range(3):
        fetch(run(kd, st, dt, fl))
    t0 = time.perf_counter()
    fetch(run(kd, st, dt, fl))
    batch_s = time.perf_counter() - t0
    gps = n_games / batch_s

    logger.info("single game: cold %.2fs (compile), warm %.4fs", single_cold, single_warm)
    logger.info("batch of %d games: %.3fs -> %.0f games/sec", n_games, batch_s, gps)
    return {
        "single_game_cold_s": single_cold,
        "single_game_warm_s": single_warm,
        "batch_games_per_sec": gps,
    }
