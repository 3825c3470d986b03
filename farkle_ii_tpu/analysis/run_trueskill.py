"""Sequential TrueSkill ratings per (root, k) + screening contribution.

Reference parity (``/root/reference/src/farkle/analysis/run_trueskill.py``):

* curated rows are consumed in deterministic coordinate order
  ``(shuffle_index, game_index)``; safety-limit games are excluded from
  rating (they have no ranking);
* per-block checkpoints keyed by ``deterministic_batch_id`` make the
  inherently-serial pass resumable (``:420 _BlockCkpt`` analogue);
* outputs ``ratings_{k}_seed{root}.parquet`` with ``{strategy, mu, sigma}``
  (sigma is model state, not cross-k sampling uncertainty);
* cross-k candidate contribution = complete-support mean of normalized
  within-cell percentile ranks of mu (``trueskill_screening.py:301``);
* diagnostics: reversed-order rank correlation, tau-zero refit max-mu shift,
  held-out top-1 predictive accuracy (``:463-642`` analogues).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
from scipy.stats import spearmanr

from farkle_ii_tpu.analysis.trueskill_model import Rating, TrueSkillEnv
from farkle_ii_tpu.config import AppConfig, compute_stage_config_sha
from farkle_ii_tpu.analysis import trueskill_model as TM
from farkle_ii_tpu.utils.artifacts import (
    iter_parquet_artifact_batches,
    method_contract,
    write_parquet_artifact_atomic,
)
from farkle_ii_tpu.utils.stage_completion import (
    StageState,
    resolve_stage_state,
    write_stage_done,
)
from farkle_ii_tpu.utils.writer import write_json_atomic

logger = logging.getLogger(__name__)

TRUESKILL_METHOD_VERSION = 2
TRUESKILL_CONDITIONING = "completed_games_only_safety_limit_excluded"


def ratings_path(cfg: AppConfig, k: int) -> Path:
    return cfg.trueskill_dir() / f"ratings_{k}_seed{cfg.sim.seed}.parquet"


def contribution_path(cfg: AppConfig) -> Path:
    return cfg.scope_dir("across_k") / "trueskill" / "candidate_percentile_contribution.parquet"


def diagnostics_path(cfg: AppConfig, k: int) -> Path:
    return cfg.scope_dir("diagnostics") / f"trueskill_diagnostics_{k}p.json"


def _game_arrays(rows: pd.DataFrame, k: int):
    """Sorted (coordinate-ordered) completed games as numpy arrays."""
    rows = rows.sort_values(["shuffle_index", "game_index"], kind="mergesort")
    completed = rows["termination_status"] == "completed"
    rows = rows[completed]
    strategies = np.stack(
        [rows[f"P{s}_strategy"].to_numpy(dtype=np.int64) for s in range(1, k + 1)],
        axis=1,
    )
    ranks = np.stack(
        [rows[f"P{s}_rank"].to_numpy(dtype=np.int64) for s in range(1, k + 1)], axis=1
    )
    batches = rows["deterministic_batch_id"].to_numpy(dtype=np.int64)
    return strategies, ranks, batches


def _iter_game_chunks(
    src: Path, k: int, *, reverse: bool = False, batch_rows: int = 65536
):
    """Stream completed games from a curated rows artifact, bounded memory.

    Yields ``(strategies, ranks, batch_ids)`` arrays per scanner batch in
    coordinate order (or exact reverse order with ``reverse=True``). Curate
    publishes rows coordinate-ordered (ingest concatenates manifest-ordered
    shards); a violated order means a foreign or corrupted artifact and
    fails loudly rather than silently rating out of order.
    """
    sign = -1 if reverse else 1
    last: tuple[int, int] | None = None
    for df in iter_parquet_artifact_batches(
        src, expected_producer="curate", columns=_ts_columns(k),
        reverse=reverse, batch_rows=batch_rows,
    ):
        if not len(df):
            continue
        first_coord = (
            sign * int(df["shuffle_index"].iloc[0]),
            sign * int(df["game_index"].iloc[0]),
        )
        if last is not None and first_coord < last:
            raise ValueError(
                f"{src} is not coordinate-ordered by (shuffle_index, "
                "game_index); curated rows artifacts are published in "
                "coordinate order"
            )
        last = (
            sign * int(df["shuffle_index"].iloc[-1]),
            sign * int(df["game_index"].iloc[-1]),
        )
        strategies, ranks, batches = _game_arrays(df, k)
        if reverse:
            strategies, ranks, batches = (
                strategies[::-1], ranks[::-1], batches[::-1],
            )
        if len(batches):
            yield strategies, ranks, batches


def _iter_batch_groups(src: Path, k: int):
    """Group the completed-game stream by deterministic batch id.

    Yields ``(batch_id, strategies, ranks)`` with one entry per block, in
    coordinate order; a block's games may span scanner batches, so partial
    groups are buffered (one block is ~shuffles_per_batch x games_per_shuffle
    games — bounded).
    """
    cur: int | None = None
    strat_parts: list[np.ndarray] = []
    rank_parts: list[np.ndarray] = []
    for strategies, ranks, batches in _iter_game_chunks(src, k):
        boundaries = np.flatnonzero(np.diff(batches)) + 1
        for idx in np.split(np.arange(len(batches)), boundaries):
            b = int(batches[idx[0]])
            if cur is not None and b != cur:
                yield cur, np.concatenate(strat_parts), np.concatenate(rank_parts)
                strat_parts, rank_parts = [], []
            cur = b
            strat_parts.append(strategies[idx])
            rank_parts.append(ranks[idx])
    if cur is not None and strat_parts:
        yield cur, np.concatenate(strat_parts), np.concatenate(rank_parts)


def _rate_games_scalar(
    env: TrueSkillEnv,
    strategies: np.ndarray,
    ranks: np.ndarray,
    *,
    ratings: dict[int, Rating] | None = None,
) -> dict[int, Rating]:
    """Per-game sequential rating pass (reference semantics)."""
    ratings = dict(ratings or {})
    for g in range(strategies.shape[0]):
        sids = strategies[g]
        current = [ratings.get(int(s)) or env.create_rating() for s in sids]
        updated = env.rate(current, [int(r) for r in ranks[g]])
        for s, r in zip(sids, updated):
            ratings[int(s)] = r
    return ratings


def _wave_schedule_py(dense: np.ndarray, n_codes: int) -> np.ndarray:
    """Pure-Python twin of native ``wave_schedule`` (toolchain-less fallback)."""
    last = np.full(n_codes, -1, dtype=np.int32)
    out = np.zeros(dense.shape[0], dtype=np.int32)
    for g in range(dense.shape[0]):
        row = dense[g]
        w = int(last[row].max()) + 1
        out[g] = w
        last[row] = w
    return out


def rate_games(
    env: TrueSkillEnv,
    strategies: np.ndarray,
    ranks: np.ndarray,
    *,
    ratings: dict[int, Rating] | None = None,
) -> dict[int, Rating]:
    """Wave-batched rating pass, sequentially equivalent to per-game EP.

    The EP pass is order-sensitive only between games that share a strategy:
    disjoint games commute. Partitioning the stream into "waves" (each
    strategy at most once per wave, every game in the earliest wave after
    its conflicts — ``native/wave_schedule.cpp``) makes each wave a
    player-disjoint batch whose vectorized update
    (:func:`trueskill_model.rate_2p_vec` / :func:`rate_chain_vec`) equals
    the sequential result to libm ulps. The reference rates strictly
    per-game through the external package
    (``/root/reference/src/farkle/analysis/run_trueskill.py:700``); this is
    the same model with the inherent serial dependency made explicit.
    """
    ratings = dict(ratings or {})
    n_games, k = strategies.shape
    if n_games == 0:
        return ratings
    if n_games < 64 or k == 1:
        return _rate_games_scalar(env, strategies, ranks, ratings=ratings)
    codes, dense_flat = np.unique(strategies, return_inverse=True)
    dense = dense_flat.reshape(strategies.shape).astype(np.int32)
    if (np.sort(dense, axis=1)[:, 1:] == np.sort(dense, axis=1)[:, :-1]).any():
        # repeated strategy inside a game: gather/scatter aliasing — rare
        # (real shuffles never repeat); keep exact reference semantics.
        return _rate_games_scalar(env, strategies, ranks, ratings=ratings)
    if not (np.sort(ranks, axis=1) == np.arange(1, k + 1)).all():
        raise ValueError("ranks must be a strict permutation 1..k (no draws)")
    n_codes = int(len(codes))
    try:
        from farkle_ii_tpu import native as _native

        waves = _native.wave_schedule(dense, n_codes)
    except Exception:  # pragma: no cover - toolchain-less systems
        waves = _wave_schedule_py(dense, n_codes)

    n_waves_total = int(waves.max()) + 1
    if k >= 3 and n_games / n_waves_total < 16.0:
        # tiny waves (few distinct strategies): per-op numpy overhead loses
        # to the scalar path's per-game early convergence break.
        return _rate_games_scalar(env, strategies, ranks, ratings=ratings)

    mu = np.full(n_codes, env.mu, dtype=np.float64)
    sigma = np.full(n_codes, env.sigma, dtype=np.float64)
    for i, c in enumerate(codes):
        r = ratings.get(int(c))
        if r is not None:
            mu[i] = r.mu
            sigma[i] = r.sigma

    seat_order = np.argsort(ranks, axis=1, kind="stable")
    by_wave = np.argsort(waves, kind="stable")
    bounds = np.searchsorted(waves[by_wave], np.arange(n_waves_total + 1))
    for w in range(n_waves_total):
        idx = by_wave[bounds[w] : bounds[w + 1]]
        rc = np.take_along_axis(dense[idx], seat_order[idx], axis=1)
        if k == 2:
            new_mu, new_sigma = TM.rate_2p_vec(env, mu[rc], sigma[rc])
        else:
            new_mu, new_sigma = TM.rate_chain_vec(env, mu[rc], sigma[rc])
        mu[rc] = new_mu
        sigma[rc] = new_sigma

    for i, c in enumerate(codes):
        ratings[int(c)] = Rating(float(mu[i]), float(sigma[i]))
    return ratings


def _ratings_frame(ratings: dict[int, Rating], root_seed: int, k: int) -> pd.DataFrame:
    items = sorted(ratings.items())
    return pd.DataFrame(
        {
            "root_seed": root_seed,
            "k": k,
            "strategy": [s for s, _ in items],
            "mu": [r.mu for _, r in items],
            "sigma": [r.sigma for _, r in items],
        }
    )


def _block_ckpt_path(cfg: AppConfig, k: int, batch_id: int) -> Path:
    return cfg.trueskill_dir() / "blocks" / f"ts_{k}p_block_{batch_id:06d}.json"


def run_cell(cfg: AppConfig, k: int, *, force: bool = False) -> pd.DataFrame:
    """Rate one (root, k) cell with per-block resumable checkpoints.

    Curated rows stream in bounded-memory scanner batches (the reference
    rates in streamed blocks, ``run_trueskill.py:700``); a block whose
    checkpoint exists in the contiguous completed prefix is skipped by
    loading its cumulative ratings instead of re-rating.
    """
    env = TrueSkillEnv(
        beta=cfg.trueskill.beta,
        tau=cfg.trueskill.tau,
        draw_probability=cfg.trueskill.draw_probability,
    )
    ratings: dict[int, Rating] = {}
    contiguous = not force
    for b, strategies, ranks in _iter_batch_groups(cfg.curated_rows_path(k), k):
        path = _block_ckpt_path(cfg, k, b)
        if contiguous and path.exists():
            try:
                state = json.loads(path.read_text())
                ratings = {
                    int(s): Rating(v["mu"], v["sigma"])
                    for s, v in state["ratings"].items()
                }
                continue
            except (json.JSONDecodeError, KeyError):
                contiguous = False
        else:
            contiguous = False
        ratings = rate_games(env, strategies, ranks, ratings=ratings)
        write_json_atomic(
            path,
            {
                "k": k,
                "batch_id": b,
                "method_version": TRUESKILL_METHOD_VERSION,
                "ratings": {
                    str(s): {"mu": r.mu, "sigma": r.sigma} for s, r in ratings.items()
                },
            },
        )
    return _ratings_frame(ratings, cfg.sim.seed, k)


def build_diagnostics(cfg: AppConfig, k: int, forward: pd.DataFrame) -> dict:
    """Order-sensitivity + tau-zero + held-out calibration diagnostics.

    Each refit streams the curated rows artifact instead of materializing
    it; the reversed-order pass reads row groups last-to-first.
    """
    env = TrueSkillEnv(beta=cfg.trueskill.beta, tau=cfg.trueskill.tau)
    src = cfg.curated_rows_path(k)

    # reversed-order refit: rank correlation with the forward pass
    reversed_ratings: dict[int, Rating] = {}
    for strategies, ranks, _ in _iter_game_chunks(src, k, reverse=True):
        reversed_ratings = rate_games(
            env, strategies, ranks, ratings=reversed_ratings
        )
    rev = _ratings_frame(reversed_ratings, cfg.sim.seed, k).set_index("strategy")
    fwd = forward.set_index("strategy")
    common = fwd.index.intersection(rev.index)
    reversed_corr = (
        float(spearmanr(fwd.loc[common, "mu"], rev.loc[common, "mu"]).statistic)
        if len(common) >= 2
        else None
    )

    # tau-zero refit: max |mu shift|
    env0 = TrueSkillEnv(beta=cfg.trueskill.beta, tau=0.0)
    zero_ratings: dict[int, Rating] = {}
    games_rated = 0
    for strategies, ranks, _ in _iter_game_chunks(src, k):
        zero_ratings = rate_games(env0, strategies, ranks, ratings=zero_ratings)
        games_rated += strategies.shape[0]
    zero = _ratings_frame(zero_ratings, cfg.sim.seed, k).set_index("strategy")
    max_shift = (
        float((fwd.loc[common, "mu"] - zero.loc[common, "mu"]).abs().max())
        if len(common)
        else None
    )

    # held-out predictive calibration: train on all but the last batch,
    # predict winners of the last batch by max mu (ties -> no credit). The
    # stream keeps one block buffered; when it ends, the buffer is the
    # held-out block.
    heldout_accuracy = None
    train_ratings: dict[int, Rating] = {}
    held: tuple[np.ndarray, np.ndarray] | None = None
    n_groups = 0
    for _, strategies, ranks in _iter_batch_groups(src, k):
        n_groups += 1
        if held is not None:
            train_ratings = rate_games(
                env, held[0], held[1], ratings=train_ratings
            )
        held = (strategies, ranks)
    if n_groups >= 2 and held is not None:
        strategies, ranks = held
        hits = 0
        total = 0
        for g in range(strategies.shape[0]):
            mus = np.array(
                [
                    (train_ratings.get(int(s)) or env.create_rating()).mu
                    for s in strategies[g]
                ]
            )
            predicted = int(np.argmax(mus))
            actual = int(np.argmin(ranks[g]))
            hits += int(predicted == actual)
            total += 1
        heldout_accuracy = hits / total if total else None

    return {
        "k": k,
        "method_version": TRUESKILL_METHOD_VERSION,
        "conditioning": TRUESKILL_CONDITIONING,
        "games_rated": int(games_rated),
        "reversed_order_spearman": reversed_corr,
        "tau_zero_max_mu_shift": max_shift,
        "heldout_top1_accuracy": heldout_accuracy,
        "heldout_chance_accuracy": 1.0 / k,
    }


def build_percentile_contribution(
    cfg: AppConfig, frames: dict[int, pd.DataFrame]
) -> pd.DataFrame:
    """Complete-support mean of normalized within-cell percentile ranks."""
    percentiles = {}
    for k, frame in frames.items():
        n = len(frame)
        if n == 0:
            continue
        order = frame.sort_values(["mu", "strategy"], ascending=[False, True])
        pct = pd.Series(
            1.0 - (np.arange(n)) / max(n - 1, 1), index=order["strategy"].to_numpy()
        )
        percentiles[k] = pct
    if not percentiles:
        return pd.DataFrame(
            columns=["root_seed", "strategy", "k_support", "percentile_contribution"]
        )
    common = sorted(set.intersection(*(set(p.index) for p in percentiles.values())))
    ks = sorted(percentiles)
    rows = [
        {
            "root_seed": cfg.sim.seed,
            "strategy": int(s),
            "k_support": ks,
            "percentile_contribution": float(
                np.mean([percentiles[k][s] for k in ks])
            ),
        }
        for s in common
    ]
    return pd.DataFrame(rows)


def run(cfg: AppConfig, *, force: bool = False) -> None:
    """Full TrueSkill stage: per-k ratings, diagnostics, contribution."""
    stage_sha = compute_stage_config_sha(cfg, "trueskill")
    ks = sorted(int(k) for k in cfg.sim.n_players_list)
    stage_dir = cfg.trueskill_dir()
    state = resolve_stage_state(
        stage_dir, "trueskill", config_sha=stage_sha, freshness_key=cfg.freshness_key()
    )
    if state == StageState.COMPLETE_VALID and not force:
        logger.info("trueskill up to date")
        return
    frames: dict[int, pd.DataFrame] = {}
    outputs = []
    for k in ks:
        frame = run_cell(cfg, k, force=force)
        frames[k] = frame
        path = ratings_path(cfg, k)
        write_parquet_artifact_atomic(
            pa.Table.from_pandas(frame, preserve_index=False), path,
            producer="trueskill", scope="by_k",
            k_support=[k], seed_scope="single_seed",
            method=method_contract(
                "trueskill_ep",
                mu0=TM.DEFAULT_MU, sigma0=TM.DEFAULT_SIGMA,
                beta=cfg.trueskill.beta, tau=cfg.trueskill.tau,
            ),
            metadata={
                "k": k, "method_version": TRUESKILL_METHOD_VERSION,
                "conditioning": TRUESKILL_CONDITIONING,
            },
        )
        outputs.append(path)
        diag = build_diagnostics(cfg, k, frame)
        write_json_atomic(diagnostics_path(cfg, k), diag)
        outputs.append(diagnostics_path(cfg, k))
        logger.info(
            "trueskill k=%d: %d strategies rated; reversed-order rho=%s",
            k, len(frame), diag["reversed_order_spearman"],
        )
    contribution = build_percentile_contribution(cfg, frames)
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(contribution, preserve_index=False),
        contribution_path(cfg),
        producer="trueskill", scope="across_k",
        metadata={"operation": "mean_percentile_rank", "k_support": ks},
    )
    outputs.append(contribution_path(cfg))
    write_stage_done(
        stage_dir, "trueskill",
        inputs=[cfg.curated_rows_path(k) for k in ks],
        outputs=outputs,
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )


# ── pair-scope refit ─────────────────────────────────────────────────────────


def _ts_columns(k: int) -> list[str]:
    cols = ["shuffle_index", "game_index", "termination_status",
            "deterministic_batch_id"]
    for s in range(1, k + 1):
        cols += [f"P{s}_strategy", f"P{s}_rank"]
    return cols


def derive_pair_root_cfgs(cfg: AppConfig) -> tuple[AppConfig, AppConfig]:
    """Reconstruct the two per-root configs from a pair-scope config."""
    from farkle_ii_tpu.orchestration import seed_utils

    seeds = [int(s) for s in cfg.sim.seed_list]
    if len(seeds) != 2:
        raise ValueError("pair-scope stages need sim.seed_list with two seeds")
    a, b = seeds
    return (
        seed_utils.prepare_seed_config(cfg, a, b, a),
        seed_utils.prepare_seed_config(cfg, a, b, b),
    )


def run_root_pair(cfg: AppConfig, *, force: bool = False) -> None:
    """Pair-scope TrueSkill **refit** over pair-combined curated rows.

    Unlike a mean of per-root percentile contributions, the rating pass runs
    over both roots' completed games in one sequential EP sweep (root A's
    coordinate-ordered games, then root B's — deterministic pair order), so
    the pair candidate freeze consumes ratings fitted on the union evidence
    (reference pair plan: analysis/__init__.py:262-329 runs a pair trueskill
    stage over pair-combined rows).
    """
    stage_sha = compute_stage_config_sha(cfg, "pair_trueskill")
    ks = sorted(int(k) for k in cfg.sim.n_players_list)
    stage_dir = cfg.trueskill_dir()
    state = resolve_stage_state(
        stage_dir, "pair_trueskill", config_sha=stage_sha,
        freshness_key=cfg.freshness_key(),
    )
    if state == StageState.COMPLETE_VALID and not force:
        logger.info("pair trueskill up to date")
        return
    cfg_a, cfg_b = derive_pair_root_cfgs(cfg)

    frames: dict[int, pd.DataFrame] = {}
    outputs = []
    inputs = []
    for k in ks:
        env = TrueSkillEnv(
            beta=cfg.trueskill.beta,
            tau=cfg.trueskill.tau,
            draw_probability=cfg.trueskill.draw_probability,
        )
        ratings: dict[int, Rating] = {}
        for root_cfg in (cfg_a, cfg_b):
            src = root_cfg.curated_rows_path(k)
            inputs.append(src)
            for strategies, ranks, _ in _iter_game_chunks(src, k):
                ratings = rate_games(env, strategies, ranks, ratings=ratings)
        frame = _ratings_frame(ratings, cfg.sim.seed, k)
        frames[k] = frame
        path = ratings_path(cfg, k)
        write_parquet_artifact_atomic(
            pa.Table.from_pandas(frame, preserve_index=False), path,
            producer="trueskill", scope="cross_seed",
            k_support=[k], seed_scope="seed_pair",
            method=method_contract(
                "trueskill_ep",
                mu0=TM.DEFAULT_MU, sigma0=TM.DEFAULT_SIGMA,
                beta=cfg.trueskill.beta, tau=cfg.trueskill.tau,
            ),
            metadata={
                "k": k, "method_version": TRUESKILL_METHOD_VERSION,
                "conditioning": TRUESKILL_CONDITIONING,
                "operation": "pair_refit",
                "roots": [cfg_a.sim.seed, cfg_b.sim.seed],
            },
        )
        outputs.append(path)
        logger.info("pair trueskill k=%d: %d strategies refit", k, len(frame))

    contribution = build_percentile_contribution(cfg, frames)
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(contribution, preserve_index=False),
        contribution_path(cfg),
        producer="trueskill", scope="cross_seed",
        metadata={
            "operation": "pair_refit_percentile_rank", "k_support": ks,
            "roots": [cfg_a.sim.seed, cfg_b.sim.seed],
        },
    )
    outputs.append(contribution_path(cfg))
    write_stage_done(
        stage_dir, "pair_trueskill",
        inputs=sorted(set(inputs)),
        outputs=outputs,
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
