"""Unconditional per-(root, k, batch, strategy) sufficient statistics.

Schema and semantics parity with the reference
(``/root/reference/src/farkle/analysis/all_player_metrics.py:21-110``):
every *attempted* player-game exposure counts; a safety-limit game is a loss
for every seated strategy (``ATTEMPT_CONDITIONING``); winner-conditioned
fields are forbidden. The reference streams rows one Python dict at a time —
here the seat-level columns are melted to long form once and reduced with a
vectorized pandas groupby, which is algebraically identical and orders of
magnitude faster.
"""

from __future__ import annotations

import logging
from typing import Final

import numpy as np
import pandas as pd
import pyarrow as pa

from farkle_ii_tpu.config import AppConfig, compute_stage_config_sha
from farkle_ii_tpu.utils.artifacts import (
    iter_parquet_artifact_batches,
    write_parquet_artifact_atomic,
)
from farkle_ii_tpu.utils.schema_helpers import OUTCOME_SCHEMA_VERSION
from farkle_ii_tpu.utils.stage_completion import (
    StageState,
    resolve_stage_state,
    write_stage_done,
)

logger = logging.getLogger(__name__)

ATTEMPT_CONDITIONING: Final[str] = (
    "all_attempted_player_game_exposures_safety_limit_is_loss"
)

BEHAVIOR_SUFFIXES: Final[tuple[str, ...]] = (
    "rank",
    "loss_margin",
    "rolls",
    "farkles",
    "highest_turn",
    "hot_dice",
    "smart_five_uses",
    "n_smart_five_dice",
    "smart_one_uses",
    "n_smart_one_dice",
)

CORE_COUNT_FIELDS: Final[tuple[str, ...]] = (
    "raw_player_game_exposures",
    "raw_completed_player_game_exposures",
    "raw_safety_limit_player_game_exposures",
    "raw_wins",
    "raw_losses",
    "raw_turn_round_mismatch_count",
    "raw_max_round_abort_exposures",
)
CORE_SUM_FIELDS: Final[tuple[str, ...]] = (
    "raw_final_score_sum",
    "raw_final_score_square_sum",
    "raw_n_turns_sum",
    "raw_n_turns_square_sum",
    "raw_turn_return_game_weighted_exact_sum",
    "raw_turn_return_game_weighted_exact_square_sum",
    "raw_turn_return_round_proxy_sum",
    "raw_turn_return_round_proxy_square_sum",
    "raw_turn_minus_rounds_sum",
    "raw_turn_minus_rounds_square_sum",
)
DERIVED_FIELDS: Final[tuple[str, ...]] = (
    "turn_return_turn_weighted",
    "turn_return_game_weighted_exact",
    "turn_return_round_proxy",
    "round_proxy_gap",
    "round_proxy_relative_gap",
    "turn_round_mismatch_prevalence",
    "win_rate_per_attempt",
    "win_rate_given_completion",
    "safety_limit_exposure_rate",
)


def all_player_batch_schema() -> pa.Schema:
    """Stable unconditional batch-metric schema (reference ``:76``)."""
    behavior_fields: list[pa.Field] = []
    for suffix in BEHAVIOR_SUFFIXES:
        behavior_fields.extend(
            [
                pa.field(f"raw_{suffix}_observations", pa.int64(), nullable=False),
                pa.field(f"raw_{suffix}_sum", pa.float64(), nullable=False),
                pa.field(f"raw_{suffix}_square_sum", pa.float64(), nullable=False),
            ]
        )
    return pa.schema(
        [
            pa.field("root_seed", pa.int64(), nullable=False),
            pa.field("k", pa.int16(), nullable=False),
            pa.field("deterministic_batch_id", pa.int32(), nullable=False),
            pa.field("strategy", pa.int32(), nullable=False),
            *(pa.field(n, pa.int64(), nullable=False) for n in CORE_COUNT_FIELDS),
            *(pa.field(n, pa.float64(), nullable=False) for n in CORE_SUM_FIELDS),
            *behavior_fields,
            *(pa.field(n, pa.float64()) for n in DERIVED_FIELDS),
        ]
    )


def validate_unconditional_all_player_schema(schema: pa.Schema) -> None:
    """Reject winner-conditioned fields and incomplete schemas."""
    conditional = sorted(n for n in schema.names if n.startswith("win_conditioned_"))
    if conditional:
        raise ValueError(
            "unconditional all-player metrics cannot contain winner-conditioned "
            f"fields: {conditional}"
        )
    missing = sorted(set(all_player_batch_schema().names).difference(schema.names))
    if missing:
        raise ValueError(f"unconditional all-player metric schema is incomplete: {missing}")


def melt_rows_to_exposures(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """Explode per-game rows into one record per (game, seat) exposure."""
    if (df["outcome_schema_version"] != OUTCOME_SCHEMA_VERSION).any():
        raise ValueError(f"rows are not outcome-schema-v{OUTCOME_SCHEMA_VERSION}")
    completed = df["termination_status"] == "completed"
    if (~completed & df["winner_seat"].notna()).any():
        raise ValueError("safety-limit rows cannot name a winner")
    parts = []
    for seat in range(1, k + 1):
        p = f"P{seat}_"
        part = pd.DataFrame(
            {
                "root_seed": df["root_seed"].to_numpy(),
                "k": df["k"].to_numpy(),
                "deterministic_batch_id": df["deterministic_batch_id"].to_numpy(),
                "strategy": df[f"{p}strategy"].to_numpy(),
                "score": df[f"{p}score"].to_numpy(dtype=np.float64),
                "n_turns": df[f"{p}n_turns"].to_numpy(dtype=np.float64),
                "n_rounds": df["n_rounds"].to_numpy(dtype=np.float64),
                "completed": completed.to_numpy(),
                "hit_max_rounds": df[f"{p}hit_max_rounds"].to_numpy(dtype=bool),
                "won": (df["winner_seat"] == f"P{seat}").to_numpy(),
            }
        )
        for suffix in BEHAVIOR_SUFFIXES:
            # positional assignment: the source frame may carry a sliced
            # (non-Range) index and silent index alignment would NaN out
            # every unaligned row. float64 is mandatory: narrow integer row
            # columns (int32 highest_turn) made the groupby square sums
            # wrap negative past 2^31, and the published schema declares
            # float64 sums anyway
            part[suffix] = pd.to_numeric(
                df[f"{p}{suffix}"], errors="raise"
            ).to_numpy(dtype=np.float64)
        parts.append(part)
    long = pd.concat(parts, ignore_index=True)
    if (long["n_turns"] < 1).any() or (long["n_rounds"] < 1).any():
        raise ValueError("n_turns and n_rounds must be positive for every exposure")
    return long


def build_all_player_batch_metrics(rows: pa.Table, k: int) -> pa.Table:
    """Reduce a rows table into the per-batch sufficient-statistic frame."""
    return finalize_batch_metrics([partial_raw_sums(rows.to_pandas(), k)])


def _partial_raw_sums_fast(long: pd.DataFrame) -> pd.DataFrame:
    """Single-batch fast path: every aggregate is a bincount over strategy.

    A row shard covers one (root, k, deterministic_batch) cell, so the
    four-column group key degenerates to strategy alone and the dozen
    pandas groupbys (~0.73 s per 44k-game shard, the row-export writer's
    dominant cost) collapse into numpy bincounts (~30 ms). Column set,
    order, and dtypes match the groupby path exactly; the equality test
    pins it.
    """
    import numpy as np

    codes, uniques = pd.factorize(long["strategy"], sort=True)
    n = len(uniques)

    def bc(values=None) -> np.ndarray:
        if values is None:
            return np.bincount(codes, minlength=n)
        return np.bincount(codes, weights=values, minlength=n)

    score = long["score"].to_numpy(dtype=np.float64)
    n_turns = long["n_turns"].to_numpy(dtype=np.float64)
    n_rounds = long["n_rounds"].to_numpy(dtype=np.float64)
    exact = score / n_turns
    proxy = score / n_rounds
    tdiff = n_turns - n_rounds
    out = {
        "root_seed": np.repeat(long["root_seed"].iloc[0], n),
        "k": np.repeat(long["k"].iloc[0], n),
        "deterministic_batch_id": np.repeat(
            long["deterministic_batch_id"].iloc[0], n
        ),
        "strategy": uniques,
        "raw_player_game_exposures": bc(),
        "raw_completed_player_game_exposures": bc(
            long["completed"].to_numpy(dtype=np.float64)
        ).astype(np.int64),
        "raw_wins": bc(long["won"].to_numpy(dtype=np.float64)).astype(np.int64),
        "raw_max_round_abort_exposures": bc(
            long["hit_max_rounds"].to_numpy(dtype=np.float64)
        ).astype(np.int64),
        # score/turns melt to float64, so the groupby path sums as float —
        # keep identical dtypes
        "raw_final_score_sum": bc(score),
        "raw_final_score_square_sum": bc(score**2),
        "raw_n_turns_sum": bc(n_turns),
        "raw_n_turns_square_sum": bc(n_turns**2),
        "raw_turn_return_game_weighted_exact_sum": bc(exact),
        "raw_turn_return_game_weighted_exact_square_sum": bc(exact**2),
        "raw_turn_return_round_proxy_sum": bc(proxy),
        "raw_turn_return_round_proxy_square_sum": bc(proxy**2),
        "raw_turn_round_mismatch_count": bc(
            (tdiff != 0).astype(np.float64)
        ).astype(np.int64),
        "raw_turn_minus_rounds_sum": bc(tdiff),
        "raw_turn_minus_rounds_square_sum": bc(tdiff**2),
    }
    for suffix in BEHAVIOR_SUFFIXES:
        col = long[suffix].to_numpy(dtype=np.float64)
        obs = ~np.isnan(col)
        filled = np.where(obs, col, 0.0)
        out[f"raw_{suffix}_observations"] = bc(
            obs.astype(np.float64)
        ).astype(np.int64)
        out[f"raw_{suffix}_sum"] = bc(filled)
        out[f"raw_{suffix}_square_sum"] = bc(filled**2)
    return pd.DataFrame(out)


def partial_raw_sums(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """Additive raw sufficient sums for one chunk of rows.

    Every aggregate is a count or a sum, so partials from arbitrary chunk
    boundaries combine exactly by a second groupby-sum
    (:func:`finalize_batch_metrics`) — the streaming shape of the
    reference's per-batch accumulators.
    """
    long = melt_rows_to_exposures(df, k)
    keys3 = long[["root_seed", "k", "deterministic_batch_id"]]
    if len(long) and (keys3.nunique() == 1).all():
        return _partial_raw_sums_fast(long)

    long["exact_return"] = long["score"] / long["n_turns"]
    long["proxy_return"] = long["score"] / long["n_rounds"]
    long["turn_diff"] = long["n_turns"] - long["n_rounds"]

    keys = ["root_seed", "k", "deterministic_batch_id", "strategy"]
    g = long.groupby(keys, sort=True)

    agg = pd.DataFrame(
        {
            "raw_player_game_exposures": g.size(),
            "raw_completed_player_game_exposures": g["completed"].sum(),
            "raw_wins": g["won"].sum(),
            "raw_max_round_abort_exposures": g["hit_max_rounds"].sum(),
            "raw_final_score_sum": g["score"].sum(),
            "raw_final_score_square_sum": (
                long.assign(sq=long["score"] ** 2).groupby(keys)["sq"].sum()
            ),
            "raw_n_turns_sum": g["n_turns"].sum(),
            "raw_n_turns_square_sum": (
                long.assign(sq=long["n_turns"] ** 2).groupby(keys)["sq"].sum()
            ),
            "raw_turn_return_game_weighted_exact_sum": g["exact_return"].sum(),
            "raw_turn_return_game_weighted_exact_square_sum": (
                long.assign(sq=long["exact_return"] ** 2).groupby(keys)["sq"].sum()
            ),
            "raw_turn_return_round_proxy_sum": g["proxy_return"].sum(),
            "raw_turn_return_round_proxy_square_sum": (
                long.assign(sq=long["proxy_return"] ** 2).groupby(keys)["sq"].sum()
            ),
            "raw_turn_round_mismatch_count": (
                long.assign(m=(long["turn_diff"] != 0)).groupby(keys)["m"].sum()
            ),
            "raw_turn_minus_rounds_sum": g["turn_diff"].sum(),
            "raw_turn_minus_rounds_square_sum": (
                long.assign(sq=long["turn_diff"] ** 2).groupby(keys)["sq"].sum()
            ),
        }
    )
    for suffix in BEHAVIOR_SUFFIXES:
        col = long[suffix]
        obs = col.notna()
        agg[f"raw_{suffix}_observations"] = (
            long.assign(o=obs).groupby(keys)["o"].sum()
        )
        agg[f"raw_{suffix}_sum"] = (
            long.assign(v=col.fillna(0.0)).groupby(keys)["v"].sum()
        )
        agg[f"raw_{suffix}_square_sum"] = (
            long.assign(v=(col.fillna(0.0) ** 2)).groupby(keys)["v"].sum()
        )
    return agg.reset_index()


def finalize_batch_metrics(partials: list[pd.DataFrame]) -> pa.Table:
    """Combine additive partial sums, run conservation checks, derive rates."""
    keys = ["root_seed", "k", "deterministic_batch_id", "strategy"]
    agg = pd.concat(partials, ignore_index=True).groupby(keys, sort=True).sum()
    agg["raw_safety_limit_player_game_exposures"] = (
        agg["raw_player_game_exposures"] - agg["raw_completed_player_game_exposures"]
    )
    agg["raw_losses"] = agg["raw_player_game_exposures"] - agg["raw_wins"]

    # conservation checks (reference _finish_row:240-250)
    if (
        agg["raw_player_game_exposures"]
        != agg["raw_completed_player_game_exposures"]
        + agg["raw_safety_limit_player_game_exposures"]
    ).any():
        raise ValueError("attempted exposures must equal completed plus safety-limit")
    if (agg["raw_wins"] > agg["raw_completed_player_game_exposures"]).any():
        raise ValueError("win/loss exposure conservation failed")
    if (
        agg["raw_max_round_abort_exposures"]
        != agg["raw_safety_limit_player_game_exposures"]
    ).any():
        raise ValueError("maximum-round exposure count disagrees with termination status")

    # derived estimators
    exp = agg["raw_player_game_exposures"].astype(float)
    comp = agg["raw_completed_player_game_exposures"].astype(float)
    turns = agg["raw_n_turns_sum"]
    agg["turn_return_turn_weighted"] = agg["raw_final_score_sum"] / turns.where(turns > 0)
    agg["turn_return_game_weighted_exact"] = (
        agg["raw_turn_return_game_weighted_exact_sum"] / exp.where(exp > 0)
    )
    agg["turn_return_round_proxy"] = (
        agg["raw_turn_return_round_proxy_sum"] / exp.where(exp > 0)
    )
    agg["round_proxy_gap"] = (
        agg["turn_return_round_proxy"] - agg["turn_return_game_weighted_exact"]
    )
    agg["round_proxy_relative_gap"] = agg["round_proxy_gap"] / agg[
        "turn_return_game_weighted_exact"
    ].where(agg["turn_return_game_weighted_exact"] != 0)
    agg["turn_round_mismatch_prevalence"] = (
        agg["raw_turn_round_mismatch_count"] / exp.where(exp > 0)
    )
    agg["win_rate_per_attempt"] = agg["raw_wins"] / exp.where(exp > 0)
    agg["win_rate_given_completion"] = agg["raw_wins"] / comp.where(comp > 0)
    agg["safety_limit_exposure_rate"] = (
        agg["raw_safety_limit_player_game_exposures"] / exp.where(exp > 0)
    )

    agg = agg.reset_index()
    schema = all_player_batch_schema()
    table = pa.Table.from_pandas(agg, preserve_index=False).select(schema.names).cast(schema)
    validate_unconditional_all_player_schema(table.schema)
    return table


def publish_device_batch_metrics(
    cfg: AppConfig,
    k: int,
    partials: dict[int, pd.DataFrame],
    *,
    expected_games: int,
) -> None:
    """Publish the batch-metrics artifact straight from simulation.

    ``partials`` maps a shard's ``shuffle_lo`` to the partial raw sums
    computed from the in-memory device row buffer as it was exported —
    no second pass over the rows on disk. Shards not covered in memory
    (resumed blocks, peer hosts' blocks) are recovered from their published
    parquet; the finished artifact carries the metrics stage's own stamp, so
    ``run_for_k`` resolves COMPLETE_VALID and skips its streaming row scan
    entirely (SURVEY §7 step 8's device-sufficient-statistics design point;
    the reference always re-derives this frame from curated rows,
    ``all_player_metrics.py:76``).

    Exactness: the artifact's grouping key includes
    ``deterministic_batch_id`` and integer-valued sums are exact in f64, so
    the only path-dependence vs the streaming scan is float addition order
    inside the six per-exposure ratio sums (last-ulp effects; see
    ``test_device_batch_metrics_matches_row_scan``).
    """
    from farkle_ii_tpu.analysis.ingest import canonical_row_shards
    from farkle_ii_tpu.utils.artifacts import read_parquet_artifact

    covered = dict(partials)
    for shard in canonical_row_shards(cfg, k):
        shuffle_lo = int(shard.stem.rsplit("_", 1)[1])
        if shuffle_lo in covered:
            continue
        table = read_parquet_artifact(shard, expected_producer="simulation")
        covered[shuffle_lo] = partial_raw_sums(table.to_pandas(), k)
        logger.info(
            "device batch metrics k=%d: recovered shard %s from disk",
            k, shard.name,
        )
    table = finalize_batch_metrics([covered[key] for key in sorted(covered)])
    games = int(
        pa.compute.sum(table["raw_player_game_exposures"]).as_py() or 0
    ) // k
    if games != expected_games:
        raise ValueError(
            f"device batch metrics k={k}: {games} games covered != "
            f"{expected_games} planned"
        )
    stage_sha = compute_stage_config_sha(cfg, "metrics")
    out = cfg.batch_metrics_path(k)
    write_parquet_artifact_atomic(
        table, out, producer="metrics", scope="by_k",
        metadata={
            "k": k, "conditioning": ATTEMPT_CONDITIONING,
            "n_rows": table.num_rows, "produced_by": "simulation-device",
        },
    )
    write_stage_done(
        out.parent, f"batch_metrics_{k}p",
        inputs=[cfg.rows_dir(k) / "rows_manifest.v3.ndjson"], outputs=[out],
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
        extra={"produced_by": "simulation-device"},
    )
    logger.info(
        "device batch metrics k=%d: %d strategy-batch rows published from "
        "simulation", k, table.num_rows,
    )


def run_for_k(cfg: AppConfig, k: int, *, force: bool = False) -> None:
    stage_sha = compute_stage_config_sha(cfg, "metrics")
    out = cfg.batch_metrics_path(k)
    state = resolve_stage_state(
        out.parent, f"batch_metrics_{k}p", config_sha=stage_sha,
        freshness_key=cfg.freshness_key(),
    )
    if state == StageState.COMPLETE_VALID and not force:
        logger.info("batch metrics k=%d up to date", k)
        return
    src = cfg.curated_rows_path(k)
    # stream scanner batches into additive partial sums: the mega k=2 cell
    # (~11M rows x 40 columns) and its k-fold exposure melt must never
    # materialize at once
    partials = [
        partial_raw_sums(chunk, k)
        for chunk in iter_parquet_artifact_batches(src, expected_producer="curate")
    ]
    table = finalize_batch_metrics(partials)
    write_parquet_artifact_atomic(
        table, out, producer="metrics", scope="by_k",
        metadata={
            "k": k, "conditioning": ATTEMPT_CONDITIONING, "n_rows": table.num_rows,
        },
    )
    write_stage_done(
        out.parent, f"batch_metrics_{k}p", inputs=[src], outputs=[out],
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
    logger.info("batch metrics k=%d: %d strategy-batch rows", k, table.num_rows)
