"""Exact enumeration of all ordered roll outcomes through the scorer.

Reference parity (``/root/reference/src/farkle/analysis/roll_enumeration.py``):
enumerates every one of the ``6**d`` ordered outcomes for d = 1..6 dice
through the production scoring path and writes distribution + summary
diagnostics. This is the oracle any reimplemented scorer must reproduce —
here it exercises the *vectorized device scorer* (ops/scoring.py), which the
tests also pin against the host oracle.
"""

from __future__ import annotations

import itertools
import logging
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

from farkle_ii_tpu.config import AppConfig, compute_stage_config_sha
from farkle_ii_tpu.utils.artifacts import write_parquet_artifact_atomic
from farkle_ii_tpu.utils.stage_completion import (
    StageState,
    resolve_stage_state,
    write_stage_done,
)

logger = logging.getLogger(__name__)


def enumeration_path(cfg: AppConfig) -> Path:
    return cfg.scope_dir("diagnostics") / "roll_enumeration.parquet"


def summary_path(cfg: AppConfig) -> Path:
    return cfg.scope_dir("diagnostics") / "roll_enumeration_summary.parquet"


def enumerate_ordered_roll_outcomes(max_dice: int = 6) -> pd.DataFrame:
    """Score every ordered roll of 1..max_dice dice with the device scorer."""
    import jax.numpy as jnp

    from farkle_ii_tpu.ops.scoring import faces_to_counts_vec, score_counts_vec

    frames = []
    for d in range(1, max_dice + 1):
        rolls = np.array(list(itertools.product(range(1, 7), repeat=d)), dtype=np.int32)
        padded = np.zeros((len(rolls), 6), dtype=np.int32)
        padded[:, :d] = rolls
        counts = faces_to_counts_vec(jnp.asarray(padded))
        score, used, sf, so = (np.asarray(x) for x in score_counts_vec(counts))
        frames.append(
            pd.DataFrame(
                {
                    "n_dice": d,
                    "roll": ["".join(map(str, r)) for r in rolls],
                    "score": score,
                    "used": used,
                    "single_fives": sf,
                    "single_ones": so,
                    "is_farkle": score == 0,
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def summarize(outcomes: pd.DataFrame) -> pd.DataFrame:
    g = outcomes.groupby("n_dice", sort=True)
    out = g.agg(
        outcomes=("score", "size"),
        farkle_outcomes=("is_farkle", "sum"),
        mean_score=("score", "mean"),
        max_score=("score", "max"),
        mean_used=("used", "mean"),
    ).reset_index()
    out["farkle_probability"] = out["farkle_outcomes"] / out["outcomes"]
    return out


def run(cfg: AppConfig, *, force: bool = False) -> None:
    stage_sha = compute_stage_config_sha(cfg, "rng_diagnostics")
    out_dir = cfg.scope_dir("diagnostics")
    state = resolve_stage_state(
        out_dir, "roll_enumeration", config_sha=stage_sha,
        freshness_key=cfg.freshness_key(),
    )
    if state == StageState.COMPLETE_VALID and not force:
        return
    outcomes = enumerate_ordered_roll_outcomes()
    summary = summarize(outcomes)
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(outcomes, preserve_index=False), enumeration_path(cfg),
        producer="roll_enumeration", scope="diagnostics",
        metadata={"operation": "exact_ordered_roll_enumeration"},
    )
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(summary, preserve_index=False), summary_path(cfg),
        producer="roll_enumeration", scope="diagnostics",
        metadata={"operation": "roll_enumeration_summary"},
    )
    write_stage_done(
        out_dir, "roll_enumeration",
        outputs=[enumeration_path(cfg), summary_path(cfg)],
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
