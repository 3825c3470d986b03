"""Method agreement conditioned on the frozen candidate family.

Reference parity (``/root/reference/src/farkle/analysis/structure_agreement.py``):
overlap statistics between the screening and TrueSkill contributions, rank
correlations over the common family population, per-pair agreement between
the screening equal-k ordering and resolved H2H directions, and a summary.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import pandas as pd
import pyarrow as pa
from scipy.stats import kendalltau, spearmanr

from farkle_ii_tpu.config import AppConfig, compute_stage_config_sha
from farkle_ii_tpu.utils.artifacts import (
    read_parquet_artifact,
    write_parquet_artifact_atomic,
)
from farkle_ii_tpu.utils.stage_completion import (
    StageState,
    resolve_stage_state,
    write_stage_done,
)
from farkle_ii_tpu.utils.writer import write_json_atomic

logger = logging.getLogger(__name__)


def pair_agreement_path(cfg: AppConfig) -> Path:
    return cfg.h2h_dir() / "agreement_pairs.parquet"


def summary_path(cfg: AppConfig) -> Path:
    return cfg.h2h_dir() / "agreement_summary.json"


def run(cfg: AppConfig, *, force: bool = False) -> None:
    from farkle_ii_tpu.analysis.candidate_family import (
        family_manifest_path,
        family_membership_path,
    )
    from farkle_ii_tpu.analysis.h2h_inference import inference_path

    stage_sha = compute_stage_config_sha(cfg, "agreement")
    out_dir = cfg.h2h_dir()
    state = resolve_stage_state(
        out_dir, "agreement", config_sha=stage_sha, freshness_key=cfg.freshness_key()
    )
    if state == StageState.COMPLETE_VALID and not force:
        logger.info("agreement up to date")
        return

    manifest = json.loads(family_manifest_path(cfg).read_text())
    membership = read_parquet_artifact(
        family_membership_path(cfg), expected_producer="candidate_family"
    ).to_pandas()
    family = membership[membership["final_family"]].copy()

    # rank correlations over the family between the two admission methods
    both = family.dropna(subset=["win_rate_rank", "trueskill_rank"])
    rank_corr = {
        "common_count": int(len(both)),
        "spearman": (
            float(spearmanr(both["win_rate_rank"], both["trueskill_rank"]).statistic)
            if len(both) >= 2 else None
        ),
        "kendall": (
            float(kendalltau(both["win_rate_rank"], both["trueskill_rank"]).statistic)
            if len(both) >= 2 else None
        ),
    }

    # per-pair: does the screening (win-rate score) ordering agree with the
    # resolved H2H direction?
    inference = read_parquet_artifact(
        inference_path(cfg), expected_producer="h2h_inference"
    ).to_pandas()
    scores = family.set_index("strategy")["win_rate_score"]
    rows = []
    for row in inference.to_dict(orient="records"):
        a, b = int(row["strategy_a"]), int(row["strategy_b"])
        cls = str(row["decision_class"])
        h2h_direction = (
            "a" if cls.endswith("_a") else ("b" if cls.endswith("_b") else None)
        )
        screening_direction = None
        if a in scores.index and b in scores.index:
            screening_direction = "a" if scores[a] >= scores[b] else "b"
        rows.append(
            {
                "pair_id": int(row["pair_id"]),
                "strategy_a": a,
                "strategy_b": b,
                "decision_class": cls,
                "h2h_direction": h2h_direction,
                "screening_direction": screening_direction,
                "resolved": h2h_direction is not None,
                "agrees": (
                    h2h_direction == screening_direction
                    if h2h_direction is not None and screening_direction is not None
                    else None
                ),
            }
        )
    pairs = pd.DataFrame(rows)
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(pairs, preserve_index=False), pair_agreement_path(cfg),
        producer="agreement", scope="h2h_2p",
        metadata={"operation": "screening_vs_h2h_agreement"},
    )
    resolved = pairs[pairs["resolved"]]
    summary = {
        "family_hash": manifest["family_hash"],
        "family_size": int(len(family)),
        "overlap_summary": manifest["overlap_summary"],
        "rank_correlation": rank_corr,
        "pair_count": int(len(pairs)),
        "resolved_pair_count": int(len(resolved)),
        "agreement_rate_resolved": (
            float(resolved["agrees"].mean()) if len(resolved) else None
        ),
        "interpretation": (
            "Method agreement is conditioned on the frozen family; it is "
            "descriptive and makes no claim about strategies outside it."
        ),
    }
    write_json_atomic(summary_path(cfg), summary)
    write_stage_done(
        out_dir, "agreement",
        inputs=[family_membership_path(cfg), inference_path(cfg)],
        outputs=[pair_agreement_path(cfg), summary_path(cfg)],
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
