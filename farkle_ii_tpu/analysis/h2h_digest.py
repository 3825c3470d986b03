"""H2H digest: compact cross-stage summary of the head-to-head campaign.

Reference parity (the ``h2h_digest`` stage in the reference plans): one JSON
digest per run collecting the plan contract, execution totals, decision-class
counts, viability failures, and per-candidate incident summaries — the
at-a-glance artifact reviewers read before the full report.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

from farkle_ii_tpu.config import AppConfig, compute_stage_config_sha
from farkle_ii_tpu.utils.artifacts import read_parquet_artifact
from farkle_ii_tpu.utils.stage_completion import (
    StageState,
    resolve_stage_state,
    write_stage_done,
)
from farkle_ii_tpu.utils.writer import write_json_atomic

logger = logging.getLogger(__name__)


def digest_path(cfg: AppConfig) -> Path:
    return cfg.h2h_dir() / "h2h_digest.json"


def run(cfg: AppConfig, *, force: bool = False) -> dict:
    from farkle_ii_tpu.analysis.h2h_inference import inference_path
    from farkle_ii_tpu.analysis.h2h_schedule import order_counts_path, power_plan_path

    stage_sha = compute_stage_config_sha(cfg, "h2h_inference")
    out_dir = cfg.h2h_dir()
    state = resolve_stage_state(
        out_dir, "h2h_digest", config_sha=stage_sha, freshness_key=cfg.freshness_key()
    )
    if state == StageState.COMPLETE_VALID and not force:
        return json.loads(digest_path(cfg).read_text())

    plan = json.loads(power_plan_path(cfg).read_text())
    counts = read_parquet_artifact(
        order_counts_path(cfg), expected_producer="h2h_schedule"
    ).to_pandas()
    inference = read_parquet_artifact(
        inference_path(cfg), expected_producer="h2h_inference"
    ).to_pandas()

    nonviable = inference.loc[~inference["pair_claim_eligible"], "pair_id"]
    digest = {
        "family_hash": plan["family_hash"],
        "schedule_hash": plan["schedule_hash"],
        "root_seeds": plan["root_seeds"],
        "candidate_count": plan["candidate_count"],
        "pair_count": plan["unordered_pair_count"],
        "alpha_per_pair": plan["alpha_per_pair"],
        "worst_scenario_achieved_power": plan["worst_scenario_achieved_power"],
        "execution": {
            "blocks": int(len(counts)),
            "games_attempted": int(counts["games_attempted"].sum()),
            "games_completed": int(counts["games_completed"].sum()),
            "games_safety_limit": int(counts["games_safety_limit"].sum()),
            "unresolved_blocks": int((counts["completion_status"] != "complete").sum()),
        },
        "decisions": inference["decision_class"].value_counts().to_dict(),
        "holm_rejections": int(inference["holm_reject"].sum()),
        "claim_ineligible_pairs": [int(p) for p in nonviable],
        "median_completed_games_per_pair": float(
            inference["games_completed"].median()
        ),
    }
    write_json_atomic(digest_path(cfg), digest)
    write_stage_done(
        out_dir, "h2h_digest",
        inputs=[inference_path(cfg), order_counts_path(cfg)],
        outputs=[digest_path(cfg)],
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
    return digest
