"""Freeze the head-to-head candidate family with complete provenance.

Reference parity (``/root/reference/src/farkle/analysis/candidate_family.py``):
the family = union of the top-``candidate_contribution_size`` strategies by
canonical across-k win rate, the top-N by TrueSkill percentile contribution,
plus configured controls and mandatory diagnostics (protected). An optional
``head2head.candidate_cap`` triggers simultaneous *balanced-tail contraction*:
both method cutoffs shrink one rank per round until the family fits, with
full removal provenance. Outputs: a membership parquet and a manifest JSON
carrying admission reasons, method-overlap summary, contraction history, and
a content hash over the frozen family (the downstream schedule contract).
"""

from __future__ import annotations

import hashlib
import json
import logging
from pathlib import Path

import pandas as pd
import pyarrow as pa

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


def family_manifest_path(cfg: AppConfig) -> Path:
    return cfg.h2h_dir() / "candidate_family_manifest.json"


def family_membership_path(cfg: AppConfig) -> Path:
    return cfg.h2h_dir() / "candidate_family.parquet"


def _rank_map(frame: pd.DataFrame, score_column: str) -> tuple[dict[int, int], dict[int, float]]:
    """Descending-score dense ranks with stable strategy tie-break."""
    ordered = frame.sort_values(
        [score_column, "strategy"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    ranks = {int(s): i + 1 for i, s in enumerate(ordered["strategy"])}
    scores = dict(zip(ordered["strategy"].astype(int), ordered[score_column].astype(float)))
    return ranks, scores


def _top_set(ranks: dict[int, int], cutoff: int) -> set[int]:
    return {s for s, r in ranks.items() if r <= cutoff}


def _contract_family(
    *,
    win_ranks: dict[int, int],
    ts_ranks: dict[int, int],
    contribution_size: int,
    candidate_cap: int | None,
    protected: set[int],
):
    initial = {
        "win_rate": min(contribution_size, len(win_ranks)),
        "trueskill": min(contribution_size, len(ts_ranks)),
    }
    cutoffs = dict(initial)

    def family_at(c):
        return _top_set(win_ranks, c["win_rate"]) | _top_set(ts_ranks, c["trueskill"]) | protected

    family = family_at(cutoffs)
    history = [
        {
            "round": 0, "win_rate_cutoff": cutoffs["win_rate"],
            "trueskill_cutoff": cutoffs["trueskill"], "family_size": len(family),
            "removed": [],
        }
    ]
    removal_round: dict[int, int] = {}
    if candidate_cap is not None and len(protected) > candidate_cap:
        raise ValueError(
            "head2head.candidate_cap is smaller than the protected control and "
            f"diagnostic family ({candidate_cap} < {len(protected)})"
        )
    rnd = 0
    while candidate_cap is not None and len(family) > candidate_cap:
        if cutoffs["win_rate"] == 0 and cutoffs["trueskill"] == 0:
            raise RuntimeError("candidate cap contraction cannot reduce the protected family")
        previous = family
        cutoffs = {m: max(0, c - 1) for m, c in cutoffs.items()}
        family = family_at(cutoffs)
        rnd += 1
        removed = sorted(previous - family)
        removal_round.update(dict.fromkeys(removed, rnd))
        history.append(
            {
                "round": rnd, "win_rate_cutoff": cutoffs["win_rate"],
                "trueskill_cutoff": cutoffs["trueskill"], "family_size": len(family),
                "removed": removed,
            }
        )
    if len(family) < 2:
        raise ValueError(
            f"frozen H2H candidate family needs at least two strategies, found {len(family)}"
        )
    return family, initial, cutoffs, history, removal_round


def configured_roots(cfg: AppConfig) -> tuple[int, ...]:
    if cfg.sim.seed_list is not None:
        return tuple(int(v) for v in cfg.sim.seed_list)
    return (int(cfg.sim.seed),)


def freeze_h2h_candidate_family(cfg: AppConfig, *, force: bool = False) -> dict:
    """Build and publish the frozen family (idempotent under the stamp)."""
    from farkle_ii_tpu.analysis.run_trueskill import contribution_path

    stage_sha = compute_stage_config_sha(cfg, "candidate_freeze")
    out_dir = cfg.h2h_dir()
    state = resolve_stage_state(
        out_dir, "candidate_freeze", config_sha=stage_sha,
        freshness_key=cfg.freshness_key(),
    )
    if state == StageState.COMPLETE_VALID and not force:
        logger.info("candidate freeze up to date")
        return json.loads(family_manifest_path(cfg).read_text())

    across = read_parquet_artifact(
        cfg.performance_across_k_path(), expected_producer="performance"
    ).to_pandas()
    if not across["complete_support"].all():
        raise ValueError("candidate freeze requires complete configured k support")
    ts = read_parquet_artifact(
        contribution_path(cfg), expected_producer="trueskill"
    ).to_pandas()

    win_ranks, win_scores = _rank_map(across, "equal_k_score")
    ts_ranks, ts_scores = _rank_map(ts, "percentile_contribution")

    controls = {int(s) for s in cfg.screening.controls}
    diagnostics = {int(s) for s in cfg.screening.mandatory_diagnostics}
    known = set(win_ranks) | set(ts_ranks)
    missing_protected = sorted((controls | diagnostics) - known)
    if missing_protected:
        raise ValueError(
            f"protected strategies lack canonical support: {missing_protected}"
        )
    protected = controls | diagnostics

    size = cfg.screening.candidate_contribution_size
    family, initial_cutoffs, final_cutoffs, history, removal_round = _contract_family(
        win_ranks=win_ranks, ts_ranks=ts_ranks, contribution_size=size,
        candidate_cap=cfg.head2head.candidate_cap, protected=protected,
    )
    win_set = _top_set(win_ranks, final_cutoffs["win_rate"])
    ts_set = _top_set(ts_ranks, final_cutoffs["trueskill"])

    candidates = sorted(family)
    roots = configured_roots(cfg)
    family_hash = hashlib.sha256(
        json.dumps(
            {
                "candidates": candidates,
                "root_seeds": list(roots),
                "win_rate_cutoff": final_cutoffs["win_rate"],
                "trueskill_cutoff": final_cutoffs["trueskill"],
                "contribution_size": size,
                "candidate_cap": cfg.head2head.candidate_cap,
            },
            sort_keys=True, separators=(",", ":"),
        ).encode()
    ).hexdigest()

    rows = []
    for s in sorted(known):
        reasons = []
        if s in win_set:
            reasons.append("win_rate_contribution")
        if s in ts_set:
            reasons.append("trueskill_contribution")
        if s in controls:
            reasons.append("configured_control")
        if s in diagnostics:
            reasons.append("mandatory_diagnostic")
        rows.append(
            {
                "family_hash": family_hash,
                "strategy": s,
                "final_family": s in family,
                "admission_reasons": reasons,
                "win_rate_rank": win_ranks.get(s),
                "win_rate_score": win_scores.get(s),
                "trueskill_rank": ts_ranks.get(s),
                "trueskill_score": ts_scores.get(s),
                "removed_in_contraction_round": removal_round.get(s),
            }
        )
    membership = pd.DataFrame(rows)
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(membership, preserve_index=False),
        family_membership_path(cfg),
        producer="candidate_family", scope="h2h_2p",
        metadata={"operation": "candidate_family_freeze", "family_hash": family_hash},
    )

    intersection = win_set & ts_set
    union = win_set | ts_set
    smaller = min(len(win_set), len(ts_set))
    pair_count = len(candidates) * (len(candidates) - 1) // 2
    manifest = {
        "family_hash": family_hash,
        "candidates": candidates,
        "root_seeds": list(roots),
        "candidate_count": len(candidates),
        "unordered_pair_count": pair_count,
        "initial_cutoffs": initial_cutoffs,
        "final_cutoffs": final_cutoffs,
        "contraction_history": history,
        "protected_controls": sorted(controls),
        "mandatory_diagnostics": sorted(diagnostics),
        "overlap_summary": {
            "win_rate_count": len(win_set),
            "trueskill_count": len(ts_set),
            "intersection_count": len(intersection),
            "union_count": len(union),
            "jaccard": len(intersection) / len(union) if union else 1.0,
            "overlap_coefficient": len(intersection) / smaller if smaller else 1.0,
        },
        "projected_workload": {
            "pairs": pair_count,
            "blocks": pair_count * len(roots) * 2,
        },
    }
    write_json_atomic(family_manifest_path(cfg), manifest)
    write_stage_done(
        out_dir, "candidate_freeze",
        inputs=[cfg.performance_across_k_path(), contribution_path(cfg)],
        outputs=[family_membership_path(cfg), family_manifest_path(cfg)],
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
    logger.info(
        "frozen H2H family: %d candidates, %d pairs, hash %s",
        len(candidates), pair_count, family_hash[:12],
    )
    return manifest


def run(cfg: AppConfig, *, force: bool = False) -> None:
    freeze_h2h_candidate_family(cfg, force=force)
