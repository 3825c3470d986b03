"""Descriptive strategy screening from canonical performance evidence.

Reference parity (``/root/reference/src/farkle/analysis/screening.py``):
merges the across-k equal-k frame with the joint-batch bootstrap and per-k
chance deltas; flags ``observed_top_n`` (top ``candidate_contribution_size``
by equal-k score), per-k and across-k practical bands (within delta of the
leader), declared controls and mandatory diagnostics. The JSON report states
explicitly that the output is descriptive only — no inferential tiers.
"""

from __future__ import annotations

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


def screening_report_path(cfg: AppConfig) -> Path:
    return cfg.screening_path().with_name("descriptive_screening.json")


def _sources(cfg: AppConfig) -> tuple[list[int], list[Path]]:
    ks = sorted({int(k) for k in cfg.sim.n_players_list})
    return ks, [
        cfg.performance_across_k_path(),
        cfg.performance_bootstrap_path(),
        *(cfg.performance_by_k_path(k) for k in ks),
    ]


def build_screening_frame(cfg: AppConfig, player_counts: list[int]) -> pd.DataFrame:
    across = read_parquet_artifact(
        cfg.performance_across_k_path(), expected_producer="performance"
    ).to_pandas()
    bootstrap = read_parquet_artifact(
        cfg.performance_bootstrap_path(), expected_producer="performance"
    ).to_pandas()
    if not across["complete_support"].all():
        incomplete = across.loc[~across["complete_support"], "strategy"].astype(int).tolist()
        raise ValueError(
            "descriptive screening requires complete configured k support; "
            f"incomplete strategies: {incomplete[:20]}"
        )
    output = across.merge(bootstrap, on=["root_seed", "strategy"], validate="one_to_one")
    output = output.sort_values(
        ["equal_k_score", "strategy"], ascending=[False, True]
    ).reset_index(drop=True)
    output["score_order_position"] = output.index + 1
    output["observed_top_n"] = output["score_order_position"] <= min(
        cfg.screening.candidate_contribution_size, len(output)
    )
    leader = float(output["equal_k_score"].max())
    output["within_across_k_practical_band"] = output["equal_k_score"] >= (
        leader - float(cfg.screening.delta_across_k or 0.0)
    )
    output["declared_control"] = output["strategy"].isin(cfg.screening.controls)
    output["mandatory_diagnostic"] = output["strategy"].isin(
        cfg.screening.mandatory_diagnostics
    )

    band_columns = []
    practical = {int(k): float(v) for k, v in cfg.screening.practical_delta_by_k.items()}
    for k in player_counts:
        frame = read_parquet_artifact(
            cfg.performance_by_k_path(k), expected_producer="performance"
        ).to_pandas()
        selected = frame[
            ["root_seed", "strategy", "chance_delta", "win_rate", "raw_exposures"]
        ].rename(
            columns={
                "chance_delta": f"chance_delta_k{k}",
                "win_rate": f"win_rate_k{k}",
                "raw_exposures": f"raw_exposures_k{k}",
            }
        )
        output = output.merge(selected, on=["root_seed", "strategy"], validate="one_to_one")
        band = f"within_k{k}_practical_band"
        band_columns.append(band)
        best = float(output[f"chance_delta_k{k}"].max())
        output[band] = output[f"chance_delta_k{k}"] >= best - practical[k]
    output["within_every_k_practical_band"] = output[band_columns].all(axis=1)
    return output


def run(cfg: AppConfig, *, force: bool = False) -> None:
    """Write descriptive evidence without inferential tiers or equality claims."""
    player_counts, sources = _sources(cfg)
    missing = [p for p in sources if not p.exists()]
    if missing:
        raise FileNotFoundError(f"descriptive screening inputs are missing: {missing}")
    output = cfg.screening_path()
    report = screening_report_path(cfg)
    stage_sha = compute_stage_config_sha(cfg, "screening")
    state = resolve_stage_state(
        output.parent, "screening", config_sha=stage_sha,
        freshness_key=cfg.freshness_key(),
    )
    if state == StageState.COMPLETE_VALID and not force:
        logger.info("screening up to date")
        return
    frame = build_screening_frame(cfg, player_counts)
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(frame, preserve_index=False), output,
        producer="screening", scope="across_k",
        metadata={
            "operation": "equal_k_mean",
            "baseline": "chance_1_over_k",
            "uncertainty_method": "descriptive_with_joint_batch_resampling",
            "player_counts": player_counts,
        },
    )
    payload = {
        "artifact": output.name,
        "interpretation": (
            "Descriptive finite-grid screening evidence only; practical bands "
            "are not tests of equality, final tiers, or unique-best decisions."
        ),
        "player_counts": player_counts,
        "strategy_count": len(frame),
        "pareto_count": int(frame["pareto_member"].sum()),
        "maximin_leader": int(frame.loc[frame["maximin_leader"], "strategy"].iloc[0]),
        "control_count": int(frame["declared_control"].sum()),
        "mandatory_diagnostic_count": int(frame["mandatory_diagnostic"].sum()),
    }
    write_json_atomic(report, payload)
    write_stage_done(
        output.parent, "screening", inputs=sources, outputs=[output, report],
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
