"""Final sidecar-gated deliverables: JSON report, Markdown, plot.

Reference parity (``/root/reference/src/farkle/analysis/structure_reporting.py``):
renders the end-of-pipeline report with *constrained claim language* — each
claim line states exactly what the evidence supports (practical dominance
with simultaneous bounds, statistical-only advantage under Holm, unresolved)
and nothing stronger — plus a Markdown rendering and a matplotlib figure of
the family's equal-k scores with interval bars.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import pandas as pd

from farkle_ii_tpu.config import AppConfig, compute_stage_config_sha
from farkle_ii_tpu.utils.artifacts import read_parquet_artifact
from farkle_ii_tpu.utils.stage_completion import (
    StageState,
    resolve_stage_state,
    write_stage_done,
)
from farkle_ii_tpu.utils.writer import write_json_atomic

logger = logging.getLogger(__name__)


def report_json_path(cfg: AppConfig) -> Path:
    return cfg.h2h_dir() / "structure_report.json"


def report_markdown_path(cfg: AppConfig) -> Path:
    return cfg.h2h_dir() / "structure_report.md"


def report_plot_path(cfg: AppConfig) -> Path:
    return cfg.h2h_dir() / "structure_report.png"


def claim_lines(inference: pd.DataFrame) -> list[str]:
    """Constrained claim sentences per resolved pair."""
    lines = []
    for row in inference.sort_values("pair_id").to_dict(orient="records"):
        a, b = row["strategy_a"], row["strategy_b"]
        cls = str(row["decision_class"])
        if cls == "practical_dominance_a":
            lines.append(
                f"Strategy {a} practically dominates strategy {b}: the "
                f"simultaneous lower bound on the seat-adjusted effect "
                f"({row['simultaneous_d_low']:.4f}) exceeds the practical "
                f"delta ({row['practical_delta']:.3f})."
            )
        elif cls == "practical_dominance_b":
            lines.append(
                f"Strategy {b} practically dominates strategy {a}: the "
                f"simultaneous upper bound ({row['simultaneous_d_high']:.4f}) "
                f"lies below -{row['practical_delta']:.3f}."
            )
        elif cls.startswith("statistical_only_advantage"):
            winner = a if cls.endswith("_a") else b
            loser = b if cls.endswith("_a") else a
            lines.append(
                f"Strategy {winner} shows a statistically detectable but not "
                f"practically large advantage over strategy {loser} "
                f"(Holm-adjusted p = {row['holm_adjusted_p']:.4g}); no "
                f"practical-dominance claim is supported."
            )
        elif cls == "equivalent":
            lines.append(
                f"Strategies {a} and {b} are equivalent within the declared "
                f"margin ({row['delta_equivalence']})."
            )
        elif cls == "unresolved_nonviable":
            lines.append(
                f"The comparison between strategies {a} and {b} is unresolved "
                f"because completion-rate viability gates failed; no claim is "
                f"made."
            )
        else:
            lines.append(
                f"The evidence does not resolve strategies {a} and {b}: "
                f"neither practical dominance nor a Holm-significant "
                f"difference was established."
            )
    return lines


def render_markdown(payload: dict, lines: list[str]) -> str:
    md = [
        "# Farkle strategy structure report",
        "",
        f"Frozen family hash: `{payload['family_hash']}`",
        f"Candidates: {payload['candidate_count']}; pairs: {payload['pair_count']}.",
        "",
        "## Decision summary",
        "",
    ]
    for cls, count in sorted(payload["decision_counts"].items()):
        md.append(f"- `{cls}`: {count}")
    if payload.get("unique_best") is not None:
        md += [
            "",
            f"**Unique best:** strategy {payload['unique_best']} practically "
            "dominates every other finalist in direct comparison.",
        ]
    md += ["", "## Pairwise claims", ""]
    md += [f"- {line}" for line in lines]
    md += [
        "",
        "## Interpretation limits",
        "",
        "- Claims are conditional on the frozen candidate family and the "
        "configured practical delta; they do not extend to strategies outside "
        "the family.",
        "- Safety-limit games carry no winner and are excluded from formal "
        "comparisons; completion-rate gates guard against selection effects.",
        "",
    ]
    return "\n".join(md)


def write_plot(cfg: AppConfig, inference: pd.DataFrame) -> bool:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return False
    resolved = inference[inference["formal_test_performed"]]
    if resolved.empty:
        return False
    fig, ax = plt.subplots(figsize=(8, max(3, 0.3 * len(resolved))))
    y = range(len(resolved))
    ax.errorbar(
        resolved["d_ab"], list(y),
        xerr=[
            resolved["d_ab"] - resolved["simultaneous_d_low"],
            resolved["simultaneous_d_high"] - resolved["d_ab"],
        ],
        fmt="o", markersize=3, capsize=2, linewidth=1,
    )
    ax.axvline(0, color="grey", linewidth=0.8)
    delta = float(resolved["practical_delta"].iloc[0])
    ax.axvline(delta, color="tab:red", linewidth=0.8, linestyle="--")
    ax.axvline(-delta, color="tab:red", linewidth=0.8, linestyle="--")
    ax.set_yticks(list(y))
    ax.set_yticklabels(
        [f"{a} vs {b}" for a, b in zip(resolved["strategy_a"], resolved["strategy_b"])],
        fontsize=6,
    )
    ax.set_xlabel("seat-adjusted effect d_AB with simultaneous bounds")
    fig.tight_layout()
    fig.savefig(report_plot_path(cfg), dpi=120)
    plt.close(fig)
    return True


def run(cfg: AppConfig, *, force: bool = False) -> None:
    from farkle_ii_tpu.analysis.dominance import structure_path
    from farkle_ii_tpu.analysis.h2h_inference import inference_path
    from farkle_ii_tpu.analysis.structure_agreement import summary_path

    stage_sha = compute_stage_config_sha(cfg, "reporting")
    out_dir = cfg.h2h_dir()
    state = resolve_stage_state(
        out_dir, "reporting", config_sha=stage_sha, freshness_key=cfg.freshness_key()
    )
    if state == StageState.COMPLETE_VALID and not force:
        logger.info("reporting up to date")
        return

    inference = read_parquet_artifact(
        inference_path(cfg), expected_producer="h2h_inference"
    ).to_pandas()
    dominance = json.loads(structure_path(cfg).read_text())
    agreement = json.loads(summary_path(cfg).read_text())
    lines = claim_lines(inference)
    payload = {
        "family_hash": str(inference["family_hash"].iloc[0]) if len(inference) else None,
        "candidate_count": len(
            set(inference["strategy_a"]) | set(inference["strategy_b"])
        ),
        "pair_count": int(len(inference)),
        "decision_counts": inference["decision_class"].value_counts().to_dict(),
        "unique_best": dominance.get("unique_best"),
        "practical_fronts": dominance.get("practical", {}).get("fronts"),
        "cycle_groups": dominance.get("practical", {}).get("cycle_groups"),
        "agreement": agreement,
        "claims": lines,
        "interpretation": (
            "All claims are conditional on the frozen family, the configured "
            "practical delta, and Holm multiplicity control; descriptive "
            "screening artifacts carry no inferential weight."
        ),
    }
    write_json_atomic(report_json_path(cfg), payload)
    report_markdown_path(cfg).write_text(render_markdown(payload, lines), encoding="utf-8")
    plotted = write_plot(cfg, inference)
    outputs = [report_json_path(cfg), report_markdown_path(cfg)]
    if plotted:
        outputs.append(report_plot_path(cfg))

    # final deliverables are sidecar-gated with the full v3 authentication
    # chain: stage identity (code identity + lineage) and the inference /
    # dominance / agreement source bindings (reference structure_reporting
    # publishes under authenticated sidecars)
    from farkle_ii_tpu.utils.authenticated_contract import (
        StageIdentity,
        canonical_json_sha,
        make_authenticated_sidecar,
        resolve_code_identity,
        write_authenticated_completion,
    )
    from farkle_ii_tpu.utils.stage_completion import current_run_lineage

    identity = StageIdentity(
        stage="reporting",
        config_sha=stage_sha,
        freshness_sha=canonical_json_sha(cfg.freshness_key()),
        code_identity=resolve_code_identity().to_dict(),
        run_lineage_sha=current_run_lineage(),
    )
    sources = {
        "inference": inference_path(cfg),
        "dominance": structure_path(cfg),
        "agreement": summary_path(cfg),
    }
    for out in outputs:
        make_authenticated_sidecar(
            out, stage_identity=identity, sources=sources,
            logical_operation="structure_report",
        )
    write_authenticated_completion(
        out_dir / "reporting.completion.json",
        stage_identity=identity,
        outputs={p.name: p for p in outputs},
    )

    write_stage_done(
        out_dir, "reporting",
        inputs=[inference_path(cfg), structure_path(cfg), summary_path(cfg)],
        outputs=outputs,
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
