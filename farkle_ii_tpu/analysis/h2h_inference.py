"""Seat-adjusted head-to-head inference.

Reference parity (``/root/reference/src/farkle/analysis/h2h_inference.py``):

* raw counts combine within seat order across roots (never across orders);
* seat-adjusted effect ``d_AB = 0.5 (q_AB - q_BA)``;
* constrained-null two-proportion score test (``:67``), score-inversion
  confidence intervals at the ordinary family alpha and the Bonferroni
  per-pair alpha (``:101-233``, including the cubic constrained-MLE
  evaluation and outward bisection+Brent fallback for boundary outcomes);
* Holm step-down over the family with the null-reported-as-one convention
  for non-viable pairs (``:279``);
* decision classes: practical dominance (simultaneous bound beyond the
  practical delta), statistical-only advantage (Holm reject), optional
  equivalence (explicit margin only), else unresolved;
* per-candidate viability gates from completion rates (``:553``) and
  root-specific diagnostics with cross-root agreement.
"""

from __future__ import annotations

import json
import logging
import math
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
from scipy.optimize import brentq
from scipy.stats import norm

from farkle_ii_tpu.config import AppConfig, compute_stage_config_sha
from farkle_ii_tpu.utils.artifacts import (
    method_contract,
    read_parquet_artifact,
    write_parquet_artifact_atomic,
)
from farkle_ii_tpu.utils.stage_completion import (
    StageState,
    resolve_stage_state,
    write_stage_done,
)

logger = logging.getLogger(__name__)

SCORE_TEST_ID = "two_proportion_score_constrained_null"
INTERVAL_METHOD = "score_inversion_constrained_mle"
H2H_METHOD_VERSION = 2


def inference_path(cfg: AppConfig) -> Path:
    return cfg.h2h_dir() / "h2h_inference.parquet"


def root_diagnostics_path(cfg: AppConfig) -> Path:
    return cfg.h2h_dir() / "h2h_root_diagnostics.parquet"


# ── score test & intervals ───────────────────────────────────────────────────


@dataclass(frozen=True)
class ScoreResult:
    difference: float
    null_proportion: float
    statistic: float
    p_value: float


def two_proportion_score_test(count1: int, nobs1: int, count2: int, nobs2: int) -> ScoreResult:
    """Constrained-null two-proportion score test."""
    if min(nobs1, nobs2) <= 0:
        raise ValueError("score test needs a nonempty sample on each side")
    if min(count1, count2) < 0 or count1 > nobs1 or count2 > nobs2:
        raise ValueError("score-test win counts exceed their sample sizes")
    delta = count1 / nobs1 - count2 / nobs2
    pooled = (count1 + count2) / (nobs1 + nobs2)
    var = pooled * (1.0 - pooled) * (1.0 / nobs1 + 1.0 / nobs2)
    if var > 0.0:
        z = delta / math.sqrt(var)
        p_value = 2.0 * float(norm.sf(abs(z)))
    elif delta == 0.0:
        z, p_value = 0.0, 1.0
    else:
        z, p_value = math.copysign(math.inf, delta), 0.0
    return ScoreResult(delta, pooled, z, p_value)


def _restricted_mle_p1(
    count1: int, nobs1: int, count2: int, nobs2: int, delta: float
) -> float:
    """Restricted MLE of ``p1`` under the constraint ``p1 - p2 = delta``.

    Farrington & Manning (1990, Statistics in Medicine 9:1447-1454) give the
    unique admissible root of the constrained-likelihood cubic in closed
    trigonometric form. This solves the cubic in the ``p1`` parameterization
    (their eq. for L3..L0 with theta = n2/n1); the admissible root is the
    middle one, selected by the shifted-arccos branch.
    """
    p1_hat = count1 / nobs1
    p2_hat = count2 / nobs2
    theta = nobs2 / nobs1
    a = 1.0 + theta
    b = -(1.0 + theta + p1_hat + theta * p2_hat + delta * (theta + 2.0))
    c = delta * delta + delta * (2.0 * p1_hat + theta + 1.0) + p1_hat + theta * p2_hat
    d = -p1_hat * delta * (1.0 + delta)
    v = (b / (3.0 * a)) ** 3 - b * c / (6.0 * a * a) + d / (2.0 * a)
    u_sq = (b / (3.0 * a)) ** 2 - c / (3.0 * a)
    u = math.copysign(math.sqrt(max(0.0, u_sq)), v) if v != 0.0 else 0.0
    if u == 0.0:
        p1 = -b / (3.0 * a)
    else:
        w = (math.pi + math.acos(max(-1.0, min(1.0, v / u**3)))) / 3.0
        p1 = 2.0 * u * math.cos(w) - b / (3.0 * a)
    return p1


def _score_statistic_at_difference(
    count1: int, nobs1: int, count2: int, nobs2: int, delta: float
) -> float:
    """Constrained-MLE score statistic at a hypothesized difference ``delta``.

    Degenerate hypotheses pin both proportions (``|delta| >= 1``); a zero
    delta reduces the restricted MLE to the pooled rate.
    """
    d_hat = count1 / nobs1 - count2 / nobs2
    if abs(delta) >= 1.0:
        p1, p2 = (0.0, 1.0) if delta < 0.0 else (1.0, 0.0)
    elif delta == 0.0:
        p1 = p2 = (count1 + count2) / (nobs1 + nobs2)
    else:
        root = _restricted_mle_p1(count1, nobs1, count2, nobs2, delta)
        p2 = max(0.0, min(1.0, root - delta))
        p1 = max(0.0, min(1.0, root))
    var = p1 * (1.0 - p1) / nobs1 + p2 * (1.0 - p2) / nobs2
    resid = d_hat - delta
    if var > 0.0:
        return resid / math.sqrt(var)
    return 0.0 if resid == 0.0 else math.copysign(math.inf, resid)


def _score_interval_bound(
    count1, nobs1, count2, nobs2, *, observed, endpoint, critical_value
) -> float:
    """One confidence bound by inverting the score test toward ``endpoint``.

    The rejection excess ``|S(delta)| - z`` is negative at the observed
    difference (where S = 0) and positive at the endpoint whenever a bound
    exists strictly inside. March inward from the endpoint, halving the
    distance to the estimate, until the test stops rejecting; the first
    crossing then lies in the last halving step and Brent's method pins it.
    """
    if endpoint == observed:
        return float(endpoint)

    def excess(difference: float) -> float:
        stat = _score_statistic_at_difference(count1, nobs1, count2, nobs2, difference)
        if math.isnan(stat):
            raise RuntimeError("score interval produced an undefined statistic")
        if math.isinf(stat):
            return 1.0
        return abs(stat) - critical_value

    if excess(endpoint) < 0.0:
        raise RuntimeError("score interval could not bracket a confidence bound")
    inner = outer = endpoint
    while excess(inner) >= 0.0:
        outer = inner
        inner = observed + (inner - observed) / 2.0
        if inner == observed:
            break  # rejection holds arbitrarily close to the estimate
    return float(
        brentq(excess, min(inner, outer), max(inner, outer), xtol=1e-12, rtol=1e-14)
    )


def score_difference_interval(
    count1: int, nobs1: int, count2: int, nobs2: int, *, alpha: float
) -> tuple[float, float]:
    """Invert the constrained score test for the difference of proportions."""
    if alpha <= 0.0 or alpha >= 1.0:
        raise ValueError("score-interval alpha must lie inside (0, 1)")
    if min(nobs1, nobs2) <= 0:
        raise ValueError("score interval needs a nonempty sample on each side")
    d_hat = count1 / nobs1 - count2 / nobs2
    if d_hat > 0.0:
        lo, hi = score_difference_interval(count2, nobs2, count1, nobs1, alpha=alpha)
        return -hi, -lo
    critical = float(norm.isf(alpha / 2.0))
    bounds = tuple(
        _score_interval_bound(
            count1, nobs1, count2, nobs2,
            observed=d_hat, endpoint=side, critical_value=critical,
        )
        for side in (-1.0, 1.0)
    )
    if count1 == count2 and nobs1 == nobs2:
        widest = max(abs(bounds[0]), abs(bounds[1]))
        return -widest, widest
    return bounds


def holm_adjust(p_values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Holm step-down adjusted p-values and stable 1-based positions."""
    m = int(np.size(p_values))
    order = np.argsort(p_values, kind="mergesort")
    stepdown = np.asarray(p_values, dtype=float)[order] * np.arange(m, 0, -1, dtype=float)
    running = np.minimum(1.0, np.maximum.accumulate(stepdown))
    adjusted = np.empty(m, dtype=float)
    adjusted[order] = running
    rank = np.empty(m, dtype=np.int64)
    rank[order] = 1 + np.arange(m)
    return adjusted, rank


# ── combination & decisions ─────────────────────────────────────────────────


_COMBINE_SUM_COLUMNS = (
    "n_completed_required", "max_attempts", "games_attempted", "games_completed",
    "games_safety_limit", "replacement_attempt_count",
    "wins_seat1", "wins_seat2", "wins_a", "wins_b",
)


def combine_within_order(frame: pd.DataFrame, root_count: int) -> pd.DataFrame:
    """Combine raw counts across roots without mixing seat orders."""
    sizes = frame.groupby("pair_id").size()
    expected_rows = 2 * root_count
    if not sizes.eq(expected_rows).all():
        invalid = sizes.loc[sizes != expected_rows].to_dict()
        raise ValueError(f"incomplete root/order support for H2H pairs: {invalid}")
    combined = (
        frame.groupby(
            ["family_hash", "pair_id", "strategy_a", "strategy_b", "order", "order_label"],
            as_index=False, sort=True,
        )
        .agg(
            root_count=("root_seed", "nunique"),
            resolved_cells=("completion_status", lambda v: int((v == "complete").sum())),
            total_cells=("completion_status", "size"),
            **{c: (c, "sum") for c in _COMBINE_SUM_COLUMNS},
        )
        .sort_values(["pair_id", "order"], kind="mergesort")
        .reset_index(drop=True)
    )
    if (combined["root_count"] != root_count).any():
        raise ValueError("per-order root support diverged while combining")
    combined["completion_game_rate"] = (
        combined["games_completed"] / combined["games_attempted"]
    )
    return combined


def candidate_viability(counts: pd.DataFrame, threshold: float) -> dict[int, dict]:
    """Per-candidate completion-rate and incident-pair viability."""
    pair_viable = {
        int(pid): bool(
            (g["completion_status"] == "complete").all()
            and (g["games_completed"] == g["n_completed_required"]).all()
        )
        for pid, g in counts.groupby("pair_id", sort=True)
    }
    game_cols = ["pair_id", "games_attempted", "games_completed", "games_safety_limit"]
    halves = []
    for seat_col in ("strategy_a", "strategy_b"):
        half = counts[game_cols].copy()
        half.insert(0, "strategy", counts[seat_col].astype(int))
        halves.append(half)
    incident = pd.concat(halves, ignore_index=True)
    status = {}
    for s, g in incident.groupby("strategy", sort=True):
        attempted = int(g["games_attempted"].sum())
        completed = int(g["games_completed"].sum())
        rate = completed / attempted if attempted else None
        pairs = sorted(set(g["pair_id"].astype(int)))
        inferential = all(pair_viable[p] for p in pairs)
        operational = rate is not None and rate >= threshold
        status[int(s)] = {
            "completion_rate": rate,
            "games_attempted": attempted,
            "games_completed": completed,
            "games_safety_limit": int(g["games_safety_limit"].sum()),
            "operationally_viable": operational,
            "inferentially_viable": inferential,
        }
    return status, pair_viable


def pairwise_estimates(
    cfg: AppConfig,
    combined: pd.DataFrame,
    plan: dict,
    *,
    pair_viable: dict[int, bool],
    candidate_status: dict[int, dict],
) -> pd.DataFrame:
    """Per-pair tests, intervals, Holm adjustment, and decision classes."""
    pair_count = int(plan["unordered_pair_count"])
    if combined["pair_id"].nunique() != pair_count:
        raise ValueError("combined H2H counts missing planned unordered pairs")
    ordinary_alpha = cfg.head2head.family_alpha
    simultaneous_alpha = ordinary_alpha / pair_count
    rows = []
    for pair_id, group in combined.groupby("pair_id", sort=True):
        ordered = group.set_index("order")
        ab, ba = ordered.loc[0], ordered.loc[1]
        pid = int(pair_id)
        n_ab, n_ba = int(ab["games_completed"]), int(ba["games_completed"])
        x_ab = int(ab["wins_a"])  # A wins from seat 1 in order a_b
        x_ba = int(ba["wins_b"])  # B wins from seat 1 in order b_a
        a_wins_ba = int(ba["wins_a"])
        sa, sb = int(ab["strategy_a"]), int(ab["strategy_b"])
        a_stat, b_stat = candidate_status[sa], candidate_status[sb]
        viable = bool(pair_viable[pid])
        if viable and n_ab != n_ba:
            raise ValueError(f"pair {pid} is not exactly balanced between seat orders")
        operational = a_stat["operationally_viable"] and b_stat["operationally_viable"]
        attempted_total = int(ab["games_attempted"]) + int(ba["games_attempted"])
        completed_total = n_ab + n_ba
        row = {
            "family_hash": str(ab["family_hash"]), "pair_id": pid,
            "strategy_a": sa, "strategy_b": sb,
            "games_attempted": attempted_total, "games_completed": completed_total,
            "games_safety_limit": int(ab["games_safety_limit"]) + int(ba["games_safety_limit"]),
            "completion_game_rate": completed_total / attempted_total,
            "pair_inferentially_viable": viable,
            "pair_operationally_viable": operational,
            "pair_claim_eligible": viable and operational,
            "strategy_a_completion_rate": a_stat["completion_rate"],
            "strategy_b_completion_rate": b_stat["completion_rate"],
            "n_ab": n_ab if viable else None, "n_ba": n_ba if viable else None,
            "q_ab": None, "q_ba": None, "d_ab": None,
            "score_null_proportion": None, "score_z": None, "score_p_value": None,
            "ordinary_alpha": ordinary_alpha,
            "ordinary_d_low": None, "ordinary_d_high": None,
            "bonferroni_alpha_per_pair": simultaneous_alpha,
            "simultaneous_d_low": None, "simultaneous_d_high": None,
            "descriptive_a_completed_win_rate": (
                (x_ab + a_wins_ba) / completed_total if completed_total else None
            ),
            "formal_test_performed": viable,
            "no_test_p_value_convention": (
                None if viable else "null_reported_treated_as_one_for_holm"
            ),
            "score_test_id": SCORE_TEST_ID, "interval_method_id": INTERVAL_METHOD,
            "h2h_method_version": H2H_METHOD_VERSION,
            "planned_target_power": float(plan["target_power"]),
            "planned_worst_scenario_power": float(plan["worst_scenario_achieved_power"]),
        }
        if viable:
            result = two_proportion_score_test(x_ab, n_ab, x_ba, n_ba)
            olow, ohigh = score_difference_interval(
                x_ab, n_ab, x_ba, n_ba, alpha=ordinary_alpha
            )
            slow, shigh = score_difference_interval(
                x_ab, n_ab, x_ba, n_ba, alpha=simultaneous_alpha
            )
            effect = 0.5 * result.difference
            balanced_rate = (x_ab + a_wins_ba) / (n_ab + n_ba)
            if not math.isclose(balanced_rate, 0.5 + effect, abs_tol=1e-12):
                raise RuntimeError(
                    "actual A-win alias disagrees with the seat-order estimator"
                )
            row.update(
                q_ab=x_ab / n_ab, q_ba=x_ba / n_ba, d_ab=effect,
                score_null_proportion=result.null_proportion,
                score_z=result.statistic, score_p_value=result.p_value,
                ordinary_d_low=0.5 * olow, ordinary_d_high=0.5 * ohigh,
                simultaneous_d_low=0.5 * slow, simultaneous_d_high=0.5 * shigh,
            )
        rows.append(row)
    output = pd.DataFrame(rows).sort_values("pair_id", kind="mergesort").reset_index(drop=True)

    performed = output["formal_test_performed"].astype(bool).to_numpy()
    working = np.where(
        performed,
        pd.to_numeric(output["score_p_value"], errors="coerce").fillna(1.0).to_numpy(),
        1.0,
    )
    adjusted, positions = holm_adjust(working)
    output["holm_order"] = pd.array(
        [int(p) if ok else None for p, ok in zip(positions, performed)], dtype="Int64"
    )
    output["holm_adjusted_p"] = np.where(performed, adjusted, np.nan)
    output["holm_reject"] = (
        performed
        & (adjusted <= cfg.head2head.family_alpha)
        & output["pair_claim_eligible"].to_numpy()
    )

    practical = cfg.head2head.practical_delta
    equivalence = cfg.head2head.delta_equivalence
    classes = []
    for row in output.to_dict(orient="records"):
        if not row["pair_claim_eligible"]:
            classes.append("unresolved_nonviable")
            continue
        slow, shigh = float(row["simultaneous_d_low"]), float(row["simultaneous_d_high"])
        effect = float(row["d_ab"])
        if slow > practical:
            classes.append("practical_dominance_a")
        elif shigh < -practical:
            classes.append("practical_dominance_b")
        elif row["holm_reject"]:
            classes.append(
                "statistical_only_advantage_a" if effect > 0 else "statistical_only_advantage_b"
            )
        elif equivalence is not None and slow > -equivalence and shigh < equivalence:
            classes.append("equivalent")
        else:
            classes.append("unresolved")
    output["practical_delta"] = practical
    output["delta_equivalence"] = equivalence
    output["decision_class"] = classes
    output["multiplicity_method"] = "holm"
    return output


def root_specific_diagnostics(counts: pd.DataFrame) -> pd.DataFrame:
    """Per-root seat-adjusted effects + cross-root sign agreement."""
    rows = []
    for (pid, root), group in counts.groupby(["pair_id", "root_seed"], sort=True):
        ordered = group.set_index("order")
        if set(ordered.index.astype(int)) != {0, 1}:
            continue
        ab, ba = ordered.loc[0], ordered.loc[1]
        n_ab, n_ba = int(ab["games_completed"]), int(ba["games_completed"])
        if n_ab == 0 or n_ba == 0:
            continue
        d = 0.5 * (int(ab["wins_a"]) / n_ab - int(ba["wins_b"]) / n_ba)
        rows.append(
            {
                "pair_id": int(pid),
                "root_seed": int(root),
                "strategy_a": int(ab["strategy_a"]),
                "strategy_b": int(ab["strategy_b"]),
                "d_ab_root": d,
                "games_completed": n_ab + n_ba,
            }
        )
    frame = pd.DataFrame(rows)
    if frame.empty or frame["root_seed"].nunique() < 2:
        frame["cross_root_sign_agreement"] = True if not frame.empty else None
        return frame
    sign_agreement = (
        frame.assign(sign=np.sign(frame["d_ab_root"]))
        .groupby("pair_id")["sign"]
        .nunique()
        .le(1)
    )
    frame = frame.merge(
        sign_agreement.rename("cross_root_sign_agreement"), on="pair_id"
    )
    return frame


def run_h2h_inference(cfg: AppConfig, *, force: bool = False) -> pd.DataFrame:
    from farkle_ii_tpu.analysis.h2h_schedule import (
        order_counts_path,
        power_plan_path,
    )

    stage_sha = compute_stage_config_sha(cfg, "h2h_inference")
    out_dir = cfg.h2h_dir()
    state = resolve_stage_state(
        out_dir, "h2h_inference", config_sha=stage_sha,
        freshness_key=cfg.freshness_key(),
    )
    if state == StageState.COMPLETE_VALID and not force:
        return read_parquet_artifact(
            inference_path(cfg), expected_producer="h2h_inference"
        ).to_pandas()

    plan = json.loads(power_plan_path(cfg).read_text())
    counts = read_parquet_artifact(
        order_counts_path(cfg), expected_producer="h2h_schedule"
    ).to_pandas()
    root_count = len(plan["root_seeds"])
    candidate_status, pair_viable = candidate_viability(
        counts, float(plan["min_candidate_completion_rate"])
    )
    combined = combine_within_order(counts, root_count)
    estimates = pairwise_estimates(
        cfg, combined, plan,
        pair_viable=pair_viable, candidate_status=candidate_status,
    )
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(estimates, preserve_index=False), inference_path(cfg),
        producer="h2h_inference", scope="h2h_2p",
        method=method_contract(
            "h2h_score_test", alpha=float(plan["family_alpha"]), adjustment="holm"
        ),
        metadata={
            "operation": "seat_adjusted_inference",
            "uncertainty_method": SCORE_TEST_ID,
            "multiplicity": "holm",
        },
    )
    diagnostics = root_specific_diagnostics(counts)
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(diagnostics, preserve_index=False),
        root_diagnostics_path(cfg),
        producer="h2h_inference", scope="h2h_2p",
        metadata={"operation": "root_specific_diagnostics"},
    )
    write_stage_done(
        out_dir, "h2h_inference",
        inputs=[order_counts_path(cfg), power_plan_path(cfg)],
        outputs=[inference_path(cfg), root_diagnostics_path(cfg)],
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
    return estimates


def run(cfg: AppConfig, *, force: bool = False) -> None:
    run_h2h_inference(cfg, force=force)
