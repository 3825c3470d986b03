"""Two-root reproducibility analysis (pair workflow stage 1).

Reference parity (``/root/reference/src/farkle/analysis/root_stability.py``):
descriptive comparison of the two independent root seeds — *no* root-
superpopulation inference is claimed (docstring ``:1-6``). Components:

* per-strategy equal-k chance-delta discrepancies between roots, raw and
  standardized by the combined batch MCSE, with threshold fractions against
  ``robustness.delta_seed_stability``;
* rank correlations and the 95th-percentile absolute rank movement;
* joint max-discrepancy bootstrap over deterministic batch vectors
  (namespace 401) giving a reference quantile for the observed maximum;
* top-N inclusion overlap, declared-control movement, shortlist changes;
* matched-count convergence over batch-count fractions and first/second-half
  drift within each root.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
from scipy.stats import kendalltau, spearmanr

from farkle_ii_tpu.config import AppConfig, compute_stage_config_sha
from farkle_ii_tpu.ops.rng import RandomPurpose, coordinate_numpy_rng
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
from farkle_ii_tpu.utils.writer import write_json_atomic

logger = logging.getLogger(__name__)


def stability_path(cfg: AppConfig) -> Path:
    return cfg.scope_dir("cross_seed") / "root_stability.parquet"


def summary_path(cfg: AppConfig) -> Path:
    return cfg.scope_dir("cross_seed") / "root_stability_summary.json"


def _equal_k_scores(root_cfg: AppConfig) -> pd.DataFrame:
    across = read_parquet_artifact(
        root_cfg.performance_across_k_path(), expected_producer="performance"
    ).to_pandas()
    complete = across[across["complete_support"]]
    return complete[["strategy", "equal_k_score", "equal_k_mcse"]].set_index("strategy")


def _batch_delta_vectors(root_cfg: AppConfig, ks: list[int]):
    """(batch x strategy) win-rate-delta matrices per k for one root."""
    arrays = {}
    for k in ks:
        frame = read_parquet_artifact(
            root_cfg.batch_metrics_path(k), expected_producer="metrics"
        ).to_pandas()
        wins = frame.pivot(
            index="deterministic_batch_id", columns="strategy", values="raw_wins"
        ).fillna(0)
        exp = frame.pivot(
            index="deterministic_batch_id", columns="strategy",
            values="raw_player_game_exposures",
        ).fillna(0)
        arrays[k] = (wins.to_numpy(dtype=float), exp.to_numpy(dtype=float),
                     wins.columns.to_numpy())
    return arrays


def _equal_k_from_arrays(arrays, ks, strategies, batch_mask=None):
    score = np.zeros(len(strategies))
    for k in ks:
        wins, exp, cols = arrays[k]
        col_index = {int(c): i for i, c in enumerate(cols)}
        sel = [col_index[int(s)] for s in strategies]
        if batch_mask is not None:
            wins = wins[batch_mask[k]]
            exp = exp[batch_mask[k]]
        tw = wins[:, sel].sum(axis=0)
        te = exp[:, sel].sum(axis=0)
        score += tw / np.maximum(te, 1) - 1.0 / k
    return score / len(ks)


def build_two_root_stability(
    pair_cfg: AppConfig, cfg_a: AppConfig, cfg_b: AppConfig, *, force: bool = False
) -> dict:
    stage_sha = compute_stage_config_sha(pair_cfg, "root_stability")
    out_dir = pair_cfg.scope_dir("cross_seed")
    state = resolve_stage_state(
        out_dir, "root_stability", config_sha=stage_sha,
        freshness_key=pair_cfg.freshness_key(),
    )
    if state == StageState.COMPLETE_VALID and not force:
        import json

        return json.loads(summary_path(pair_cfg).read_text())

    ks = sorted(int(k) for k in pair_cfg.sim.n_players_list)
    a = _equal_k_scores(cfg_a)
    b = _equal_k_scores(cfg_b)
    common = sorted(set(a.index) & set(b.index))
    if len(common) < 2:
        raise ValueError("root stability requires at least two common strategies")
    sa = a.loc[common, "equal_k_score"].to_numpy()
    sb = b.loc[common, "equal_k_score"].to_numpy()
    mcse = np.sqrt(
        a.loc[common, "equal_k_mcse"].to_numpy() ** 2
        + b.loc[common, "equal_k_mcse"].to_numpy() ** 2
    )
    disc = sa - sb
    threshold = float(pair_cfg.robustness.delta_seed_stability)

    rank_a = pd.Series(sa, index=common).rank(ascending=False, method="first")
    rank_b = pd.Series(sb, index=common).rank(ascending=False, method="first")
    rank_move = (rank_a - rank_b).abs()

    # joint max-discrepancy bootstrap (namespace 401) over batch vectors,
    # also tracking per-strategy bootstrap top-N inclusion per root
    # (reference root_stability.py:501)
    top_n = min(pair_cfg.screening.candidate_contribution_size, len(common))
    arrays_a = _batch_delta_vectors(cfg_a, ks)
    arrays_b = _batch_delta_vectors(cfg_b, ks)
    replicates = min(pair_cfg.screening.bootstrap_replicates, 500)
    alpha = float(pair_cfg.robustness.joint_discrepancy_alpha)
    max_disc_samples = np.empty(replicates)
    incl_counts_a = np.zeros(len(common))
    incl_counts_b = np.zeros(len(common))
    for r in range(replicates):
        masks_a = {}
        masks_b = {}
        for k in ks:
            na = arrays_a[k][0].shape[0]
            nb = arrays_b[k][0].shape[0]
            rng_a = coordinate_numpy_rng(
                RandomPurpose.ROOT_STABILITY_BOOTSTRAP,
                root_seed=cfg_a.sim.seed, k=k, replicate_index=r,
            )
            rng_b = coordinate_numpy_rng(
                RandomPurpose.ROOT_STABILITY_BOOTSTRAP,
                root_seed=cfg_b.sim.seed, k=k, replicate_index=r,
            )
            masks_a[k] = rng_a.integers(0, na, size=na)
            masks_b[k] = rng_b.integers(0, nb, size=nb)
        res_a = _equal_k_from_arrays(arrays_a, ks, common, masks_a)
        res_b = _equal_k_from_arrays(arrays_b, ks, common, masks_b)
        max_disc_samples[r] = np.abs(res_a - res_b).max()
        incl_counts_a[np.argsort(-res_a, kind="stable")[:top_n]] += 1
        incl_counts_b[np.argsort(-res_b, kind="stable")[:top_n]] += 1
    observed_max = float(np.abs(disc).max())
    bootstrap_quantile = float(np.quantile(max_disc_samples, 1.0 - alpha))
    incl_a = incl_counts_a / replicates
    incl_b = incl_counts_b / replicates

    frame = pd.DataFrame(
        {
            "strategy": common,
            "root_a": cfg_a.sim.seed,
            "root_b": cfg_b.sim.seed,
            "equal_k_score_a": sa,
            "equal_k_score_b": sb,
            "discrepancy": disc,
            "combined_mcse": mcse,
            "standardized_discrepancy": np.divide(
                disc, mcse, out=np.full_like(disc, np.nan), where=mcse > 0
            ),
            "exceeds_stability_delta": np.abs(disc) > threshold,
            "rank_a": rank_a.to_numpy(),
            "rank_b": rank_b.to_numpy(),
            "abs_rank_movement": rank_move.to_numpy(),
            "bootstrap_top_n_inclusion_a": incl_a,
            "bootstrap_top_n_inclusion_b": incl_b,
        }
    )
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(frame, preserve_index=False), stability_path(pair_cfg),
        producer="root_stability", scope="cross_seed", seed_scope="seed_pair",
        method=method_contract(
            "bootstrap",
            n_resamples=replicates,
            rng_namespace=401,
        ),
        metadata={"operation": "two_root_discrepancy", "roots": [cfg_a.sim.seed, cfg_b.sim.seed]},
    )

    # top-N overlap + shortlist changes + control movement
    top_a = set(np.asarray(common)[np.argsort(-sa, kind="stable")[:top_n]].tolist())
    top_b = set(np.asarray(common)[np.argsort(-sb, kind="stable")[:top_n]].tolist())
    shortlist_a = {s for s, v in zip(common, sa) if v >= sa.max() - threshold}
    shortlist_b = {s for s, v in zip(common, sb) if v >= sb.max() - threshold}
    controls = [int(c) for c in pair_cfg.screening.controls if c in set(common)]
    control_movement = {
        str(c): float(disc[common.index(c)]) for c in controls
    }

    # matched-count convergence: leading batch fractions
    convergence = []
    for fraction in pair_cfg.robustness.matched_count_fractions:
        masks_a = {
            k: np.arange(max(1, int(arrays_a[k][0].shape[0] * fraction)))
            for k in ks
        }
        masks_b = {
            k: np.arange(max(1, int(arrays_b[k][0].shape[0] * fraction)))
            for k in ks
        }
        res_a = _equal_k_from_arrays(arrays_a, ks, common, masks_a)
        res_b = _equal_k_from_arrays(arrays_b, ks, common, masks_b)
        convergence.append(
            {
                "fraction": float(fraction),
                "max_abs_discrepancy": float(np.abs(res_a - res_b).max()),
                "mean_abs_discrepancy": float(np.abs(res_a - res_b).mean()),
            }
        )

    # first/second-half drift within each root
    def half_drift(arrays):
        halves = []
        for half in (0, 1):
            masks = {}
            for k in ks:
                n = arrays[k][0].shape[0]
                mid = n // 2
                masks[k] = np.arange(0, mid) if half == 0 else np.arange(mid, n)
            halves.append(_equal_k_from_arrays(arrays, ks, common, masks))
        return float(np.abs(halves[0] - halves[1]).max())

    summary = {
        "roots": [cfg_a.sim.seed, cfg_b.sim.seed],
        "common_strategy_count": len(common),
        "observed_max_abs_discrepancy": observed_max,
        "bootstrap_max_discrepancy_quantile": bootstrap_quantile,
        "bootstrap_alpha": alpha,
        "bootstrap_replicates": replicates,
        "observed_within_bootstrap_band": observed_max <= bootstrap_quantile,
        "fraction_exceeding_stability_delta": float(
            (np.abs(disc) > threshold).mean()
        ),
        "stability_delta": threshold,
        "spearman_rank_correlation": float(spearmanr(sa, sb).statistic),
        "kendall_rank_correlation": float(kendalltau(sa, sb).statistic),
        "rank_movement_p50": float(np.quantile(rank_move, 0.50)),
        "rank_movement_p90": float(np.quantile(rank_move, 0.90)),
        "rank_movement_p95": float(np.quantile(rank_move, 0.95)),
        "rank_movement_max": float(rank_move.max()),
        "top_n_size": top_n,
        "top_n_overlap": len(top_a & top_b),
        "top_n_jaccard": len(top_a & top_b) / len(top_a | top_b),
        "bootstrap_top_n_stable_both": int(((incl_a >= 0.5) & (incl_b >= 0.5)).sum()),
        "bootstrap_top_n_inclusion_max_gap": float(np.abs(incl_a - incl_b).max()),
        "shortlist_size_a": len(shortlist_a),
        "shortlist_size_b": len(shortlist_b),
        "shortlist_symmetric_difference": len(shortlist_a ^ shortlist_b),
        "control_movement": control_movement,
        "matched_count_convergence": convergence,
        "half_drift_root_a": half_drift(arrays_a),
        "half_drift_root_b": half_drift(arrays_b),
        "interpretation": (
            "Descriptive two-root reproducibility; no root-superpopulation "
            "inference is implied."
        ),
    }
    write_json_atomic(summary_path(pair_cfg), summary)
    write_stage_done(
        out_dir, "root_stability",
        inputs=[cfg_a.performance_across_k_path(), cfg_b.performance_across_k_path()],
        outputs=[stability_path(pair_cfg), summary_path(pair_cfg)],
        config_sha=stage_sha, freshness_key=pair_cfg.freshness_key(),
    )
    return summary


def run(cfg: AppConfig, *, force: bool = False) -> None:
    """Stage wrapper: derive the two root configs from the pair config."""
    from farkle_ii_tpu.analysis.run_trueskill import derive_pair_root_cfgs

    cfg_a, cfg_b = derive_pair_root_cfgs(cfg)
    build_two_root_stability(cfg, cfg_a, cfg_b, force=force)
