"""Held-out HGB association exploration over the finite strategy grid.

Reference parity (``/root/reference/src/farkle/analysis/run_hgb.py`` +
``hgb_feat.py``): per player count, regress per-strategy win rate on the ten
strategy-definition features with a HistGradientBoostingRegressor, using
deterministic strategy-configuration folds seeded from RNG namespace 600;
report out-of-fold MAE/R², held-out permutation importance (explicitly
"predictive_association_not_causal"), per-feature partial dependence, and a
capped list of future-strategy proposals built from one-option mutations of
the top fitted configurations (never admitted to the current analysis).
"""

from __future__ import annotations

import logging
from hashlib import sha256
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
from sklearn.ensemble import HistGradientBoostingRegressor
from sklearn.inspection import partial_dependence, permutation_importance

from farkle_ii_tpu.config import AppConfig, compute_stage_config_sha
from farkle_ii_tpu.ops.rng import RandomPurpose, coordinate_numpy_rng
from farkle_ii_tpu.simulation.strategies import (
    FavorDiceOrScore,
    ThresholdStrategy,
)
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

FEATURE_COLS = [
    "score_threshold",
    "dice_threshold",
    "consider_score",
    "consider_dice",
    "smart_five",
    "smart_one",
    "favor_score",
    "require_both",
    "auto_hot_dice",
    "run_up_score",
]


def hgb_dir(cfg: AppConfig) -> Path:
    return cfg.scope_dir("across_k") / "hgb"


def strategy_features(cfg: AppConfig) -> pd.DataFrame:
    """Feature matrix indexed by strategy id, parsed from the manifest."""
    manifest = read_parquet_artifact(
        cfg.strategy_manifest_path(), expected_producer="simulation"
    ).to_pandas()
    favor_score = manifest["favor_dice_or_score"].astype(str) == "score"
    features = pd.DataFrame(
        {
            "strategy": manifest["strategy_id"].astype(int),
            "score_threshold": manifest["score_threshold"].astype(np.float32),
            "dice_threshold": manifest["dice_threshold"].astype(np.float32),
            "consider_score": manifest["consider_score"].astype(np.float32),
            "consider_dice": manifest["consider_dice"].astype(np.float32),
            "smart_five": manifest["smart_five"].astype(np.float32),
            "smart_one": manifest["smart_one"].astype(np.float32),
            "favor_score": favor_score.astype(np.float32),
            "require_both": manifest["require_both"].astype(np.float32),
            "auto_hot_dice": manifest["auto_hot_dice"].astype(np.float32),
            "run_up_score": manifest["run_up_score"].astype(np.float32),
        }
    ).set_index("strategy")
    return features[FEATURE_COLS]


def _model_seed(cfg: AppConfig, k: int, fold: int) -> int:
    rng = coordinate_numpy_rng(
        RandomPurpose.HGB, root_seed=cfg.sim.seed, k=k, replicate_index=fold
    )
    return int(rng.integers(0, 2**31 - 1))


def heldout_evaluation(cfg: AppConfig, k: int, subset: pd.DataFrame):
    """Out-of-fold predictions, metrics, and permutation importance."""
    support = len(subset)
    folds = min(cfg.hgb.heldout_folds, support)
    if support < 2 or folds < 2:
        return None
    ordered = subset.sort_values("strategy", kind="mergesort").reset_index(drop=True)
    rng = coordinate_numpy_rng(RandomPurpose.HGB, root_seed=cfg.sim.seed, k=k)
    shuffled = rng.permutation(support)
    fold_ids = np.empty(support, dtype=np.int64)
    fold_ids[shuffled] = np.arange(support) % folds

    x = ordered[FEATURE_COLS].astype(np.float32)
    y = ordered["win_rate"].to_numpy(dtype=np.float32)

    pred_rows, metric_rows = [], []
    imp_means, imp_stds = [], []
    for fold in range(folds):
        test = fold_ids == fold
        train = ~test
        model = HistGradientBoostingRegressor(
            max_depth=cfg.hgb.max_depth,
            max_iter=cfg.hgb.n_estimators,
            random_state=_model_seed(cfg, k, fold + 1),
        )
        model.fit(x.loc[train], y[train])
        predicted = np.asarray(model.predict(x.loc[test]), dtype=float)
        observed = y[test]
        perm = permutation_importance(
            model, x.loc[test], observed,
            n_repeats=cfg.hgb.permutation_repeats,
            random_state=_model_seed(cfg, k, folds + fold + 1),
            scoring="neg_mean_absolute_error",
        )
        imp_means.append(np.asarray(perm.importances_mean, dtype=float))
        imp_stds.append(np.asarray(perm.importances_std, dtype=float))
        for s, obs, est in zip(ordered.loc[test, "strategy"], observed, predicted):
            pred_rows.append(
                {
                    "strategy": int(s), "players": k, "root_seed": cfg.sim.seed,
                    "fold": fold, "observed_win_rate": float(obs),
                    "predicted_win_rate": float(est),
                    "residual": float(obs - est),
                    "finite_grid_support": support,
                }
            )
        ss_tot = float(np.sum((observed - observed.mean()) ** 2))
        metric_rows.append(
            {
                "players": k, "root_seed": cfg.sim.seed, "fold": fold,
                "train_strategies": int(train.sum()),
                "heldout_strategies": int(test.sum()),
                "mae": float(np.mean(np.abs(observed - predicted))),
                "r2": (
                    float(1 - np.sum((observed - predicted) ** 2) / ss_tot)
                    if ss_tot > 0 else 0.0
                ),
                "finite_grid_support": support,
            }
        )
    means = np.vstack(imp_means)
    stds = np.vstack(imp_stds)
    importance = pd.DataFrame(
        {
            "feature": FEATURE_COLS,
            "association_importance_mean": means.mean(axis=0),
            "association_importance_fold_std": (
                means.std(axis=0, ddof=1) if folds > 1 else np.zeros(len(FEATURE_COLS))
            ),
            "association_importance_repeat_std_mean": stds.mean(axis=0),
            "players": k,
            "root_seed": cfg.sim.seed,
            "heldout_folds": folds,
            "finite_grid_support": support,
            "interpretation": "predictive_association_not_causal",
        }
    )
    return importance, pd.DataFrame(pred_rows), pd.DataFrame(metric_rows)


def partial_dependence_frame(
    model: HistGradientBoostingRegressor, features: pd.DataFrame, k: int, root_seed: int
) -> pd.DataFrame:
    rows = []
    for i, name in enumerate(FEATURE_COLS):
        if features[name].nunique() < 2:
            continue
        pd_result = partial_dependence(
            model, features[FEATURE_COLS].astype(np.float32), [i],
            grid_resolution=24,
        )
        for value, avg in zip(pd_result["grid_values"][0], pd_result["average"][0]):
            rows.append(
                {
                    "players": k, "root_seed": root_seed, "feature": name,
                    "feature_value": float(value),
                    "partial_dependence": float(avg),
                }
            )
    return pd.DataFrame(rows)


def _proposal_from_features(values: pd.Series) -> ThresholdStrategy | None:
    try:
        return ThresholdStrategy(
            score_threshold=int(values["score_threshold"]),
            dice_threshold=int(values["dice_threshold"]),
            consider_score=bool(values["consider_score"]),
            consider_dice=bool(values["consider_dice"]),
            smart_five=bool(values["smart_five"]),
            smart_one=bool(values["smart_one"]),
            favor_dice_or_score=(
                FavorDiceOrScore.SCORE if bool(values["favor_score"]) else FavorDiceOrScore.DICE
            ),
            require_both=bool(values["require_both"]),
            auto_hot_dice=bool(values["auto_hot_dice"]),
            run_up_score=bool(values["run_up_score"]),
        )
    except (TypeError, ValueError, OverflowError):
        return None


def future_strategy_proposals(
    *, players: int, features: pd.DataFrame, model, limit: int
) -> pd.DataFrame:
    """One-option mutations of top fitted configurations, capped and hashed."""
    columns = [
        "proposal_id", "strategy_id", "strategy_str", "players", *FEATURE_COLS,
        "predicted_win_rate", "finite_grid_support", "proposal_status",
        "included_in_current_analysis",
    ]
    if limit < 1 or features.empty:
        return pd.DataFrame(columns=columns)
    observed = {tuple(map(float, row)) for row in features[FEATURE_COLS].to_numpy()}
    levels = {c: sorted(features[c].dropna().unique().tolist()) for c in FEATURE_COLS}
    fitted = np.asarray(model.predict(features[FEATURE_COLS].astype(np.float32)))
    base_positions = np.argsort(-fitted, kind="stable")[: min(20, len(features))]
    candidates: dict[tuple, ThresholdStrategy] = {}
    for pos in base_positions:
        base = features.iloc[int(pos)][FEATURE_COLS].copy()
        for col in FEATURE_COLS:
            for level in levels[col]:
                if float(base[col]) == float(level):
                    continue
                cand = base.copy()
                cand[col] = level
                key = tuple(float(cand[c]) for c in FEATURE_COLS)
                if key in observed or key in candidates:
                    continue
                strat = _proposal_from_features(cand)
                if strat is not None:
                    candidates[key] = strat
    if not candidates:
        return pd.DataFrame(columns=columns)
    keys = sorted(candidates)
    cand_features = pd.DataFrame(keys, columns=FEATURE_COLS, dtype=np.float32)
    estimates = np.asarray(model.predict(cand_features))
    order = np.argsort(-estimates, kind="stable")[:limit]
    rows = []
    for pos in order:
        key = keys[int(pos)]
        strat = candidates[key]
        digest = f"{players}|" + "|".join(f"{v:.9g}" for v in key)
        row = {
            "proposal_id": f"hgb-{sha256(digest.encode()).hexdigest()[:16]}",
            "strategy_id": None,
            "strategy_str": str(strat),
            "players": players,
            "predicted_win_rate": float(estimates[int(pos)]),
            "finite_grid_support": len(features),
            "proposal_status": "future_simulation_only",
            "included_in_current_analysis": False,
        }
        row.update(dict(zip(FEATURE_COLS, key)))
        rows.append(row)
    return pd.DataFrame(rows, columns=columns)


def run(cfg: AppConfig, *, force: bool = False) -> None:
    """Full HGB stage across configured player counts."""
    stage_sha = compute_stage_config_sha(cfg, "hgb")
    out_dir = hgb_dir(cfg)
    state = resolve_stage_state(
        out_dir, "hgb", config_sha=stage_sha, freshness_key=cfg.freshness_key()
    )
    if state == StageState.COMPLETE_VALID and not force:
        logger.info("hgb up to date")
        return
    features = strategy_features(cfg)
    ks = sorted(int(k) for k in cfg.sim.n_players_list)
    outputs, inputs = [], [cfg.strategy_manifest_path()]
    importances, proposals_frames = [], []
    for k in ks:
        perf = read_parquet_artifact(
            cfg.performance_by_k_path(k), expected_producer="performance"
        ).to_pandas()
        inputs.append(cfg.performance_by_k_path(k))
        subset = (
            perf[["strategy", "win_rate"]]
            .merge(features, left_on="strategy", right_index=True, how="inner")
        )
        evaluation = heldout_evaluation(cfg, k, subset)
        if evaluation is None:
            logger.warning("hgb k=%d: grid too small for held-out folds", k)
            continue
        importance, predictions, fold_metrics = evaluation
        importances.append(importance)
        for name, frame in (
            (f"heldout_predictions_{k}p.parquet", predictions),
            (f"heldout_fold_metrics_{k}p.parquet", fold_metrics),
            (f"heldout_feature_importance_{k}p.parquet", importance),
        ):
            path = out_dir / name
            write_parquet_artifact_atomic(
                pa.Table.from_pandas(frame, preserve_index=False), path,
                producer="hgb", scope="across_k", k_support=[k],
                method=method_contract(
                    "hgb_importance",
                    max_depth=cfg.hgb.max_depth,
                    n_estimators=cfg.hgb.n_estimators,
                ),
                metadata={"k": k, "interpretation": "predictive_association_not_causal"},
            )
            outputs.append(path)
        # full-grid model for PDP + proposals
        full_model = HistGradientBoostingRegressor(
            max_depth=cfg.hgb.max_depth, max_iter=cfg.hgb.n_estimators,
            random_state=_model_seed(cfg, k, 0),
        )
        full_model.fit(
            subset[FEATURE_COLS].astype(np.float32),
            subset["win_rate"].to_numpy(dtype=np.float32),
        )
        pdp = partial_dependence_frame(full_model, subset, k, cfg.sim.seed)
        pdp_path = out_dir / f"partial_dependence_{k}p.parquet"
        write_parquet_artifact_atomic(
            pa.Table.from_pandas(pdp, preserve_index=False), pdp_path,
            producer="hgb", scope="across_k", metadata={"k": k},
        )
        outputs.append(pdp_path)
        proposals_frames.append(
            future_strategy_proposals(
                players=k, features=subset, model=full_model,
                limit=cfg.hgb.future_proposal_limit,
            )
        )
    if importances:
        overall = pd.concat(importances, ignore_index=True)
        overall_path = out_dir / "feature_importance_overall.parquet"
        write_parquet_artifact_atomic(
            pa.Table.from_pandas(overall, preserve_index=False), overall_path,
            producer="hgb", scope="across_k",
            metadata={"operation": "concat_heldout_importance"},
        )
        outputs.append(overall_path)
    if proposals_frames:
        proposals = pd.concat(proposals_frames, ignore_index=True)
        prop_path = out_dir / "future_simulation_proposals.parquet"
        write_parquet_artifact_atomic(
            pa.Table.from_pandas(proposals, preserve_index=False), prop_path,
            producer="hgb", scope="across_k",
            metadata={"proposal_status": "future_simulation_only"},
        )
        outputs.append(prop_path)
    write_stage_done(
        out_dir, "hgb", inputs=inputs, outputs=outputs,
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
