"""Screening + HGB stage integration on a small end-to-end run."""

import json

import pyarrow.parquet as pq
import pytest

from farkle_ii_tpu import config as C
from farkle_ii_tpu.analysis import combine as combine_mod
from farkle_ii_tpu.analysis import curate as curate_mod
from farkle_ii_tpu.analysis import hgb as hgb_mod
from farkle_ii_tpu.analysis import ingest as ingest_mod
from farkle_ii_tpu.analysis import metrics as metrics_mod
from farkle_ii_tpu.analysis import screening as screening_mod
from farkle_ii_tpu.simulation import runner as R


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("screen_hgb")
    cfg = C.AppConfig()
    cfg.data_dir = str(tmp)
    cfg.sim.seed = 44
    cfg.sim.n_players_list = [2]
    cfg.sim.row_dir = "rows"
    cfg.sim.score_thresholds = [250, 300, 350]
    cfg.sim.dice_thresholds = [1, 2]
    cfg.sim.smart_one_opts = [False]
    cfg.sim.run_up_score_opts = [False]
    cfg.sim.shuffles_per_device_batch = 4
    cfg.screening.resolution_delta = 0.9
    cfg.screening.practical_delta_by_k = {2: 0.05}
    cfg.screening.bootstrap_replicates = 20
    cfg.screening.candidate_contribution_size = 10
    cfg.batching.target_batches = 3
    cfg.batching.min_shuffles_per_batch = 2
    cfg.hgb.heldout_folds = 3
    cfg.hgb.n_estimators = 40
    cfg.hgb.permutation_repeats = 3
    cfg.hgb.future_proposal_limit = 10
    cfg.tpu.aot_cache = False
    C.assign_config_sha(cfg)
    R.run_simulation(cfg, progress=lambda m: None)
    ingest_mod.run(cfg)
    curate_mod.run(cfg)
    combine_mod.run(cfg)
    metrics_mod.run(cfg)
    screening_mod.run(cfg)
    hgb_mod.run(cfg)
    return cfg


def test_screening_frame(cfg):
    t = pq.read_table(cfg.screening_path()).to_pandas()
    n = len(t)
    assert n > 0
    assert t["score_order_position"].tolist() == list(range(1, n + 1))
    assert t["observed_top_n"].sum() == min(10, n)
    # leader always inside every band
    leader = t.iloc[0]
    assert leader["within_across_k_practical_band"]
    assert leader["within_every_k_practical_band"]
    report = json.loads(screening_mod.screening_report_path(cfg).read_text())
    assert "descriptive" in report["interpretation"].lower()
    assert report["strategy_count"] == n


def test_hgb_artifacts(cfg):
    d = hgb_mod.hgb_dir(cfg)
    fold_metrics = pq.read_table(d / "heldout_fold_metrics_2p.parquet").to_pandas()
    assert len(fold_metrics) == 3
    assert (fold_metrics["mae"] >= 0).all()
    imp = pq.read_table(d / "heldout_feature_importance_2p.parquet").to_pandas()
    assert set(imp["feature"]) == set(hgb_mod.FEATURE_COLS)
    assert (imp["interpretation"] == "predictive_association_not_causal").all()
    preds = pq.read_table(d / "heldout_predictions_2p.parquet").to_pandas()
    # every strategy predicted exactly once out-of-fold
    assert preds["strategy"].is_unique
    pdp = pq.read_table(d / "partial_dependence_2p.parquet").to_pandas()
    assert {"score_threshold", "dice_threshold"} <= set(pdp["feature"])
    props = pq.read_table(d / "future_simulation_proposals.parquet").to_pandas()
    assert len(props) <= 10
    if len(props):
        assert (props["proposal_status"] == "future_simulation_only").all()
        assert (~props["included_in_current_analysis"]).all()


def test_hgb_deterministic_folds(cfg):
    """Same coordinates -> identical fold assignment and importances."""
    import pandas as pd

    features = hgb_mod.strategy_features(cfg)
    perf = pq.read_table(cfg.performance_by_k_path(2)).to_pandas()
    subset = perf[["strategy", "win_rate"]].merge(
        features, left_on="strategy", right_index=True
    )
    a = hgb_mod.heldout_evaluation(cfg, 2, subset)
    b = hgb_mod.heldout_evaluation(cfg, 2, subset)
    pd.testing.assert_frame_equal(a[0], b[0])
    pd.testing.assert_frame_equal(a[1], b[1])
