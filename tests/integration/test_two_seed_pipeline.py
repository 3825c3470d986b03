"""Two-seed pipeline integration: both roots + stability + pair H2H tail."""

import json

import pyarrow.parquet as pq
import pytest

from farkle_ii_tpu import config as C
from farkle_ii_tpu.orchestration import seed_utils
from farkle_ii_tpu.orchestration.two_seed_pipeline import run_pipeline


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("two_seed")
    cfg = C.AppConfig()
    cfg.data_dir = str(tmp)
    cfg.sim.seed = 71
    cfg.sim.seed_list = [71, 72]
    cfg.sim.n_players_list = [2]
    cfg.sim.row_dir = "rows"
    cfg.sim.score_thresholds = [300]
    cfg.sim.dice_thresholds = [2]
    cfg.sim.smart_one_opts = [False]
    cfg.sim.run_up_score_opts = [False]
    cfg.sim.shuffles_per_device_batch = 4
    cfg.screening.resolution_delta = 0.9
    cfg.screening.practical_delta_by_k = {2: 0.05}
    cfg.screening.bootstrap_replicates = 10
    cfg.screening.candidate_contribution_size = 2
    cfg.batching.target_batches = 2
    cfg.batching.min_shuffles_per_batch = 2
    cfg.head2head.family_alpha = 0.05
    cfg.head2head.target_power = 0.5
    cfg.head2head.practical_delta = 0.2
    cfg.head2head.seat1_advantage_scenarios = [0.0]
    cfg.head2head.max_attempt_multiplier = 1.5
    cfg.hgb.heldout_folds = 2
    cfg.hgb.n_estimators = 20
    cfg.hgb.permutation_repeats = 2
    cfg.tpu.aot_cache = False
    return C.assign_config_sha(cfg)


@pytest.mark.slow
def test_pipeline_runs_both_roots_and_pair(cfg):
    health = run_pipeline(cfg)
    assert health["status"] == "ok"
    assert set(health["roots"]) == {"71", "72"}
    for root in ("71", "72"):
        assert health["roots"][root]["games"] > 0
        assert "screening" in health["roots"][root]["analysis_stages"]
        assert len(health["roots"][root]["lifecycle_identity"]) == 64
    assert health["pair_analysis_stages"][-1] == "reporting"

    pair = seed_utils.pair_dir(cfg, 71, 72)
    assert (pair / "pipeline_health.json").exists()
    assert (pair / "results_seed_71" / "simulation.done.json").exists()
    assert (pair / "results_seed_72" / "2_players" / "2p_checkpoint.parquet").exists()

    # stability artifacts
    pair_cfg = seed_utils.prepare_pair_config(cfg, 71, 72)
    from farkle_ii_tpu.analysis import root_stability as rs

    summary = json.loads(rs.summary_path(pair_cfg).read_text())
    assert summary["roots"] == [71, 72]
    assert -1 <= summary["spearman_rank_correlation"] <= 1
    frame = pq.read_table(rs.stability_path(pair_cfg)).to_pandas()
    assert len(frame) == 24

    # pair family manifest carries both roots; H2H counts cover both
    from farkle_ii_tpu.analysis import candidate_family as fam
    from farkle_ii_tpu.analysis import h2h_schedule as sched

    manifest = json.loads(fam.family_manifest_path(pair_cfg).read_text())
    assert manifest["root_seeds"] == [71, 72]
    counts = pq.read_table(sched.order_counts_path(pair_cfg)).to_pandas()
    assert set(counts["root_seed"]) == {71, 72}
    # per pair: 2 roots x 2 orders
    assert counts.groupby("pair_id").size().eq(4).all()

    # rerun is idempotent (stamps) and healthy
    health2 = run_pipeline(cfg)
    assert health2["status"] == "ok"


def test_distinct_seed_validation(cfg):
    with pytest.raises(ValueError, match="distinct"):
        run_pipeline(cfg, seeds=(5, 5))


def test_active_config_roundtrip(cfg, tmp_path):
    sha = seed_utils.write_active_config(cfg, tmp_path / "active_config.yaml")
    assert len(sha) == 64
