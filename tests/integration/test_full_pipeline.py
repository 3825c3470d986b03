"""Flagship end-to-end: `run` then `analyze pipeline` through the CLI layer.

Drives every registered stage (preprocess, metrics, descriptive, rating,
exploration, screening, full H2H tail) in one pass and asserts the terminal
deliverables exist and agree.
"""

import json

import pytest

from farkle_ii_tpu import config as C
from farkle_ii_tpu.analysis.stage_runner import StageExecutionError, run_all
from farkle_ii_tpu.simulation import runner as R


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("full")
    cfg = C.AppConfig()
    cfg.data_dir = str(tmp)
    cfg.sim.seed = 66
    cfg.sim.seed_list = [66]
    cfg.sim.n_players_list = [2, 3]
    cfg.sim.row_dir = "rows"
    cfg.sim.expanded_metrics = True
    cfg.sim.score_thresholds = [300]
    cfg.sim.dice_thresholds = [2]
    cfg.sim.smart_one_opts = [False]
    cfg.sim.run_up_score_opts = [False]
    # 24-strategy grid: divisible by both 2 and 3 players
    cfg.sim.shuffles_per_device_batch = 4
    cfg.screening.resolution_delta = 0.9
    cfg.screening.practical_delta_by_k = {2: 0.05, 3: 0.05}
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
def test_run_all_stages(cfg):
    R.run_simulation(cfg, progress=lambda m: None)
    result = run_all(cfg)
    assert not result.failures
    assert result.ran == [
        "ingest", "curate", "combine", "metrics", "game_stats",
        "rng_diagnostics", "trueskill", "hgb", "screening",
        "candidate_freeze", "h2h_power", "h2h_execute", "h2h_inference",
        "h2h_digest", "dominance", "agreement", "reporting",
    ]
    # terminal deliverables exist
    from farkle_ii_tpu.analysis import structure_reporting as rep

    payload = json.loads(rep.report_json_path(cfg).read_text())
    assert payload["pair_count"] >= 1
    assert rep.report_markdown_path(cfg).exists()

    # second invocation: everything up-to-date, still no failures, fast
    result2 = run_all(cfg)
    assert not result2.failures


def test_run_all_without_simulation_fails_cleanly(tmp_path):
    cfg = C.AppConfig()
    cfg.data_dir = str(tmp_path)
    cfg.sim.n_players_list = [2]
    cfg.sim.row_dir = "rows"
    C.assign_config_sha(cfg)
    with pytest.raises(StageExecutionError, match="ingest"):
        run_all(cfg)
