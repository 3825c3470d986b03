"""rng_diagnostics: grouped autocorr math + four-level output schema."""

import numpy as np
import pandas as pd

from farkle_ii_tpu.analysis.rng_diagnostics import grouped_lagged_autocorr


def test_grouped_autocorr_matches_numpy_per_group():
    rng = np.random.default_rng(11)
    codes = np.repeat(np.arange(5), 200)
    values = rng.normal(size=1000)
    # inject real lag-1 correlation in group 2
    g2 = slice(400, 600)
    v = values.copy()
    v[g2] = np.cumsum(rng.normal(size=200)) * 0.5
    for lag in (1, 3):
        corr, n = grouped_lagged_autocorr(codes, v, lag, 5)
        for g in range(5):
            seg = v[codes == g]
            expected = np.corrcoef(seg[:-lag], seg[lag:])[0, 1]
            assert abs(corr[g] - expected) < 1e-12
            assert n[g] == 200 - lag


def test_lag_pairs_never_cross_group_boundaries():
    codes = np.array([0, 0, 1, 1], dtype=np.int64)
    values = np.array([1.0, 2.0, 100.0, 200.0])
    corr, n = grouped_lagged_autocorr(codes, values, 1, 2)
    assert list(n) == [1, 1]  # one within-group pair each; no cross pair
    assert np.isnan(corr).all()  # single pair: undefined correlation


def test_four_levels_present(tmp_path):
    from farkle_ii_tpu import config as C
    from farkle_ii_tpu.analysis import curate, ingest, rng_diagnostics
    from farkle_ii_tpu.simulation import runner as R

    cfg = C.AppConfig()
    cfg.data_dir = str(tmp_path)
    cfg.sim.seed = 5
    cfg.sim.n_players_list = [3]
    cfg.sim.row_dir = "rows"
    cfg.sim.score_thresholds = [300]
    cfg.sim.dice_thresholds = [2]
    cfg.sim.smart_one_opts = [False]
    cfg.sim.run_up_score_opts = [False]
    cfg.sim.shuffles_per_device_batch = 2
    cfg.screening.resolution_delta = 0.9
    cfg.batching.target_batches = 2
    cfg.batching.min_shuffles_per_batch = 2
    cfg.tpu.aot_cache = False
    cfg.analysis.rng_lags = [1, 2]
    cfg = C.assign_config_sha(cfg)
    R.run_simulation(cfg, progress=lambda m: None)
    ingest.run(cfg)
    curate.run(cfg)
    rng_diagnostics.run(cfg)
    frame = pd.read_parquet(rng_diagnostics.diagnostics_path(cfg, 3))
    levels = set(frame["level"])
    assert levels == {"global", "strategy", "matchup", "matchup_strategy"}
    assert set(frame["lag"]) == {1, 2}
    # bands present and symmetric where defined
    defined = frame.dropna(subset=["diagnostic_band_high"])
    assert (defined["diagnostic_band_low"] == -defined["diagnostic_band_high"]).all()
