"""End-to-end preprocess chain: run -> ingest -> curate -> combine -> metrics.

The strongest check: estimates derived from exported rows must agree exactly
with the device's independent exact aggregation path.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from farkle_ii_tpu import config as C
from farkle_ii_tpu.analysis import all_player_metrics as apm
from farkle_ii_tpu.analysis import combine as combine_mod
from farkle_ii_tpu.analysis import curate as curate_mod
from farkle_ii_tpu.analysis import ingest as ingest_mod
from farkle_ii_tpu.analysis import metrics as metrics_mod
from farkle_ii_tpu.simulation import runner as R


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("preprocess")
    cfg = C.AppConfig()
    cfg.data_dir = str(tmp)
    cfg.sim.seed = 21
    cfg.sim.n_players_list = [2, 3]
    cfg.sim.row_dir = "rows"
    cfg.sim.expanded_metrics = True
    cfg.sim.score_thresholds = [300]
    cfg.sim.dice_thresholds = [2]
    cfg.sim.smart_one_opts = [False]
    cfg.sim.run_up_score_opts = [False]
    cfg.sim.shuffles_per_device_batch = 4
    cfg.screening.resolution_delta = 0.9
    cfg.screening.practical_delta_by_k = {2: 0.03, 3: 0.03}
    cfg.screening.bootstrap_replicates = 25
    cfg.screening.candidate_contribution_size = 5
    cfg.screening.controls = [0]
    cfg.batching.target_batches = 3
    cfg.batching.min_shuffles_per_batch = 2
    cfg.tpu.aot_cache = False
    C.assign_config_sha(cfg)
    R.run_simulation(cfg, progress=lambda m: None)
    ingest_mod.run(cfg)
    curate_mod.run(cfg)
    combine_mod.run(cfg)
    metrics_mod.run(cfg)
    return cfg


def test_ingest_and_curate_outputs(cfg):
    for k in (2, 3):
        t = pq.read_table(cfg.curated_rows_path(k))
        assert t.num_rows == 6 * (24 // k)
        assert t.schema.names[0] == "root_seed"


def test_combine_row_preservation(cfg):
    t = pq.read_table(cfg.combined_rows_path())
    assert t.num_rows == 6 * 12 + 6 * 8
    # padded seat-3 columns are null exactly for k=2 rows
    k_col = np.asarray(t["k"])
    p3 = t["P3_strategy"].to_pandas()
    assert p3[k_col == 2].isna().all()
    assert p3[k_col == 3].notna().all()


def test_batch_metrics_conservation_and_agreement(cfg):
    for k in (2, 3):
        bm = pq.read_table(cfg.batch_metrics_path(k)).to_pandas()
        apm.validate_unconditional_all_player_schema(
            pq.read_table(cfg.batch_metrics_path(k)).schema
        )
        # exposures: every strategy seated once per shuffle, 6 shuffles total
        per_strategy = bm.groupby("strategy")["raw_player_game_exposures"].sum()
        assert (per_strategy == 6).all()
        # row-path wins equal the device-path checkpoint wins exactly
        ckpt = pq.read_table(cfg.checkpoint_path(k)).to_pandas().set_index("strategy_id")
        wins_rows = bm.groupby("strategy")["raw_wins"].sum()
        np.testing.assert_array_equal(
            wins_rows.to_numpy(), ckpt.loc[wins_rows.index, "wins"].to_numpy()
        )


def test_performance_artifacts(cfg):
    for k in (2, 3):
        t = pq.read_table(cfg.performance_by_k_path(k)).to_pandas()
        assert len(t) == 24
        assert np.allclose(t["chance_delta"], t["win_rate"] - 1.0 / k)
        assert (t["wilson_interval_width"] > 0).all()
    across = pq.read_table(cfg.performance_across_k_path()).to_pandas()
    assert across["complete_support"].all()  # same grid for both k
    assert across["pareto_member"].any()
    assert across["maximin_leader"].sum() == 1
    # equal-k score = mean of the two per-k deltas
    k2 = pq.read_table(cfg.performance_by_k_path(2)).to_pandas().set_index("strategy")
    k3 = pq.read_table(cfg.performance_by_k_path(3)).to_pandas().set_index("strategy")
    for _, row in across.iterrows():
        s = int(row["strategy"])
        expected = (k2.loc[s, "chance_delta"] + k3.loc[s, "chance_delta"]) / 2
        assert row["equal_k_score"] == pytest.approx(expected)

    boot = pq.read_table(cfg.performance_bootstrap_path()).to_pandas()
    assert len(boot) == 24
    assert ((boot["top_n_inclusion_probability"] >= 0) & (boot["top_n_inclusion_probability"] <= 1)).all()
    assert boot["bootstrap_rank_mean"].between(1, 24).all()

    contrasts = pq.read_table(cfg.performance_control_contrasts_path()).to_pandas()
    assert set(contrasts["control_strategy"]) == {0}
    self_row = contrasts[contrasts["strategy"] == 0].iloc[0]
    assert self_row["observed_equal_k_contrast"] == 0.0

    effects = pq.read_table(cfg.performance_player_count_effects_path()).to_pandas()
    assert set(effects["diagnostic_type"]) >= {
        "strategy_k_chance_relative_log_odds",
        "within_k_strategy_spread",
        "strategy_pairwise_k_contrast",
        "pairwise_k_rank_agreement",
    }


def test_seat_analysis_artifacts(cfg):
    for k in (2, 3):
        eff = pq.read_table(cfg.seat_effects_by_k_path(k)).to_pandas()
        pop = pq.read_table(cfg.seat_population_by_k_path(k)).to_pandas()
        assert set(pop["seat"]) == set(range(1, k + 1))
        # population seat effects sum to ~0 when no safety-limit games
        # (win rates across seats sum to completion rate)
        total_rate = pop["win_rate"].sum()
        assert total_rate == pytest.approx(
            pop["raw_completed_exposures"].iloc[0] / pop["raw_exposures"].iloc[0], abs=1e-9
        )
        assert np.allclose(eff["seat_effect"], eff["win_rate"] - 1.0 / k)
    std = pq.read_table(cfg.seat_standardized_across_k_path()).to_pandas()
    assert (std["effect_scope"] == "population").sum() == 2  # common seats = 2
    mix = pq.read_table(cfg.seat_exposure_mixture_diagnostic_path()).to_pandas()
    assert len(mix) == len(std)


def test_idempotent_stamps(cfg):
    # second run of every stage is a no-op (stamps valid)
    ingest_mod.run(cfg)
    curate_mod.run(cfg)
    combine_mod.run(cfg)
    metrics_mod.run(cfg)


def test_device_batch_metrics_matches_row_scan(cfg):
    """The simulation-published batch-metrics artifact equals the streaming
    row-scan rebuild: integer sufficient sums exactly, the six per-exposure
    ratio sums to float-addition-order (last-ulp) tolerance."""
    import json

    from farkle_ii_tpu.utils.stage_completion import stamp_path

    for k in (2, 3):
        stamp = json.loads(
            stamp_path(
                cfg.batch_metrics_path(k).parent, f"batch_metrics_{k}p"
            ).read_text()
        )
        assert stamp.get("produced_by") == "simulation-device"
        dev = pq.read_table(cfg.batch_metrics_path(k)).to_pandas()
        apm.run_for_k(cfg, k, force=True)  # rebuild via the curated-row scan
        scan = pq.read_table(cfg.batch_metrics_path(k)).to_pandas()
        assert list(dev.columns) == list(scan.columns)
        assert len(dev) == len(scan)
        for col in dev.columns:
            if dev[col].dtype.kind in "iu":
                np.testing.assert_array_equal(
                    dev[col].to_numpy(), scan[col].to_numpy(), err_msg=col
                )
            else:
                np.testing.assert_allclose(
                    dev[col].to_numpy(), scan[col].to_numpy(),
                    rtol=1e-12, atol=0, err_msg=col,
                )


def test_streamed_partials_equal_one_shot(cfg):
    """Chunked partial_raw_sums == one-shot build (streaming is exact)."""
    import pandas as pd

    from farkle_ii_tpu.analysis import all_player_metrics as apm

    k = 2
    rows = pq.read_table(cfg.curated_rows_path(k))
    one_shot = apm.build_all_player_batch_metrics(rows, k).to_pandas()
    df = rows.to_pandas()
    thirds = [df.iloc[i::3] for i in range(3)]  # interleaved, unsorted chunks
    streamed = apm.finalize_batch_metrics(
        [apm.partial_raw_sums(c, k) for c in thirds]
    ).to_pandas()
    pd.testing.assert_frame_equal(one_shot, streamed)
