"""TrueSkill stage integration: ratings, resume, diagnostics, contribution."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from farkle_ii_tpu import config as C
from farkle_ii_tpu.analysis import curate as curate_mod
from farkle_ii_tpu.analysis import ingest as ingest_mod
from farkle_ii_tpu.analysis import run_trueskill as ts
from farkle_ii_tpu.simulation import runner as R


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("trueskill")
    cfg = C.AppConfig()
    cfg.data_dir = str(tmp)
    cfg.sim.seed = 33
    cfg.sim.n_players_list = [2, 3]
    cfg.sim.row_dir = "rows"
    cfg.sim.score_thresholds = [300]
    cfg.sim.dice_thresholds = [2]
    cfg.sim.smart_one_opts = [False]
    cfg.sim.run_up_score_opts = [False]
    cfg.sim.shuffles_per_device_batch = 4
    cfg.screening.resolution_delta = 0.9
    cfg.batching.target_batches = 3
    cfg.batching.min_shuffles_per_batch = 2
    cfg.tpu.aot_cache = False
    C.assign_config_sha(cfg)
    R.run_simulation(cfg, progress=lambda m: None)
    ingest_mod.run(cfg)
    curate_mod.run(cfg)
    ts.run(cfg)
    return cfg


def test_ratings_artifacts(cfg):
    for k in (2, 3):
        t = pq.read_table(ts.ratings_path(cfg, k)).to_pandas()
        assert set(t.columns) >= {"strategy", "mu", "sigma"}
        assert len(t) == 24  # every strategy was seated
        assert (t["sigma"] < 25 / 3).all()  # all gained information
        assert t["mu"].std() > 0


def test_ratings_correlate_with_win_rates(cfg):
    # TrueSkill mu should broadly agree with raw win rates
    from scipy.stats import spearmanr

    for k in (2, 3):
        mu = pq.read_table(ts.ratings_path(cfg, k)).to_pandas().set_index("strategy")["mu"]
        ckpt = pq.read_table(cfg.checkpoint_path(k)).to_pandas().set_index("strategy_id")
        rho = spearmanr(mu, ckpt.loc[mu.index, "win_rate_per_attempt"]).statistic
        assert rho > 0.3, rho


def test_resume_equals_fresh(cfg):
    fresh = ts.run_cell(cfg, 2, force=True)
    resumed = ts.run_cell(cfg, 2)  # all blocks checkpointed -> instant
    np.testing.assert_allclose(fresh["mu"], resumed["mu"])
    np.testing.assert_allclose(fresh["sigma"], resumed["sigma"])


def test_diagnostics_written(cfg):
    import json

    for k in (2, 3):
        diag = json.loads(ts.diagnostics_path(cfg, k).read_text())
        assert diag["games_rated"] > 0
        assert -1.0 <= diag["reversed_order_spearman"] <= 1.0
        assert diag["reversed_order_spearman"] > 0.2  # ratings are order-robust
        assert diag["tau_zero_max_mu_shift"] is not None
        assert 0.0 <= diag["heldout_top1_accuracy"] <= 1.0


def test_percentile_contribution(cfg):
    t = pq.read_table(ts.contribution_path(cfg)).to_pandas()
    assert len(t) == 24
    assert t["percentile_contribution"].between(0, 1).all()
    # best-rated strategy across both k should have a high contribution
    assert t["percentile_contribution"].max() > 0.8


def test_streams_match_full_table(cfg):
    """Streaming chunk iterators reproduce the full-table arrays exactly."""
    import pyarrow.parquet as pq

    src = cfg.curated_rows_path(2)
    full = ts._game_arrays(
        pq.read_table(src, columns=ts._ts_columns(2)).to_pandas(), 2
    )
    fwd = list(ts._iter_game_chunks(src, 2))
    np.testing.assert_array_equal(np.concatenate([c[0] for c in fwd]), full[0])
    np.testing.assert_array_equal(np.concatenate([c[1] for c in fwd]), full[1])
    rev = list(ts._iter_game_chunks(src, 2, reverse=True))
    np.testing.assert_array_equal(
        np.concatenate([c[0] for c in rev]), full[0][::-1]
    )
    np.testing.assert_array_equal(
        np.concatenate([c[1] for c in rev]), full[1][::-1]
    )
    # batch groups partition the stream by deterministic batch id
    groups = list(ts._iter_batch_groups(src, 2))
    assert [b for b, _, _ in groups] == sorted(set(full[2].tolist()))
    np.testing.assert_array_equal(
        np.concatenate([s for _, s, _ in groups]), full[0]
    )


def test_out_of_order_artifact_rejected(cfg, tmp_path):
    """A curated artifact violating coordinate order fails loudly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from farkle_ii_tpu.utils.artifacts import make_sidecar

    src = cfg.curated_rows_path(2)
    df = pq.read_table(src, columns=ts._ts_columns(2)).to_pandas()
    shuffled = df.sort_values("game_index", ascending=False, kind="mergesort")
    bad = tmp_path / "rows_unordered.parquet"
    # two row groups so the cross-batch order check can observe a violation
    pq.write_table(
        pa.Table.from_pandas(shuffled, preserve_index=False), bad,
        row_group_size=max(len(shuffled) // 2, 1),
    )
    make_sidecar(bad, producer="curate")
    with pytest.raises(ValueError, match="coordinate-ordered"):
        for _ in ts._iter_game_chunks(bad, 2, batch_rows=8):
            pass


def test_corrupted_middle_checkpoint_rerates(cfg):
    """A corrupt block checkpoint breaks the contiguous-resume prefix: the
    stream re-rates from that block and converges to the fresh result."""
    fresh = ts.run_cell(cfg, 2, force=True)
    blocks = sorted((cfg.trueskill_dir() / "blocks").glob("ts_2p_block_*.json"))
    assert len(blocks) >= 2
    blocks[1].write_text("{not json")
    resumed = ts.run_cell(cfg, 2)
    np.testing.assert_allclose(fresh["mu"], resumed["mu"])
    np.testing.assert_allclose(fresh["sigma"], resumed["sigma"])
    # the corrupt checkpoint was rewritten valid
    import json as _json

    state = _json.loads(blocks[1].read_text())
    assert state["method_version"] == ts.TRUESKILL_METHOD_VERSION
