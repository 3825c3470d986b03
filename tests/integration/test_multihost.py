"""Multi-host block partitioning over the shared artifact plane.

Two simulated hosts (FARKLE_HOST_INDEX/COUNT env overrides) split a cell's
deterministic blocks; the worker publishes its blocks and defers, the
finalizing host absorbs them from disk. Totals must be bit-identical to a
single-host run — aggregates are associative integer sums and every game's
RNG is coordinate-addressed, so host assignment can never change results.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from farkle_ii_tpu import config as C
from farkle_ii_tpu.parallel.distributed import host_partition, owns_block
from farkle_ii_tpu.simulation import runner as R


def _tiny_cfg(tmp_path, sub):
    cfg = C.AppConfig()
    cfg.data_dir = str(tmp_path / sub)
    cfg.sim.seed = 21
    cfg.sim.n_players_list = [2]
    cfg.sim.expanded_metrics = True
    cfg.sim.score_thresholds = [300]
    cfg.sim.dice_thresholds = [2]
    cfg.sim.smart_one_opts = [False]
    cfg.sim.run_up_score_opts = [False]
    cfg.sim.shuffles_per_device_batch = 4
    cfg.screening.resolution_delta = 0.9
    cfg.batching.target_batches = 4
    cfg.batching.min_shuffles_per_batch = 2
    cfg.tpu.aot_cache = False
    return C.assign_config_sha(cfg)


def test_host_partition_env_override(monkeypatch):
    monkeypatch.setenv("FARKLE_HOST_COUNT", "4")
    monkeypatch.setenv("FARKLE_HOST_INDEX", "3")
    assert host_partition() == (3, 4)
    assert owns_block(7, 3, 4) and not owns_block(6, 3, 4)


@pytest.mark.slow
def test_two_hosts_match_single_host(tmp_path, monkeypatch):
    single = _tiny_cfg(tmp_path, "single")
    out = R.run_simulation(single, progress=lambda m: None)
    assert out.get("finalized", True) is not False
    base = pq.read_table(single.checkpoint_path(2)).to_pandas()

    multi = _tiny_cfg(tmp_path, "multi")
    # worker first (sequential stand-in for concurrent hosts)
    monkeypatch.setenv("FARKLE_HOST_COUNT", "2")
    monkeypatch.setenv("FARKLE_HOST_INDEX", "1")
    worker_out = R.run_simulation(multi, progress=lambda m: None)
    assert worker_out["finalized"] is False
    assert not multi.checkpoint_path(2).exists()  # workers never publish
    blocks = sorted((multi.n_players_dir(2) / "blocks").glob("block_*.npz"))
    assert [int(b.stem.split("_")[1]) for b in blocks] == [1, 3]

    monkeypatch.setenv("FARKLE_HOST_INDEX", "0")
    final_out = R.run_simulation(multi, progress=lambda m: None)
    assert final_out.get("finalized", True) is not False

    merged = pq.read_table(multi.checkpoint_path(2)).to_pandas()
    for col in ("wins", "attempted_exposures", "safety_limit_exposures",
                "win_rate_per_attempt"):
        np.testing.assert_array_equal(base[col].to_numpy(), merged[col].to_numpy())

    # done stamp exists and the worker's blocks were absorbed, not replayed
    from farkle_ii_tpu.utils.stage_completion import StageState, resolve_stage_state
    from farkle_ii_tpu.config import compute_stage_config_sha

    state = resolve_stage_state(
        multi.results_root, "simulation",
        config_sha=compute_stage_config_sha(multi, "simulation"),
        freshness_key=multi.freshness_key(),
    )
    assert state == StageState.COMPLETE_VALID
