"""End-to-end runner tests: full config-driven run, artifacts, resume, CLI."""

import json

import numpy as np
import pyarrow.parquet as pq
import pytest

from farkle_ii_tpu import config as C
from farkle_ii_tpu.simulation import runner as R
from farkle_ii_tpu.utils import manifest as mf
from farkle_ii_tpu.utils.stage_completion import StageState, resolve_stage_state


@pytest.fixture()
def cfg(tmp_path):
    cfg = C.AppConfig()
    cfg.data_dir = str(tmp_path)
    cfg.sim.seed = 11
    cfg.sim.n_players_list = [2, 3]
    cfg.sim.expanded_metrics = True
    # 24-strategy grid, tiny workload
    cfg.sim.score_thresholds = [300]
    cfg.sim.dice_thresholds = [2]
    cfg.sim.smart_one_opts = [False]
    cfg.sim.run_up_score_opts = [False]
    cfg.sim.shuffles_per_device_batch = 4
    cfg.screening.resolution_delta = 0.9  # tiny requirement
    cfg.batching.target_batches = 3
    cfg.batching.min_shuffles_per_batch = 2
    cfg.tpu.aot_cache = False
    return C.assign_config_sha(cfg)


@pytest.mark.slow
def test_full_run_artifacts_and_resume(cfg):
    out = R.run_simulation(cfg, progress=lambda m: None)
    assert out["n_strategies"] == 24

    # planned workload: 3 batches x 2 shuffles
    plans = json.loads(cfg.workload_plan_path().read_text())
    assert plans["2"]["required_shuffles"] == 6
    assert plans["2"]["games_per_shuffle"] == 12

    # per-strategy summary
    t = pq.read_table(cfg.checkpoint_path(2))
    assert t.num_rows == 24
    wins = np.asarray(t["wins"])
    attempted = np.asarray(t["attempted_exposures"])
    assert attempted.sum() == 6 * 12 * 2  # every game exposes 2 strategies
    assert (attempted == 6).all()  # each strategy seated once per shuffle
    assert wins.sum() <= 6 * 12

    # expanded metrics
    m = pq.read_table(cfg.metrics_path(3))
    assert "winning_score_sum" in m.column_names
    assert "winning_score_sq_sum" in m.column_names

    # strategy manifest
    sm = pq.read_table(cfg.strategy_manifest_path())
    assert sm.num_rows == 24
    assert "strategy_str" in sm.column_names

    # stamp is COMPLETE_VALID under the same scoped sha
    sha = C.compute_stage_config_sha(cfg, "simulation")
    assert (
        resolve_stage_state(
            cfg.results_root, "simulation", config_sha=sha,
            freshness_key=cfg.freshness_key(),
        )
        == StageState.COMPLETE_VALID
    )

    # manifest events recorded
    events = [r["event"] for r in mf.read_manifest(cfg.manifest_path())]
    assert events[0] == "run_start" and events[-1] == "run_end"
    assert events.count("stage_start") == 2

    # ---- resume: re-run absorbs all blocks without replaying ----
    first = pq.read_table(cfg.checkpoint_path(2)).to_pydict()
    out2 = R.run_simulation(cfg, progress=lambda m: None)
    res2 = out2["results"][2]
    assert sorted(res2.resumed_batches) == [0, 1, 2]
    assert res2.completed_batches == []
    second = pq.read_table(cfg.checkpoint_path(2)).to_pydict()
    assert first == second  # identical totals from replayed blocks

    # ---- partial resume: delete one block, only it is replayed ----
    (cfg.n_players_dir(2) / "blocks" / "block_000001.npz").unlink()
    out3 = R.run_simulation(cfg, progress=lambda m: None)
    res3 = out3["results"][2]
    assert sorted(res3.resumed_batches) == [0, 2]
    assert res3.completed_batches == [1]
    third = pq.read_table(cfg.checkpoint_path(2)).to_pydict()
    assert first == third  # exact reproduction after replay


def test_row_export(cfg):
    from farkle_ii_tpu.simulation import rows as rows_mod

    cfg.sim.row_dir = "rows"
    cfg.sim.n_players_list = [2]
    R.run_simulation(cfg, progress=lambda m: None)
    rows_dir = cfg.rows_dir(2)
    shards = sorted(rows_dir.glob("rows_*.parquet"))
    assert len(shards) == 2 * 3 // 2  # ceil(2/4)=1 chunk per batch? see below
    manifest_records = list(mf.read_manifest(rows_dir / "rows_manifest.ndjson"))
    assert all(r["kind"] == "row_shard" for r in manifest_records)
    total_rows = 0
    for shard in shards:
        t = pq.read_table(shard)
        rows_mod.validate_rows_table(t)
        total_rows += t.num_rows
    # 3 batches x 2 shuffles x 12 games
    assert total_rows == 6 * 12
    # row-level winner tally matches the aggregate checkpoint exactly
    t = pq.read_table(cfg.checkpoint_path(2))
    wins = np.asarray(t["wins"])
    row_wins = np.zeros(24, dtype=np.int64)
    for shard in shards:
        d = pq.read_table(shard).to_pydict()
        for ws in d["winner_strategy"]:
            if ws is not None:
                row_wins[ws] += 1
    np.testing.assert_array_equal(row_wins, wins)


@pytest.mark.slow
def test_force_discards_blocks(cfg):
    R.run_simulation(cfg, progress=lambda m: None)
    out = R.run_simulation(cfg, force=True, progress=lambda m: None)
    res = out["results"][2]
    assert res.resumed_batches == []
    assert sorted(res.completed_batches) == [0, 1, 2]


def test_player_count_divisibility_validation(cfg):
    cfg.sim.n_players_list = [5]  # 24 strategies not divisible by 5
    with pytest.raises(ValueError, match="not divisible"):
        R.run_simulation(cfg)


def test_cli_run_and_time(cfg, tmp_path, monkeypatch, capsys):
    from farkle_ii_tpu.cli import main as cli

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(
        f"""
data_dir: {tmp_path}
sim:
  seed: 11
  n_players_list: [2]
  score_thresholds: [300]
  dice_thresholds: [2]
  smart_one_opts: [false]
  run_up_score_opts: [false]
  shuffles_per_device_batch: 4
screening:
  resolution_delta: 0.9
batching:
  target_batches: 2
  min_shuffles_per_batch: 2
tpu:
  aot_cache: false
"""
    )
    code = cli.main(["--config", str(cfg_path), "run"])
    assert code == 0
    code = cli.main(["--config", str(cfg_path), "time", "--n-games", "64", "--k", "2"])
    assert code == 0


def test_watch_game_runs(capsys):
    from farkle_ii_tpu.simulation.watch_game import watch_game

    lines = []
    watch_game(seed=3, k=2, out=lines.append)
    text = "\n".join(lines)
    assert "P1" in text and "rolls" in text
    assert ("Winner" in text) or ("Safety limit" in text)


@pytest.mark.slow
def test_device_fault_block_retry(cfg, monkeypatch, caplog):
    """A device fault mid-block falls back to a nocompact serial retry with
    identical totals (guards the TPU worker-crash mitigation)."""
    import logging

    import jax

    baseline = R.run_simulation(cfg, progress=lambda m: None)
    base_acc = baseline["results"][2].accumulator

    import copy
    import tempfile

    cfg2 = copy.deepcopy(cfg)
    cfg2.data_dir = tempfile.mkdtemp()
    C.assign_config_sha(cfg2)

    from farkle_ii_tpu.simulation import tournament as T

    real = T.TournamentAccumulator.absorb
    state = {"fired": False}

    def flaky(self, agg):
        if not state["fired"]:
            state["fired"] = True
            raise RuntimeError("UNAVAILABLE: TPU worker process crashed (injected)")
        return real(self, agg)

    monkeypatch.setattr(T.TournamentAccumulator, "absorb", flaky)
    with caplog.at_level(logging.WARNING, logger="farkle_ii_tpu"):
        out = R.run_simulation(cfg2, progress=lambda m: None)
    assert state["fired"]
    assert any("retrying without compaction" in r.message for r in caplog.records)
    acc = out["results"][2].accumulator
    assert acc.games_attempted == base_acc.games_attempted
    assert np.array_equal(np.asarray(acc.wins), np.asarray(base_acc.wins))
    assert np.array_equal(acc.metric_sums, base_acc.metric_sums)
    assert np.array_equal(acc.metric_sq_sums, base_acc.metric_sq_sums)


def _mini_cfg(tmp_path, sub, mesh_devices):
    cfg = C.AppConfig()
    cfg.data_dir = str(tmp_path / sub)
    cfg.sim.seed = 19
    cfg.sim.n_players_list = [3]
    cfg.sim.expanded_metrics = True
    cfg.sim.score_thresholds = [300]
    cfg.sim.dice_thresholds = [2]
    cfg.sim.smart_one_opts = [False]
    cfg.sim.run_up_score_opts = [False]
    cfg.sim.shuffles_per_device_batch = 2
    cfg.screening.resolution_delta = 0.9
    cfg.batching.target_batches = 2
    cfg.batching.min_shuffles_per_batch = 9  # 9 % 8 != 0: exercises remainder
    cfg.tpu.aot_cache = False
    cfg.tpu.mesh_devices = mesh_devices
    return C.assign_config_sha(cfg)


@pytest.mark.slow
def test_mesh_runner_bit_identical_to_single_device(tmp_path):
    """Full runner over the 8-device CPU mesh == single device, bit for bit.

    The mesh analogue of the reference's "changing worker counts never
    changes results" contract (run_tournament.py:1337, docs contract).
    """
    import jax

    assert len(jax.devices()) == 8  # conftest virtual CPU mesh
    cfg1 = _mini_cfg(tmp_path, "one", 1)
    cfg8 = _mini_cfg(tmp_path, "eight", 8)
    R.run_simulation(cfg1, progress=lambda m: None)
    R.run_simulation(cfg8, progress=lambda m: None)
    t1 = pq.read_table(cfg1.checkpoint_path(3))
    t8 = pq.read_table(cfg8.checkpoint_path(3))
    assert t1.equals(t8)
    m1 = pq.read_table(cfg1.metrics_path(3))
    m8 = pq.read_table(cfg8.metrics_path(3))
    assert m1.equals(m8)
    # the sharded path really ran: mesh run used sharded chunks (8 of 9
    # shuffles per block), single-device used 2-shuffle chunks
    assert np.asarray(t8["attempted_exposures"]).sum() == 18 * 8 * 3


def test_cli_surface(cfg, tmp_path):
    """analyze flags, --seed-pair exclusivity, seed-list-length enforcement."""
    import pytest

    from farkle_ii_tpu.cli import main as cli

    parser = cli.build_parser()
    args = parser.parse_args(
        ["analyze", "metrics", "--compute-game-stats", "--rng-lags", "1", "2",
         "--rare-event-target", "9000"]
    )
    c = C.AppConfig()
    cli._apply_analysis_flags(c, args)
    assert c.analysis.outputs["compute_game_stats"] is True
    assert c.analysis.rng_lags == [1, 2]
    assert c.analysis.rare_event_target == 9000

    args = parser.parse_args(["two-seed-pipeline", "--seed-pair", "3", "4"])
    assert cli._resolve_seed_pair(args) == (3, 4)
    args = parser.parse_args(
        ["two-seed-pipeline", "--seed-pair", "3", "4", "--seed-a", "5"]
    )
    with pytest.raises(SystemExit):
        cli._resolve_seed_pair(args)

    one = C.AppConfig()
    one.sim.seed_list = [1, 2]
    with pytest.raises(SystemExit, match="exactly 1"):
        cli._enforce_seed_list_length(one, "run")
    cli._enforce_seed_list_length(one, "two-seed-pipeline")


@pytest.mark.slow
def test_resume_rejects_foreign_block(cfg, caplog):
    """A persisted block whose coordinates don't match the plan is replayed,
    and a tampered block is rejected (corrupted-resume negative test)."""
    import logging as _logging

    out = R.run_simulation(cfg, progress=lambda m: None)
    n = 2
    block0 = cfg.n_players_dir(n) / "blocks" / "block_000000.npz"
    assert block0.exists()

    # tamper: swap in the block from a different batch id (wrong coordinates)
    block1 = cfg.n_players_dir(n) / "blocks" / "block_000001.npz"
    block0.write_bytes(block1.read_bytes())
    import shutil

    shutil.copy(str(block1) + ".sidecar.json", str(block0) + ".sidecar.json")
    with caplog.at_level(_logging.WARNING):
        out2 = R.run_simulation(cfg, progress=lambda m: None)
    res = out2["results"][2]
    assert 0 not in res.resumed_batches  # foreign block rejected -> replayed
    assert any("unusable" in r.message for r in caplog.records)
    # results identical to the clean run (exact replay)
    t1 = out["results"][2].accumulator
    t2 = res.accumulator
    assert (t1.wins == t2.wins).all()
    assert t1.metric_sq_sums.sum() == t2.metric_sq_sums.sum()


@pytest.mark.slow
def test_probed_envelope_overrides_chunk_size(cfg, tmp_path, caplog):
    """The runner sizes device chunks from a probed fault-envelope artifact
    and produces identical results (chunking is execution-only)."""
    import logging

    baseline = R.run_simulation(cfg, progress=lambda m: None)
    base_t = pq.read_table(cfg.checkpoint_path(2)).to_pandas()

    env_path = tmp_path / "envelope.json"
    env_path.write_text(json.dumps({
        "envelope_version": 1,
        "n_strategies": 24,
        # plan is 2 shuffles/batch; only ns=1 is "probed safe" for k=2, so
        # the runner must drop from the configured 4 to 1
        "ok_shapes": [[2, 1, True]],
    }))
    cfg2 = C.AppConfig()
    cfg2.data_dir = str(tmp_path / "env_run")
    for attr in ("seed", "n_players_list", "expanded_metrics", "score_thresholds",
                 "dice_thresholds", "smart_one_opts", "run_up_score_opts",
                 "shuffles_per_device_batch"):
        setattr(cfg2.sim, attr, getattr(cfg.sim, attr))
    cfg2.screening.resolution_delta = cfg.screening.resolution_delta
    cfg2.batching.target_batches = cfg.batching.target_batches
    cfg2.batching.min_shuffles_per_batch = cfg.batching.min_shuffles_per_batch
    cfg2.tpu.aot_cache = False
    cfg2.tpu.fault_envelope_path = str(env_path)
    C.assign_config_sha(cfg2)

    with caplog.at_level(logging.INFO, logger="farkle_ii_tpu.simulation.runner"):
        out = R.run_simulation(cfg2, progress=lambda m: None)
    assert out["n_strategies"] == baseline["n_strategies"]
    assert any("probed fault" in rec.message for rec in caplog.records)

    # bit-identical per-strategy summary despite the different chunk size
    env_t = pq.read_table(cfg2.checkpoint_path(2)).to_pandas()
    for col in ("wins", "attempted_exposures", "win_rate_per_attempt"):
        np.testing.assert_array_equal(base_t[col].to_numpy(), env_t[col].to_numpy())


def test_simulation_golden_values(cfg, golden):
    """Pin exact per-strategy outcomes of the deterministic tiny run.

    All RNG streams are pure functions of coordinates, so these values are
    bit-stable across machines, chunkings, and resumes; any change means the
    statistical engine changed and must be a deliberate version bump
    (refresh with --update-goldens).
    """
    R.run_simulation(cfg, progress=lambda m: None)
    t = pq.read_table(cfg.checkpoint_path(2)).to_pandas().sort_values("strategy_id")
    m = pq.read_table(cfg.metrics_path(2)).to_pandas().sort_values("strategy_id")
    golden("simulation_seed11_k2", {
        "wins": t["wins"].astype(int).tolist(),
        "attempted_exposures": t["attempted_exposures"].astype(int).tolist(),
        "safety_limit_exposures": t["safety_limit_exposures"].astype(int).tolist(),
        "winning_score_sum": m["winning_score_sum"].astype(int).tolist(),
        "winning_score_sq_sum": m["winning_score_sq_sum"].astype(int).tolist(),
        "n_rounds_sum": m["n_rounds_sum"].astype(int).tolist(),
    })


def _all_rows_frame(cfg, n):
    """Concatenate every row shard of cell ``n`` in coordinate order."""
    import pandas as pd

    shards = sorted(cfg.rows_dir(n).glob("rows_*.parquet"))
    assert shards, "no row shards written"
    frame = pd.concat([pq.read_table(s).to_pandas() for s in shards])
    return frame.sort_values(["shuffle_index", "game_index"]).reset_index(drop=True)


@pytest.mark.slow
def test_mesh_row_export_bit_identical(tmp_path):
    """Row export over the 8-device mesh == single device, row for row.

    Round 2 pinned row export to one device; the sharded rows step keeps the
    packed row buffer sharded over the shuffle axis and the host assembles it
    in global shuffle order (the mesh analogue of the reference's parallel
    per-worker row shards, run_tournament.py:491-513). Shard boundaries
    differ by design; the row *contents* must not.
    """
    import jax

    assert len(jax.devices()) == 8
    frames = {}
    for sub, mesh_devices in (("one", 1), ("eight", 8)):
        cfg = _mini_cfg(tmp_path, sub, mesh_devices)
        cfg.sim.row_dir = "rows"
        C.assign_config_sha(cfg)
        R.run_simulation(cfg, progress=lambda m: None)
        frames[mesh_devices] = _all_rows_frame(cfg, 3)
        # aggregates stay bit-identical too
        frames[f"ckpt{mesh_devices}"] = pq.read_table(cfg.checkpoint_path(3))
    lhs, rhs = frames[1], frames[8]
    assert len(lhs) == 18 * 8  # 2 batches x 9 shuffles x 8 games
    # deterministic_batch_id reflects dispatch granularity, not game outcomes
    cols = [c for c in lhs.columns if c != "deterministic_batch_id"]
    assert lhs[cols].equals(rhs[cols]), "mesh row export changed row contents"
    assert frames["ckpt1"].equals(frames["ckpt8"])


@pytest.mark.slow  # >15 s compile-heavy; ci-full still runs it
def test_grouped_rows_dispatch_bit_identical(tmp_path):
    """blocks_per_dispatch>1 with row export on: one device batch plays m
    whole blocks and returns per-block aggregates plus the packed row buffer
    in two fetches; rows and aggregates must match per-block dispatch."""
    frames = {}
    for m, sub in ((1, "single"), (2, "grouped")):
        cfg = C.AppConfig()
        cfg.data_dir = str(tmp_path / sub)
        cfg.sim.seed = 29
        cfg.sim.n_players_list = [2]
        cfg.sim.score_thresholds = [300]
        cfg.sim.dice_thresholds = [2]
        cfg.sim.smart_one_opts = [False]
        cfg.sim.run_up_score_opts = [False]
        cfg.sim.shuffles_per_device_batch = 4
        cfg.sim.row_dir = "rows"
        cfg.screening.resolution_delta = 0.9
        cfg.batching.target_batches = 4
        cfg.batching.min_shuffles_per_batch = 2
        cfg.tpu.aot_cache = False
        cfg.tpu.mesh_devices = 1  # group dispatch engages only off the mesh
        cfg.tpu.blocks_per_dispatch = m
        cfg = C.assign_config_sha(cfg)
        R.run_simulation(cfg, progress=lambda msg: None)
        frames[m] = _all_rows_frame(cfg, 2)
        frames[f"ckpt{m}"] = pq.read_table(cfg.checkpoint_path(2))
    assert len(frames[1]) == 8 * 12  # 4 batches x 2 shuffles x 12 games
    assert frames[1].equals(frames[2]), "grouped rows dispatch changed rows"
    assert frames["ckpt1"].equals(frames["ckpt2"])


@pytest.mark.slow  # >15 s compile-heavy; ci-full still runs it
def test_block_group_dispatch_bit_identical(tmp_path):
    """blocks_per_dispatch>1 groups whole blocks into one device batch; the
    per-block artifacts and final summary must be bit-identical to the
    per-block dispatch path (coordinate-addressed RNG + per-block exact
    aggregation)."""
    import pyarrow.parquet as pq

    outs = {}
    for m, sub in ((1, "single"), (2, "grouped")):
        cfg = C.AppConfig()
        cfg.data_dir = str(tmp_path / sub)
        cfg.sim.seed = 23
        cfg.sim.n_players_list = [2]
        cfg.sim.score_thresholds = [300]
        cfg.sim.dice_thresholds = [2]
        cfg.sim.smart_one_opts = [False]
        cfg.sim.run_up_score_opts = [False]
        cfg.sim.shuffles_per_device_batch = 4
        cfg.screening.resolution_delta = 0.9
        cfg.batching.target_batches = 4
        cfg.batching.min_shuffles_per_batch = 2
        cfg.tpu.aot_cache = False
        cfg.tpu.mesh_devices = 1  # group dispatch engages only off the mesh
        cfg.tpu.blocks_per_dispatch = m
        cfg = C.assign_config_sha(cfg)
        R.run_simulation(cfg, progress=lambda msg: None)
        outs[m] = pq.read_table(cfg.checkpoint_path(2)).to_pandas()
        # per-block artifacts exist for every batch in both modes
        blocks = sorted((cfg.n_players_dir(2) / "blocks").glob("block_*.npz"))
        assert len(blocks) == 4, blocks
    lhs, rhs = outs[1], outs[2]
    assert (lhs == rhs).all().all(), "grouped dispatch changed results"


@pytest.mark.slow  # >30 s multi-cell runs; ci-full still runs it
def test_compact_group_resume_and_replay(tmp_path):
    """Compact-fetch group artifacts: a finished cell resumes fully from
    counts-only blocks + group metrics; deleting one group's metrics
    artifact replays exactly that group and reproduces identical outputs."""
    import pyarrow.parquet as pq

    def make(sub):
        cfg = C.AppConfig()
        cfg.data_dir = str(tmp_path / sub)
        cfg.sim.seed = 29
        cfg.sim.n_players_list = [2]
        cfg.sim.expanded_metrics = True
        cfg.sim.score_thresholds = [300]
        cfg.sim.dice_thresholds = [2]
        cfg.sim.smart_one_opts = [False]
        cfg.sim.run_up_score_opts = [False]
        cfg.sim.shuffles_per_device_batch = 2
        cfg.screening.resolution_delta = 0.9
        cfg.batching.target_batches = 4
        cfg.batching.min_shuffles_per_batch = 2
        cfg.tpu.aot_cache = False
        cfg.tpu.mesh_devices = 1
        cfg.tpu.blocks_per_dispatch = 2
        return C.assign_config_sha(cfg)

    cfg = make("run")
    R.run_simulation(cfg, progress=lambda m: None)
    first = pq.read_table(cfg.metrics_path(2)).to_pandas()
    blocks_dir = cfg.n_players_dir(2) / "blocks"
    groups = sorted(blocks_dir.glob("group_*_metrics.npz"))
    assert len(groups) == 2, groups  # 4 batches in 2 compact groups
    # blocks are counts-only (metrics live in the group artifacts)
    from farkle_ii_tpu.simulation.runner import load_block_aggregate

    with pytest.raises(ValueError, match="counts-only"):
        load_block_aggregate(blocks_dir / "block_000000.npz")

    # full resume: drop the stamp, keep all artifacts -> identical metrics
    (cfg.results_root / "simulation.done.json").unlink()
    R.run_simulation(cfg, progress=lambda m: None)
    second = pq.read_table(cfg.metrics_path(2)).to_pandas()
    assert first.equals(second)

    # partial resume: drop one group's metrics artifact -> that group
    # replays; outputs still identical
    (cfg.results_root / "simulation.done.json").unlink()
    groups[0].unlink()
    groups[0].with_name(groups[0].name + ".sidecar.json").unlink()
    R.run_simulation(cfg, progress=lambda m: None)
    third = pq.read_table(cfg.metrics_path(2)).to_pandas()
    assert first.equals(third)
    ckpt = pq.read_table(cfg.checkpoint_path(2)).to_pandas()
    assert ckpt["attempted_exposures"].sum() > 0


@pytest.mark.slow  # ~17 s of compiles; ci-full still runs it
def test_prewarm_keys_match_cell_keys(tmp_path, monkeypatch):
    """The prewarm thread must request exactly the executables the cells
    later use: record every cached_compile extra_key from a prewarmed run
    and assert the prewarm set is a subset of the run's own compile keys
    (a drift here silently turns prewarm into dead weight)."""
    import threading

    from farkle_ii_tpu.utils import aot_cache

    seen: dict[str, list[str]] = {"prewarm": [], "cell": []}
    real = aot_cache.cached_compile

    def recording(fn, *args, extra_key="", **kwargs):
        bucket = (
            "prewarm"
            if threading.current_thread().name == "cell-prewarm"
            else "cell"
        )
        seen[bucket].append(extra_key)
        return real(fn, *args, extra_key=extra_key, **kwargs)

    monkeypatch.setattr(aot_cache, "cached_compile", recording)
    # runner imports cached_compile lazily inside functions, so patching the
    # module attribute is sufficient
    cfg = C.AppConfig()
    cfg.data_dir = str(tmp_path)
    cfg.sim.seed = 31
    cfg.sim.n_players_list = [2, 3]  # prewarm skips the first cell
    cfg.sim.score_thresholds = [300]
    cfg.sim.dice_thresholds = [2]
    cfg.sim.smart_one_opts = [False]
    cfg.sim.run_up_score_opts = [False]
    cfg.sim.shuffles_per_device_batch = 2
    cfg.screening.resolution_delta = 0.9
    cfg.batching.target_batches = 2
    cfg.batching.min_shuffles_per_batch = 2
    cfg.tpu.aot_cache = True
    cfg.tpu.prewarm_executables = True
    cfg.tpu.mesh_devices = 1
    cfg.tpu.blocks_per_dispatch = 2
    C.assign_config_sha(cfg)
    # single-device requirement: prewarm no-ops on the 8-device test mesh,
    # so drive the key-producing pieces directly instead of run_simulation
    from farkle_ii_tpu.simulation.runner import prewarm_cell_executables
    from farkle_ii_tpu.simulation.runner import resolve_strategies

    strategies = resolve_strategies(cfg)
    import types

    fake_dev = types.SimpleNamespace(platform="cpu", device_kind="virtual")
    monkeypatch.setattr(
        "jax.devices", lambda *a, **k: [fake_dev]
    )  # pretend single-device so prewarm proceeds
    prewarm_cell_executables(cfg, strategies)
    for t in threading.enumerate():
        if t.name == "cell-prewarm":
            t.join(timeout=120)
    assert seen["prewarm"], "prewarm issued no compiles"
    # the chunk program and the compact group program were both requested
    assert any(key.startswith("tournament-") for key in seen["prewarm"])
    assert any(key.startswith("cblk") for key in seen["prewarm"]), seen["prewarm"]


@pytest.mark.slow  # >30 s multi-cell runs; ci-full still runs it
def test_concurrent_cells_bit_identical(tmp_path):
    """sim.cell_concurrency=2 overlaps per-cell fixed costs on threads; the
    published checkpoint and metrics artifacts must equal the sequential
    run's exactly."""
    import pyarrow.parquet as pq

    outs = {}
    for conc in (1, 2):
        cfg = C.AppConfig()
        cfg.data_dir = str(tmp_path / f"c{conc}")
        cfg.sim.seed = 34
        cfg.sim.n_players_list = [2, 3]
        cfg.sim.score_thresholds = [300]
        cfg.sim.dice_thresholds = [2]
        cfg.sim.smart_one_opts = [False]
        cfg.sim.run_up_score_opts = [False]
        cfg.sim.shuffles_per_device_batch = 2
        cfg.sim.cell_concurrency = conc
        cfg.sim.expanded_metrics = True
        cfg.screening.resolution_delta = 0.8
        cfg.batching.target_batches = 3
        cfg.batching.min_shuffles_per_batch = 2
        cfg.tpu.aot_cache = False
        cfg.tpu.mesh_devices = 1
        cfg.tpu.blocks_per_dispatch = 2
        C.assign_config_sha(cfg)
        R.run_simulation(cfg, progress=lambda m: None)
        outs[conc] = {
            k: (
                pq.read_table(cfg.checkpoint_path(k)).to_pandas(),
                pq.read_table(cfg.metrics_path(k)).to_pandas(),
            )
            for k in (2, 3)
        }
    for k in (2, 3):
        for i in range(2):
            assert outs[1][k][i].equals(outs[2][k][i]), (k, i)


def test_simulation_golden_values_k3_h2h_coords(tmp_path, golden):
    """Second golden cell: k=3 at a different root, plus pinned H2H window
    sums at fixed coordinates — together with the k=2 golden this pins both
    the tournament and head-to-head statistical engines bit-exactly."""
    import pyarrow.parquet as pq

    cfg = C.AppConfig()
    cfg.data_dir = str(tmp_path)
    cfg.sim.seed = 47
    cfg.sim.n_players_list = [3]
    cfg.sim.expanded_metrics = True
    cfg.sim.score_thresholds = [300]
    cfg.sim.dice_thresholds = [2]
    cfg.sim.smart_one_opts = [False]
    cfg.sim.run_up_score_opts = [False]
    cfg.sim.shuffles_per_device_batch = 3
    cfg.screening.resolution_delta = 0.85
    cfg.batching.target_batches = 3
    cfg.batching.min_shuffles_per_batch = 2
    cfg.tpu.aot_cache = False
    C.assign_config_sha(cfg)
    R.run_simulation(cfg, progress=lambda m: None)
    t = pq.read_table(cfg.checkpoint_path(3)).to_pandas().sort_values("strategy_id")
    m = pq.read_table(cfg.metrics_path(3)).to_pandas().sort_values("strategy_id")

    # H2H window sums at fixed (pair, order, attempt-range) coordinates
    import jax.numpy as jnp
    import numpy as np

    from farkle_ii_tpu.analysis.h2h_schedule import _h2h_window_step

    step = _h2h_window_step(nb=2, window=64, root_seed=47, use_aot=False)
    out = np.asarray(
        step(
            jnp.asarray([0, 1], dtype=jnp.uint32),
            jnp.asarray([0, 1], dtype=jnp.uint32),
            jnp.arange(64, dtype=jnp.uint32),
            jnp.asarray([300, 250], dtype=jnp.int32),
            jnp.asarray([2, 2], dtype=jnp.int32),
            jnp.asarray([5, 13], dtype=jnp.int32),
            jnp.asarray([250, 300], dtype=jnp.int32),
            jnp.asarray([2, 2], dtype=jnp.int32),
            jnp.asarray([13, 5], dtype=jnp.int32),
            jnp.zeros(2, dtype=jnp.int32),
            jnp.full((2,), 128, dtype=jnp.int32),
        )
    )
    golden("simulation_seed47_k3", {
        "wins": t["wins"].astype(int).tolist(),
        "attempted_exposures": t["attempted_exposures"].astype(int).tolist(),
        "safety_limit_exposures": t["safety_limit_exposures"].astype(int).tolist(),
        "winning_score_sum": m["winning_score_sum"].astype(int).tolist(),
        "h2h_window_counts": out.astype(int).tolist(),
    })


@pytest.mark.slow  # ~12 s; the k=2/k=3 goldens gate the fast suite
def test_simulation_golden_values_k8(tmp_path, golden):
    """Third golden cell: k=8 — the seat-count regime where the kernel is
    weakest (widest carry, deepest select chains) and where production
    routes to the pallas kernel on TPU. On CPU this runs the XLA kernel;
    the impl race asserts the two are bit-identical on device, so one
    golden pins both."""
    import pyarrow.parquet as pq

    cfg = C.AppConfig()
    cfg.data_dir = str(tmp_path)
    cfg.sim.seed = 83
    cfg.sim.n_players_list = [8]
    cfg.sim.expanded_metrics = True
    cfg.sim.score_thresholds = [300, 350]
    cfg.sim.dice_thresholds = [2]
    cfg.sim.smart_one_opts = [False]
    cfg.sim.run_up_score_opts = [False]
    cfg.sim.shuffles_per_device_batch = 2
    cfg.screening.resolution_delta = 0.9
    cfg.batching.target_batches = 2
    cfg.batching.min_shuffles_per_batch = 2
    cfg.tpu.aot_cache = False
    C.assign_config_sha(cfg)
    R.run_simulation(cfg, progress=lambda m: None)
    t = pq.read_table(cfg.checkpoint_path(8)).to_pandas().sort_values("strategy_id")
    m = pq.read_table(cfg.metrics_path(8)).to_pandas().sort_values("strategy_id")
    golden("simulation_seed83_k8", {
        "wins": t["wins"].astype(int).tolist(),
        "attempted_exposures": t["attempted_exposures"].astype(int).tolist(),
        "safety_limit_exposures": t["safety_limit_exposures"].astype(int).tolist(),
        "winning_score_sum": m["winning_score_sum"].astype(int).tolist(),
        "winning_score_sq_sum": m["winning_score_sq_sum"].astype(int).tolist(),
        "n_rounds_sum": m["n_rounds_sum"].astype(int).tolist(),
    })
