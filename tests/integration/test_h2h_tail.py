"""Full H2H tail: freeze -> power -> execute -> inference -> dominance ->
agreement -> reporting, driven end-to-end on real simulated data.

This is the analogue of the reference's structural toy oracle
(tests/integration/test_structure_toy_oracle.py): it asserts artifact
structure, statistical invariants, and interruption/resume behavior.
"""

import json

import numpy as np
import pyarrow.parquet as pq
import pytest

from farkle_ii_tpu import config as C
from farkle_ii_tpu.analysis import candidate_family as fam
from farkle_ii_tpu.analysis import combine as combine_mod
from farkle_ii_tpu.analysis import curate as curate_mod
from farkle_ii_tpu.analysis import dominance as dom
from farkle_ii_tpu.analysis import h2h_inference as inf
from farkle_ii_tpu.analysis import h2h_schedule as sched
from farkle_ii_tpu.analysis import ingest as ingest_mod
from farkle_ii_tpu.analysis import metrics as metrics_mod
from farkle_ii_tpu.analysis import run_trueskill as ts
from farkle_ii_tpu.analysis import structure_agreement as agree
from farkle_ii_tpu.analysis import structure_reporting as report
from farkle_ii_tpu.simulation import runner as R


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("h2h")
    cfg = C.AppConfig()
    cfg.data_dir = str(tmp)
    cfg.sim.seed = 55
    cfg.sim.seed_list = [55]
    cfg.sim.n_players_list = [2]
    cfg.sim.row_dir = "rows"
    cfg.sim.score_thresholds = [250, 300]
    cfg.sim.dice_thresholds = [2]
    cfg.sim.smart_one_opts = [False]
    cfg.sim.run_up_score_opts = [False]
    cfg.sim.shuffles_per_device_batch = 4
    cfg.screening.resolution_delta = 0.9
    cfg.screening.practical_delta_by_k = {2: 0.05}
    cfg.screening.bootstrap_replicates = 10
    cfg.screening.candidate_contribution_size = 2  # tiny family
    cfg.batching.target_batches = 2
    cfg.batching.min_shuffles_per_batch = 2
    cfg.head2head.family_alpha = 0.05
    cfg.head2head.target_power = 0.5  # keep planned blocks small
    cfg.head2head.practical_delta = 0.2
    cfg.head2head.seat1_advantage_scenarios = [0.0, 0.05]
    cfg.head2head.max_attempt_multiplier = 1.5
    cfg.tpu.aot_cache = False
    C.assign_config_sha(cfg)
    R.run_simulation(cfg, progress=lambda m: None)
    ingest_mod.run(cfg)
    curate_mod.run(cfg)
    combine_mod.run(cfg)
    metrics_mod.run(cfg)
    ts.run(cfg)
    fam.run(cfg)
    sched.run_power(cfg)
    sched.run_execute(cfg)
    inf.run(cfg)
    dom.run(cfg)
    agree.run(cfg)
    report.run(cfg)
    return cfg


def test_family_freeze(cfg):
    manifest = json.loads(fam.family_manifest_path(cfg).read_text())
    assert manifest["candidate_count"] >= 2
    assert len(manifest["family_hash"]) == 64
    membership = pq.read_table(fam.family_membership_path(cfg)).to_pandas()
    selected = sorted(
        membership.loc[membership["final_family"], "strategy"].astype(int)
    )
    assert selected == sorted(manifest["candidates"])


def test_power_plan_and_schedule(cfg):
    plan = json.loads(sched.power_plan_path(cfg).read_text())
    assert plan["execution_authorization"] == "ready"
    assert plan["worst_scenario_achieved_power"] >= cfg.head2head.target_power
    n = plan["candidate_count"]
    assert plan["unordered_pair_count"] == n * (n - 1) // 2
    schedule = pq.read_table(sched.schedule_path(cfg)).to_pandas()
    # one block per (pair, root, order)
    assert len(schedule) == plan["unordered_pair_count"] * 1 * 2
    assert schedule["block_id"].is_unique
    grid = pq.read_table(sched.power_grid_path(cfg)).to_pandas()
    assert (grid["achieved_power"].between(0, 1)).all()


def test_execution_counts(cfg):
    plan = json.loads(sched.power_plan_path(cfg).read_text())
    counts = pq.read_table(sched.order_counts_path(cfg)).to_pandas()
    required = plan["n_completed_required_per_root_order_block"]
    complete = counts["completion_status"] == "complete"
    # all blocks complete (no safety-limit games at this scale)
    assert complete.all()
    assert (counts.loc[complete, "games_completed"] == required).all()
    assert (counts["wins_seat1"] + counts["wins_seat2"] == counts["games_completed"]).all()
    # wins_a/wins_b orientation mapping
    fwd = counts[counts["order"] == 0]
    assert (fwd["wins_a"] == fwd["wins_seat1"]).all()
    rev = counts[counts["order"] == 1]
    assert (rev["wins_a"] == rev["wins_seat2"]).all()


def test_execution_determinism_and_resume(cfg):
    before = pq.read_table(sched.order_counts_path(cfg)).to_pandas()
    # force a full re-execution: results must be identical (coordinates only)
    after = sched.execute_h2h_schedule(cfg, force=True)
    for col in ("games_completed", "wins_seat1", "games_attempted"):
        np.testing.assert_array_equal(
            before[col].to_numpy(), after[col].to_numpy()
        )
    # resume path: state file exists, re-running without force is a no-op
    again = sched.execute_h2h_schedule(cfg)
    np.testing.assert_array_equal(
        again["wins_seat1"].to_numpy(), before["wins_seat1"].to_numpy()
    )


def test_inference_frame(cfg):
    frame = pq.read_table(inf.inference_path(cfg)).to_pandas()
    plan = json.loads(sched.power_plan_path(cfg).read_text())
    assert len(frame) == plan["unordered_pair_count"]
    viable = frame["formal_test_performed"]
    assert viable.all()
    # d_ab = (q_ab - q_ba) / 2 and intervals bracket the estimate
    np.testing.assert_allclose(
        frame["d_ab"], 0.5 * (frame["q_ab"] - frame["q_ba"]), atol=1e-12
    )
    assert (frame["simultaneous_d_low"] <= frame["d_ab"] + 1e-12).all()
    assert (frame["simultaneous_d_high"] >= frame["d_ab"] - 1e-12).all()
    # simultaneous bounds are wider than ordinary bounds
    assert (
        frame["simultaneous_d_high"] - frame["simultaneous_d_low"]
        >= frame["ordinary_d_high"] - frame["ordinary_d_low"] - 1e-12
    ).all()
    assert (frame["holm_adjusted_p"] >= frame["score_p_value"] - 1e-12).all()
    assert set(frame["decision_class"]) <= {
        "practical_dominance_a", "practical_dominance_b",
        "statistical_only_advantage_a", "statistical_only_advantage_b",
        "equivalent", "unresolved", "unresolved_nonviable",
    }


def test_dominance_and_reports(cfg):
    structure = json.loads(dom.structure_path(cfg).read_text())
    assert "practical" in structure and "statistical" in structure
    assert isinstance(structure["practical"]["fronts"], list)
    summary = json.loads(agree.summary_path(cfg).read_text())
    assert summary["pair_count"] >= 1
    report_payload = json.loads(report.report_json_path(cfg).read_text())
    assert report_payload["pair_count"] == summary["pair_count"]
    assert len(report_payload["claims"]) == report_payload["pair_count"]
    md = report.report_markdown_path(cfg).read_text()
    assert "structure report" in md
    assert "Interpretation limits" in md


def test_score_test_math():
    # symmetric counts -> zero statistic, p = 1
    r = inf.two_proportion_score_test(10, 20, 10, 20)
    assert r.statistic == 0.0 and r.p_value == 1.0
    # strong asymmetry -> small p
    r = inf.two_proportion_score_test(19, 20, 5, 20)
    assert r.p_value < 0.001
    # interval covers the observed difference, symmetric for mirrored counts
    lo, hi = inf.score_difference_interval(15, 20, 5, 20, alpha=0.05)
    assert lo < 0.5 < hi
    lo2, hi2 = inf.score_difference_interval(5, 20, 15, 20, alpha=0.05)
    assert lo2 == pytest.approx(-hi) and hi2 == pytest.approx(-lo)
    # boundary outcomes don't crash
    lo3, hi3 = inf.score_difference_interval(20, 20, 0, 20, alpha=0.05)
    assert 0 < lo3 < hi3 == 1.0


def test_holm_monotone():
    p = np.array([0.001, 0.02, 0.04, 0.5])
    adjusted, positions = inf.holm_adjust(p)
    assert (np.diff(adjusted[np.argsort(p)]) >= -1e-15).all()
    assert adjusted[0] == pytest.approx(0.004)
    assert list(positions) == [1, 2, 3, 4]


def test_power_math_properties():
    # power increases with sample size and effect
    p1 = sched.implemented_score_test_power(50, 0.6, 0.4, 0.05)
    p2 = sched.implemented_score_test_power(200, 0.6, 0.4, 0.05)
    assert p2 > p1
    p3 = sched.implemented_score_test_power(50, 0.7, 0.3, 0.05)
    assert p3 > p1
    # null scenario: power ~ alpha (size control)
    size = sched.implemented_score_test_power(200, 0.5, 0.5, 0.05)
    assert size <= 0.055
    # minimum block games satisfies target with exact power
    b = sched.minimum_block_games(
        root_count=1, effect=0.1, scenarios=(0.0,), alpha_per_pair=0.05,
        target_power=0.8,
    )
    assert (
        sched.implemented_score_test_power(b, 0.6, 0.4, 0.05) >= 0.8
    )
    assert sched.implemented_score_test_power(b - 1, 0.6, 0.4, 0.05) < 0.8 or b == 1


def test_injected_interruption_resume_identical(cfg):
    """Toy-oracle interruption: wipe half the execution state mid-'crash',
    delete the stage stamp, re-run -> bit-identical final order counts
    (reference test_structure_toy_oracle.py injected-interruption analogue).
    """
    baseline = pq.read_table(sched.order_counts_path(cfg)).to_pandas()

    # simulate a crash after only the first half of the blocks checkpointed
    state = json.loads(sched.execution_state_path(cfg).read_text())
    block_ids = sorted(state["blocks"])
    kept = {bid: state["blocks"][bid] for bid in block_ids[: len(block_ids) // 2]}
    state["blocks"] = kept
    sched.execution_state_path(cfg).write_text(json.dumps(state))
    stamp = cfg.h2h_dir() / "h2h_execute.done.json"
    stamp.unlink()
    sched.order_counts_path(cfg).unlink()

    resumed = sched.execute_h2h_schedule(cfg)
    for col in ("games_completed", "wins_seat1", "games_attempted", "games_safety_limit"):
        np.testing.assert_array_equal(
            resumed[col].to_numpy(), baseline[col].to_numpy(),
            err_msg=f"column {col} diverged after injected interruption",
        )


def test_reporting_republishes_after_tamper(cfg):
    """Deleting a final deliverable demotes the stamp; re-run re-publishes
    and the v3 authenticated completion re-validates."""
    from farkle_ii_tpu.utils import authenticated_contract as ac

    report_json = report.report_json_path(cfg)
    payload_before = json.loads(report_json.read_text())
    report_json.unlink()
    report.run(cfg)  # stamp resolves stale -> stage reruns
    payload_after = json.loads(report_json.read_text())
    assert payload_after == payload_before
    ac.validate_authenticated_artifact(report_json)
