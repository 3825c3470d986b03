"""Workload planner + stats helper tests (math parity with the reference)."""

import pytest

from farkle_ii_tpu.simulation import workload as W
from farkle_ii_tpu.utils import stats


def test_wilson_width_monotone_and_bisection():
    w100 = W.worst_case_wilson_width(100)
    w1000 = W.worst_case_wilson_width(1000)
    assert w1000 < w100
    n = W.minimum_shuffles_for_resolution(0.03, confidence=0.95)
    assert W.worst_case_wilson_width(n) <= 0.03
    assert W.worst_case_wilson_width(n - 1) > 0.03
    # production contract lands near ~4.3k shuffles (SURVEY.md §6)
    assert 4000 < n < 4600


def test_plan_shapes_and_batching():
    plan = W.plan_tournament_workload(
        root_seed=1, k=2, strategy_count=24, resolution_delta=0.03,
        batch_count=100, min_shuffles_per_batch=30,
    )
    assert plan.required_shuffles == plan.batch_count * plan.shuffles_per_batch
    assert plan.required_shuffles >= plan.required_shuffles_unrounded
    assert plan.games_per_shuffle == 12
    assert plan.required_games == plan.required_shuffles * 12
    assert plan.achieved_resolution <= 0.03
    assert not plan.cap_exceeded
    assert plan.status == "not_started"


def test_plan_min_batch_floor():
    plan = W.plan_tournament_workload(
        root_seed=1, k=2, strategy_count=24, resolution_delta=0.5,
        batch_count=10, min_shuffles_per_batch=30,
    )
    assert plan.shuffles_per_batch == 30  # floor dominates tiny requirement


def test_plan_cap():
    plan = W.plan_tournament_workload(
        root_seed=1, k=2, strategy_count=24, resolution_delta=0.03, shuffle_cap=10,
    )
    assert plan.cap_exceeded
    assert plan.status == "blocked_by_cap"
    assert plan.achieved_resolution_at_cap is not None
    with pytest.raises(W.WorkloadCapExceeded, match="max_shuffles_per_root_k"):
        raise W.WorkloadCapExceeded(plan)


def test_plan_validation():
    with pytest.raises(ValueError):
        W.plan_tournament_workload(root_seed=1, k=1, strategy_count=24, resolution_delta=0.03)
    with pytest.raises(ValueError):
        W.plan_tournament_workload(root_seed=1, k=5, strategy_count=24, resolution_delta=0.03)


def test_plan_roundtrip(tmp_path):
    plan = W.plan_tournament_workload(
        root_seed=3, k=4, strategy_count=24, resolution_delta=0.1,
        projected_games_per_second=1e6,
    )
    assert plan.projected_runtime_seconds == plan.required_games / 1e6
    path = tmp_path / "plan.json"
    W.write_workload_plan(path, plan)
    assert W.load_workload_plan(path) == plan


def test_wilson_ci():
    lo, hi = stats.wilson_ci(50, 100)
    assert 0.40 < lo < 0.5 < hi < 0.60
    assert stats.wilson_ci(0, 10)[0] == pytest.approx(0.0, abs=1e-12)
    assert stats.wilson_ci(10, 10)[1] == pytest.approx(1.0, abs=1e-12)
    with pytest.raises(ValueError):
        stats.wilson_ci(5, 0)
    with pytest.raises(ValueError):
        stats.wilson_ci(11, 10)


def test_games_for_power_top1_and_pairwise():
    g_top1 = stats.games_for_power(n_strategies=100, k_players=2, endpoint="top1")
    assert isinstance(g_top1, int) and g_top1 > 0
    details = stats.games_for_power(
        n_strategies=100, k_players=2, endpoint="pairwise", return_details=True
    )
    assert details.m == 99
    assert details.games_per_strategy >= details.m  # pairwise costs much more
    # bonferroni is more conservative than BH
    g_bh = stats.games_for_power(n_strategies=100, method="bh")
    g_bonf = stats.games_for_power(n_strategies=100, method="bonferroni")
    assert g_bonf >= g_bh


def test_games_for_power_floor_cap():
    d = stats.games_for_power(
        n_strategies=10, min_games_floor=10**6, return_details=True
    )
    assert d.applied_floor and d.sizing_source == "floored"
    d = stats.games_for_power(n_strategies=10, max_games_cap=10, return_details=True)
    assert d.applied_cap and d.sizing_source == "capped"
