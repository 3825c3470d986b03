"""Fast smoke coverage for root_stability, h2h_digest and the two-seed
pipeline helpers (VERDICT r3 #7: these modules were exercised only by
slow-marked integration tests, so `make ci` could silently break them).

Synthetic sidecar'd artifacts drive the real stage entry points directly —
no simulation, no device, sub-second.
"""

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from farkle_ii_tpu import config as C
from farkle_ii_tpu.utils.artifacts import write_parquet_artifact_atomic
from farkle_ii_tpu.utils.writer import write_json_atomic


def _cfg(tmp_path, sub, seed):
    cfg = C.AppConfig()
    cfg.data_dir = str(tmp_path / sub)
    cfg.sim.seed = seed
    cfg.sim.n_players_list = [2]
    cfg.screening.bootstrap_replicates = 8
    cfg.screening.candidate_contribution_size = 2
    return C.assign_config_sha(cfg)


def _write_root_artifacts(cfg, shift: float) -> None:
    """Across-k performance + per-k batch metrics for one synthetic root."""
    strategies = np.arange(4)
    scores = np.array([0.08, 0.04, 0.01, -0.02]) + shift
    across = pd.DataFrame(
        {
            "root_seed": cfg.sim.seed,
            "strategy": strategies,
            "complete_support": True,
            "equal_k_score": scores,
            "equal_k_mcse": 0.01,
            "raw_attempted_exposures": 1000,
        }
    )
    cfg.performance_across_k_path().parent.mkdir(parents=True, exist_ok=True)
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(across, preserve_index=False),
        cfg.performance_across_k_path(),
        producer="performance", scope="concat_ks",
    )
    n_batches = 4
    rng = np.random.default_rng(cfg.sim.seed)
    rows = []
    for b in range(n_batches):
        for i, s in enumerate(strategies):
            exp = 250
            wins = int(exp * (0.5 + scores[i]) + rng.integers(-5, 6))
            rows.append(
                {
                    "deterministic_batch_id": b,
                    "strategy": int(s),
                    "raw_wins": wins,
                    "raw_player_game_exposures": exp,
                }
            )
    frame = pd.DataFrame(rows)
    cfg.batch_metrics_path(2).parent.mkdir(parents=True, exist_ok=True)
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(frame, preserve_index=False),
        cfg.batch_metrics_path(2),
        producer="metrics", scope="by_k",
    )


def test_root_stability_synthetic(tmp_path):
    from farkle_ii_tpu.analysis.root_stability import (
        build_two_root_stability,
        stability_path,
        summary_path,
    )

    cfg_a = _cfg(tmp_path, "a", 71)
    cfg_b = _cfg(tmp_path, "b", 72)
    pair = _cfg(tmp_path, "pair", 71)
    _write_root_artifacts(cfg_a, shift=0.0)
    _write_root_artifacts(cfg_b, shift=0.005)

    summary = build_two_root_stability(pair, cfg_a, cfg_b)
    assert summary["common_strategy_count"] == 4
    assert summary["observed_max_abs_discrepancy"] == pytest.approx(0.005, abs=1e-9)
    # the 0.005 shift is inside the 0.03 stability delta
    assert summary["fraction_exceeding_stability_delta"] == 0.0
    assert summary["spearman_rank_correlation"] == pytest.approx(1.0)
    assert summary["rank_movement_max"] == 0.0
    assert summary["bootstrap_replicates"] == 8
    assert len(summary["matched_count_convergence"]) == 4
    assert summary["half_drift_root_a"] >= 0.0

    frame = pd.read_parquet(stability_path(pair))
    assert len(frame) == 4
    assert not frame["exceeds_stability_delta"].any()
    assert (frame["bootstrap_top_n_inclusion_a"] <= 1.0).all()

    # second call hits the COMPLETE_VALID fast path and returns the summary
    again = build_two_root_stability(pair, cfg_a, cfg_b)
    assert again == json.loads(summary_path(pair).read_text())


def test_root_stability_requires_common_support(tmp_path):
    from farkle_ii_tpu.analysis.root_stability import build_two_root_stability

    cfg_a = _cfg(tmp_path, "a", 71)
    cfg_b = _cfg(tmp_path, "b", 72)
    pair = _cfg(tmp_path, "pair", 71)
    _write_root_artifacts(cfg_a, shift=0.0)
    # root B publishes a disjoint strategy set
    across = pd.DataFrame(
        {
            "root_seed": 72, "strategy": [100], "complete_support": True,
            "equal_k_score": [0.0], "equal_k_mcse": [0.01],
            "raw_attempted_exposures": [10],
        }
    )
    cfg_b.performance_across_k_path().parent.mkdir(parents=True, exist_ok=True)
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(across, preserve_index=False),
        cfg_b.performance_across_k_path(),
        producer="performance", scope="concat_ks",
    )
    with pytest.raises(ValueError, match="common strategies"):
        build_two_root_stability(pair, cfg_a, cfg_b)


def test_h2h_digest_synthetic(tmp_path):
    from farkle_ii_tpu.analysis import h2h_digest
    from farkle_ii_tpu.analysis.h2h_inference import inference_path
    from farkle_ii_tpu.analysis.h2h_schedule import (
        order_counts_path,
        power_plan_path,
    )

    cfg = _cfg(tmp_path, "root", 71)
    cfg.h2h_dir().mkdir(parents=True, exist_ok=True)
    write_json_atomic(
        power_plan_path(cfg),
        {
            "family_hash": "f" * 16,
            "schedule_hash": "s" * 16,
            "root_seeds": [71],
            "candidate_count": 3,
            "unordered_pair_count": 3,
            "alpha_per_pair": 0.05 / 3,
            "worst_scenario_achieved_power": 0.83,
        },
    )
    counts = pd.DataFrame(
        {
            "block_id": ["b0", "b1", "b2"],
            "games_attempted": [100, 100, 60],
            "games_completed": [99, 100, 58],
            "games_safety_limit": [1, 0, 2],
            "completion_status": ["complete", "complete", "underpowered"],
        }
    )
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(counts, preserve_index=False),
        order_counts_path(cfg), producer="h2h_schedule", scope="h2h_2p",
    )
    inference = pd.DataFrame(
        {
            "pair_id": [0, 1, 2],
            "pair_claim_eligible": [True, True, False],
            "decision_class": ["superior", "inconclusive", "not_claim_eligible"],
            "holm_reject": [True, False, False],
            "games_completed": [199, 158, 40],
        }
    )
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(inference, preserve_index=False),
        inference_path(cfg), producer="h2h_inference", scope="h2h_2p",
    )

    digest = h2h_digest.run(cfg)
    assert digest["pair_count"] == 3
    assert digest["execution"]["games_attempted"] == 260
    assert digest["execution"]["unresolved_blocks"] == 1
    assert digest["decisions"]["superior"] == 1
    assert digest["holm_rejections"] == 1
    assert digest["claim_ineligible_pairs"] == [2]
    assert h2h_digest.digest_path(cfg).exists()
    # idempotent second call returns the stored digest
    assert h2h_digest.run(cfg) == digest


def test_two_seed_helpers_synthetic(tmp_path):
    from farkle_ii_tpu.orchestration.two_seed_pipeline import (
        _combine_pair_contributions,
        _root_lifecycle_identity,
    )

    cfg_a = _cfg(tmp_path, "a", 71)
    cfg_b = _cfg(tmp_path, "b", 72)
    pair = _cfg(tmp_path, "pair", 71)
    _write_root_artifacts(cfg_a, shift=0.0)
    _write_root_artifacts(cfg_b, shift=0.01)
    manifest = pa.table({"strategy": [0, 1, 2, 3], "strategy_str": ["a", "b", "c", "d"]})
    for cfg in (cfg_a,):
        cfg.strategy_manifest_path().parent.mkdir(parents=True, exist_ok=True)
        write_parquet_artifact_atomic(
            manifest, cfg.strategy_manifest_path(), producer="simulation",
        )

    pair.performance_across_k_path().parent.mkdir(parents=True, exist_ok=True)
    _combine_pair_contributions(pair, cfg_a, cfg_b)
    combined = pd.read_parquet(pair.performance_across_k_path())
    assert len(combined) == 4
    # equal-k mean of the two roots; mcse pooled as rms/2; exposures summed
    assert combined["equal_k_score"].iloc[0] == pytest.approx(0.085)
    assert combined["equal_k_mcse"].iloc[0] == pytest.approx(
        (0.01**2 + 0.01**2) ** 0.5 / 2
    )
    assert (combined["raw_attempted_exposures"] == 2000).all()
    assert pd.read_parquet(pair.strategy_manifest_path()).equals(
        manifest.to_pandas()
    )

    # lifecycle identity: deterministic over stamp bytes, sensitive to content
    root = cfg_a.results_root
    root.mkdir(parents=True, exist_ok=True)
    (root / "x.done.json").write_text("{}")
    first = _root_lifecycle_identity(cfg_a)
    assert first == _root_lifecycle_identity(cfg_a)
    (root / "x.done.json").write_text('{"changed": 1}')
    assert _root_lifecycle_identity(cfg_a) != first


def test_partial_raw_sums_fast_path_equals_groupby():
    """The single-batch bincount fast path must reproduce the pandas
    groupby aggregation exactly — values, dtypes, column order."""
    import pandas as pd

    from farkle_ii_tpu.analysis import all_player_metrics as apm

    rng = np.random.default_rng(5)
    n = 600
    k = 3
    completed = rng.random(n) >= 0.02
    df = pd.DataFrame(
        {
            "outcome_schema_version": apm.OUTCOME_SCHEMA_VERSION,
            "root_seed": 7,
            "k": k,
            "deterministic_batch_id": 4,
            "termination_status": np.where(
                completed, "completed", "safety_limit"
            ),
            "winner_seat": np.where(
                completed,
                np.char.add("P", rng.integers(1, k + 1, n).astype(str)),
                None,
            ),
            "n_rounds": rng.integers(5, 40, n),
        }
    )
    for i in range(1, k + 1):
        df[f"P{i}_strategy"] = rng.integers(0, 12, n)
        df[f"P{i}_score"] = rng.integers(0, 12000, n)
        df[f"P{i}_rank"] = np.where(completed, rng.integers(1, k + 1, n), np.nan)
        df[f"P{i}_loss_margin"] = np.where(completed, rng.integers(0, 9000, n), np.nan)
        df[f"P{i}_n_turns"] = rng.integers(5, 41, n)
        df[f"P{i}_hit_max_rounds"] = ~completed
        df[f"P{i}_farkles"] = rng.integers(0, 10, n)
        df[f"P{i}_rolls"] = rng.integers(10, 90, n)
        df[f"P{i}_highest_turn"] = rng.integers(0, 3000, n)
        df[f"P{i}_smart_five_uses"] = rng.integers(0, 9, n)
        df[f"P{i}_n_smart_five_dice"] = rng.integers(0, 14, n)
        df[f"P{i}_smart_one_uses"] = rng.integers(0, 9, n)
        df[f"P{i}_n_smart_one_dice"] = rng.integers(0, 14, n)
        df[f"P{i}_hot_dice"] = rng.integers(0, 6, n)

    long = apm.melt_rows_to_exposures(df, k)
    fast = apm._partial_raw_sums_fast(long)
    # force the groupby path by pretending the batch key varies
    slow = apm.partial_raw_sums(
        pd.concat(
            [df, df.assign(deterministic_batch_id=5)], ignore_index=True
        ),
        k,
    )
    slow4 = slow[slow["deterministic_batch_id"] == 4].reset_index(drop=True)
    assert list(fast.columns) == list(slow4.columns)
    for col in fast.columns:
        a, b = fast[col].to_numpy(), slow4[col].to_numpy()
        if fast[col].dtype == np.float64:
            # summation ORDER differs (bincount vs pandas pairwise), so
            # float columns agree to the last ulp, not bitwise — the same
            # inherent sensitivity float partials already have to shard
            # boundaries; integer columns must be exact
            np.testing.assert_allclose(a, b, rtol=1e-12, err_msg=col)
        else:
            np.testing.assert_array_equal(a, b, err_msg=col)
        assert fast[col].dtype == slow4[col].dtype, (
            col, fast[col].dtype, slow4[col].dtype
        )


def test_behavior_square_sums_do_not_overflow_int32():
    """Regression: int32 row columns (e.g. highest_turn) made the groupby
    square sums wrap negative past 2^31; sums must be float64 and exact."""
    import pandas as pd

    from farkle_ii_tpu.analysis import all_player_metrics as apm

    n = 3
    df = pd.DataFrame(
        {
            "outcome_schema_version": apm.OUTCOME_SCHEMA_VERSION,
            "root_seed": 1, "k": 1, "deterministic_batch_id": 0,
            "termination_status": "completed",
            "winner_seat": "P1",
            "n_rounds": 10,
            "P1_strategy": 0,
            "P1_score": 10_000,
            "P1_rank": 1,
            "P1_loss_margin": 0,
            "P1_n_turns": 10,
            "P1_hit_max_rounds": False,
            "P1_farkles": 1,
            "P1_rolls": 30,
            # int32 column whose squares exceed 2^31 when summed
            "P1_highest_turn": pd.array([50_000] * n, dtype="int32"),
            "P1_smart_five_uses": 0,
            "P1_n_smart_five_dice": 0,
            "P1_smart_one_uses": 0,
            "P1_n_smart_one_dice": 0,
            "P1_hot_dice": 0,
        }
    )
    out = apm.partial_raw_sums(df, 1)
    expected = float(n) * 50_000.0**2
    assert out["raw_highest_turn_square_sum"].iloc[0] == expected
    # the groupby fallback path must agree
    two = pd.concat([df, df.assign(deterministic_batch_id=1)], ignore_index=True)
    slow = apm.partial_raw_sums(two, 1)
    assert (slow["raw_highest_turn_square_sum"] == expected).all()
