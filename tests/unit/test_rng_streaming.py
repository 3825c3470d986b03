"""Streaming rng_diagnostics == one-shot global-sort computation.

VERDICT r2 #6: the diagnostics must stream curated rows in bounded memory
with identical level frames. These tests synthesize a curated-rows parquet,
force many small seed buckets, and compare the streamed frames against the
retained one-shot implementation.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from farkle_ii_tpu import config as C
from farkle_ii_tpu.analysis import rng_diagnostics as RD
from farkle_ii_tpu.utils.artifacts import write_parquet_artifact_atomic


def _make_cfg(tmp_path, k, lags=(1, 2, 5), cap=40):
    cfg = C.AppConfig()
    cfg.data_dir = str(tmp_path)
    cfg.sim.seed = 7
    cfg.sim.n_players_list = [k]
    cfg.analysis.rng_lags = list(lags)
    cfg.analysis.rng_max_matchup_groups = cap
    return C.assign_config_sha(cfg)


def _write_rows(cfg, k, n_rows, n_strategies=12, seed=3):
    rng = np.random.default_rng(seed)
    strategies = rng.integers(0, n_strategies, size=(n_rows, k))
    winner = rng.integers(0, k + 1, size=n_rows)  # 0 = safety (no winner)
    cols = {
        "game_seed": rng.integers(0, 2**63, size=n_rows, dtype=np.int64).astype(
            np.uint64
        )
        * np.uint64(2),  # spread over the full range incl. > 2^63
        "winner_seat": pd.array(
            [f"P{w}" if w else None for w in winner], dtype="string"
        ),
        "n_rounds": rng.integers(5, 40, size=n_rows).astype(np.int64),
        "termination_status": pd.array(
            ["completed" if w else "safety_limit" for w in winner], dtype="string"
        ),
    }
    for s in range(1, k + 1):
        cols[f"P{s}_strategy"] = strategies[:, s - 1].astype(np.int64)
    path = cfg.curated_rows_path(k)
    path.parent.mkdir(parents=True, exist_ok=True)
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(pd.DataFrame(cols), preserve_index=False),
        path, producer="curate", scope="by_k",
    )


def _compare(cfg, k):
    streamed = RD.run_for_k(cfg, k)
    oneshot = RD._run_for_k_inmemory(cfg, k)
    assert len(streamed) == len(oneshot)
    key = ["level", "group_key", "metric", "lag"]
    a = streamed.set_index(key).sort_index()
    b = oneshot.set_index(key).sort_index()
    assert list(a.index) == list(b.index)
    assert (a["n_games"] == b["n_games"]).all()
    av = a["autocorrelation"].astype(float).to_numpy()
    bv = b["autocorrelation"].astype(float).to_numpy()
    both = ~np.isnan(av) & ~np.isnan(bv)
    assert (np.isnan(av) == np.isnan(bv)).all()
    np.testing.assert_allclose(av[both], bv[both], rtol=1e-9, atol=1e-12)
    # row ORDER is part of the artifact contract too
    pd.testing.assert_frame_equal(
        streamed[key].reset_index(drop=True), oneshot[key].reset_index(drop=True)
    )


def test_streamed_equals_oneshot_small_buckets(tmp_path, monkeypatch):
    k = 3
    cfg = _make_cfg(tmp_path, k, cap=25)
    _write_rows(cfg, k, n_rows=6000, n_strategies=9)
    monkeypatch.setattr(RD, "_STREAM_BUCKET_ROWS", 500)  # forces ~12 buckets
    _compare(cfg, k)


def test_streamed_equals_oneshot_k2_with_cap(tmp_path, monkeypatch):
    k = 2
    cfg = _make_cfg(tmp_path, k, lags=(1, 3), cap=10)
    _write_rows(cfg, k, n_rows=4000, n_strategies=30)  # many capped lineups
    monkeypatch.setattr(RD, "_STREAM_BUCKET_ROWS", 700)
    _compare(cfg, k)


@pytest.mark.slow
def test_streamed_equals_oneshot_million_rows(tmp_path, monkeypatch):
    """VERDICT r2 #6 'done' criterion: >=1M synthetic rows, bounded buckets,
    same level frames."""
    k = 2
    cfg = _make_cfg(tmp_path, k, lags=(1, 2), cap=50)
    _write_rows(cfg, k, n_rows=1_000_000, n_strategies=400)
    monkeypatch.setattr(RD, "_STREAM_BUCKET_ROWS", 100_000)  # 10 buckets
    _compare(cfg, k)
