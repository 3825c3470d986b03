"""Streaming game-stats accumulators: hist quantiles, per-strategy stats."""

import numpy as np
import pandas as pd
import pytest

from farkle_ii_tpu.analysis.game_stats import StreamingHist, StrategyAccumulator


def test_unit_width_hist_quantiles_exact():
    rng = np.random.default_rng(7)
    values = rng.integers(0, 200, size=10_000)
    h = StreamingHist(1, 256)
    for chunk in np.array_split(values, 7):  # streaming in chunks
        h.update(chunk)
    for q in (0.01, 0.25, 0.5, 0.95, 0.99):
        # exact integer quantile (lower interpolation)
        expected = float(np.quantile(values, q, method="inverted_cdf"))
        assert abs(h.quantile(q) - expected) <= 1.0
    assert h.mean() == pytest.approx(values.mean())
    assert h.sd() == pytest.approx(values.std(ddof=1), rel=1e-9)
    assert h.vmin == values.min() and h.vmax == values.max()


def test_wide_bin_hist_quantile_within_bin():
    values = np.arange(0, 40_000, 7)
    h = StreamingHist(10, 4_096)
    h.update(values)
    assert abs(h.quantile(0.5) - np.quantile(values, 0.5)) <= 10


def test_hist_overflow_bin():
    h = StreamingHist(1, 16)
    h.update(np.array([1, 2, 100, 200]))
    assert h.counts[-1] == 2  # overflow
    assert h.quantile(0.99) == 200  # overflow quantile falls back to max


def test_strategy_accumulator_matches_pandas():
    rng = np.random.default_rng(3)
    n = 5_000
    sids = rng.integers(0, 37, size=n)
    score = rng.integers(0, 12_000, size=n).astype(float)
    rolls = rng.integers(0, 100, size=n).astype(float)
    won = rng.random(n) < 0.2
    completed = rng.random(n) < 0.97

    acc = StrategyAccumulator()
    for sl in (slice(0, 1000), slice(1000, 4100), slice(4100, n)):  # streamed
        cols = {"score": score[sl], "rolls": rolls[sl]}
        acc.update(sids[sl], cols, won[sl].astype(float), completed[sl].astype(float))
    frame = acc.frame(k=3).set_index("strategy")

    df = pd.DataFrame({"sid": sids, "score": score, "rolls": rolls, "won": won,
                       "completed": completed})
    g = df.groupby("sid")
    assert (frame["exposures"] == g.size()).all()
    assert (frame["wins"] == g["won"].sum()).all()
    assert (frame["completed_exposures"] == g["completed"].sum()).all()
    assert np.allclose(frame["mean_score"], g["score"].mean())
    assert np.allclose(frame["sd_score"], g["score"].std(ddof=0))
