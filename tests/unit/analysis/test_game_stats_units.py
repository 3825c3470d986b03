"""Fast-suite unit coverage of the streaming game-stats accumulators.

The streaming-equivalence pin at 1M+ rows lives in the slow suite; these
exercise the histogram/moment/strategy accumulators directly against
numpy brute force — round-4 verdict: analysis/game_stats.py had 36.8%
fast coverage.
"""

from __future__ import annotations

import numpy as np

from farkle_ii_tpu.analysis.game_stats import StrategyAccumulator, StreamingHist


def test_streaming_hist_matches_numpy_moments():
    rng = np.random.default_rng(7)  # test-only stream
    vals = rng.integers(0, 500, size=4096)
    h = StreamingHist(width=1, n_bins=600)
    for chunk in np.array_split(vals, 7):  # streamed in uneven chunks
        h.update(chunk)
    assert h.count == vals.size
    assert h.mean() == np.mean(vals)
    np.testing.assert_allclose(h.sd(), np.std(vals, ddof=1), rtol=1e-12)
    assert h.vmin == vals.min() and h.vmax == vals.max()
    # width-1 histogram quantiles are exact
    for q in (0.05, 0.5, 0.95):
        assert h.quantile(q) == float(np.quantile(vals, q, method="lower")) or (
            abs(h.quantile(q) - np.quantile(vals, q)) <= 1.0
        )


def test_streaming_hist_overflow_bin_and_tail():
    h = StreamingHist(width=10, n_bins=4)  # bins cover [0, 40); rest overflow
    h.update(np.array([1, 11, 21, 31, 1000, 2000]))
    assert h.counts[-1] == 2  # two overflow values
    # overflow-quantile falls back to the exact max
    assert h.quantile(0.99) == 2000
    assert h.tail_threshold(0.01) == 2000


def test_streaming_hist_empty_is_inert():
    h = StreamingHist(width=1, n_bins=8)
    h.update(np.array([], dtype=np.int64))
    assert h.count == 0 and h.mean() is None and h.quantile(0.5) is None


def test_streaming_hist_frame_is_sparse():
    h = StreamingHist(width=5, n_bins=10)
    h.update(np.array([0, 0, 26]))
    f = h.frame(k=3, metric="m")
    assert set(f["bin_lo"]) == {0, 25}
    assert f.loc[f["bin_lo"] == 0, "count"].item() == 2
    assert not f["overflow"].any()


def test_strategy_accumulator_matches_bruteforce():
    rng = np.random.default_rng(11)  # test-only stream
    sids = rng.integers(0, 9, size=500)
    won = rng.integers(0, 2, size=500)
    completed = np.ones(500, dtype=np.int64)
    from farkle_ii_tpu.analysis.game_stats import _STRATEGY_COLS

    cols = {c: rng.integers(0, 50, size=500).astype(np.float64) for c in _STRATEGY_COLS}
    acc = StrategyAccumulator()
    # streamed in two chunks with growth between them
    acc.update(sids[:100], {c: v[:100] for c, v in cols.items()}, won[:100],
               completed[:100])
    acc.update(sids[100:], {c: v[100:] for c, v in cols.items()}, won[100:],
               completed[100:])
    f = acc.frame(k=4).set_index("strategy")
    for s in np.unique(sids):
        sel = sids == s
        assert f.loc[s, "exposures"] == sel.sum()
        assert f.loc[s, "wins"] == won[sel].sum()
        c0 = _STRATEGY_COLS[0]
        np.testing.assert_allclose(f.loc[s, f"mean_{c0}"], cols[c0][sel].mean())
        np.testing.assert_allclose(
            f.loc[s, f"sd_{c0}"], np.sqrt(np.maximum(
                (cols[c0][sel] ** 2).mean() - cols[c0][sel].mean() ** 2, 0.0
            )),
        )
