"""RNG-quality diagnostics: lagged autocorrelation of game outcomes.

Reference parity (``/root/reference/src/farkle/analysis/rng_diagnostics.py:564-668``):
autocorrelations of win indicators and game length over games ordered by
``game_seed``, at four levels — global, strategy, **matchup**, and
**matchup-strategy** (every k, capped at ``analysis.rng_max_matchup_groups``
deterministically ordered groups) — with ``diagnostic_band_*`` reference
lines at ±2/√n. The bands carry no independence claim — they are
descriptive reference lines only.

Lags come from ``analysis.rng_lags``. All group statistics are computed
from vectorized grouped sufficient sums (one ``bincount`` sweep per lag per
level — the streaming-accumulator shape of the reference without per-row
Python), and the rows read is column-pruned to the k+4 needed columns so
the mega k=2 cell never materializes its full 40-column table.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

from farkle_ii_tpu.config import AppConfig, compute_stage_config_sha
from farkle_ii_tpu.utils.artifacts import (
    read_parquet_artifact,
    write_parquet_artifact_atomic,
)
from farkle_ii_tpu.utils.stage_completion import (
    StageState,
    resolve_stage_state,
    write_stage_done,
)

logger = logging.getLogger(__name__)


def diagnostics_path(cfg: AppConfig, k: int) -> Path:
    return cfg.scope_dir("diagnostics") / f"rng_autocorrelation_{k}p.parquet"


def grouped_lagged_autocorr(
    codes: np.ndarray, values: np.ndarray, lag: int, n_groups: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-group Pearson autocorrelation at ``lag`` from grouped sums.

    ``codes``/``values`` must be sorted by (group, stream order); lag pairs
    never cross group boundaries. Returns ``(corr, n_pairs)`` arrays of
    length ``n_groups`` (NaN where undefined).
    """
    corr = np.full(n_groups, np.nan)
    if len(values) <= lag:
        return corr, np.zeros(n_groups, dtype=np.int64)
    same = codes[lag:] == codes[:-lag]
    g = codes[lag:][same]
    a = values[:-lag][same].astype(np.float64)
    b = values[lag:][same].astype(np.float64)
    n = np.bincount(g, minlength=n_groups).astype(np.float64)
    sa = np.bincount(g, weights=a, minlength=n_groups)
    sb = np.bincount(g, weights=b, minlength=n_groups)
    saa = np.bincount(g, weights=a * a, minlength=n_groups)
    sbb = np.bincount(g, weights=b * b, minlength=n_groups)
    sab = np.bincount(g, weights=a * b, minlength=n_groups)
    with np.errstate(invalid="ignore", divide="ignore"):
        cov = sab - sa * sb / np.where(n > 0, n, 1)
        va = saa - sa * sa / np.where(n > 0, n, 1)
        vb = sbb - sb * sb / np.where(n > 0, n, 1)
        denom = np.sqrt(va * vb)
        ok = (n > 1) & (denom > 0)
        corr[ok] = cov[ok] / denom[ok]
    return corr, n.astype(np.int64)


def _level_rows(
    *,
    codes: np.ndarray,
    values: np.ndarray,
    keys: list[str],
    level: str,
    metric: str,
    k: int,
    root: int,
    lags: list[int],
) -> list[dict]:
    """Autocorrelation rows for one (level, metric) across all its groups."""
    n_groups = len(keys)
    group_sizes = np.bincount(codes, minlength=n_groups)
    out: list[dict] = []
    per_lag = {
        lag: grouped_lagged_autocorr(codes, values, lag, n_groups) for lag in lags
    }
    for gi, key in enumerate(keys):
        n = int(group_sizes[gi])
        band = 2.0 / np.sqrt(n) if n > 0 else None
        for lag in lags:
            corr, _pairs = per_lag[lag]
            value = corr[gi]
            out.append(
                {
                    "root_seed": root,
                    "k": k,
                    "level": level,
                    "group_key": key,
                    "metric": metric,
                    "lag": lag,
                    "n_games": n,
                    "autocorrelation": None if np.isnan(value) else float(value),
                    "diagnostic_band_low": -band if band is not None else None,
                    "diagnostic_band_high": band,
                }
            )
    return out


def _rng_columns(k: int) -> list[str]:
    return ["game_seed", "winner_seat", "n_rounds", "termination_status"] + [
        f"P{s}_strategy" for s in range(1, k + 1)
    ]


# ── streaming machinery ──────────────────────────────────────────────────────
# The seed-ordered sweep is streamed in bounded memory by exploiting that
# ``game_seed`` is a uniform 64-bit fingerprint: equal-width seed ranges are
# equal-size buckets. Each bucket pass scans the curated parquet in 65k-row
# batches, keeps only its range, sorts that bounded slice, and folds it into
# per-group accumulators; lag pairs that cross bucket (or per-seat segment)
# boundaries are recovered exactly from stored group heads/tails, so the
# result is bit-for-bit the global-sort computation without ever holding the
# table (test_rng_streaming_equivalence pins this at 1M+ rows).


class _LevelState:
    """Per-group lagged-pair accumulators for one stream level.

    ``extend`` consumes successive (codes, values) slices, each sorted by
    (group, stream order), with slices arriving in ascending stream order
    (seed buckets). Within-slice pairs are vectorized; pairs crossing the
    slice boundary are completed exactly from each group's stored tail
    (the stream's last ``max(lags)`` values per group).
    """

    __slots__ = ("lags", "maxlag", "n_groups", "sums", "tail", "count")

    def __init__(self, n_groups: int, lags: list[int]) -> None:
        self.lags = lags
        self.maxlag = max(lags) if lags else 0
        self.n_groups = n_groups
        # per lag: [n_pairs, sa, sb, saa, sbb, sab] x groups
        self.sums = {lag: np.zeros((6, n_groups)) for lag in lags}
        self.tail: list[list[float]] = [[] for _ in range(n_groups)]
        self.count = np.zeros(n_groups, dtype=np.int64)

    def _pair(self, lag: int, g: int, x: float, y: float) -> None:
        s = self.sums[lag][:, g]
        s[0] += 1.0
        s[1] += x
        s[2] += y
        s[3] += x * x
        s[4] += y * y
        s[5] += x * y

    def extend(self, codes: np.ndarray, values: np.ndarray) -> None:
        if len(codes) == 0:
            return
        values = values.astype(np.float64, copy=False)
        # vectorized within-slice pairs (identical math to the one-shot path)
        for lag in self.lags:
            if len(values) > lag:
                same = codes[lag:] == codes[:-lag]
                g = codes[lag:][same]
                a = values[:-lag][same]
                b = values[lag:][same]
                s = self.sums[lag]
                s[0] += np.bincount(g, minlength=self.n_groups)
                s[1] += np.bincount(g, weights=a, minlength=self.n_groups)
                s[2] += np.bincount(g, weights=b, minlength=self.n_groups)
                s[3] += np.bincount(g, weights=a * a, minlength=self.n_groups)
                s[4] += np.bincount(g, weights=b * b, minlength=self.n_groups)
                s[5] += np.bincount(g, weights=a * b, minlength=self.n_groups)
        # per present group: tail-crossing pairs + tail/count upkeep
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        ends = np.r_[starts[1:], len(codes)]
        for s0, e0 in zip(starts, ends):
            g = int(codes[s0])
            seg = values[s0:e0]
            t = self.tail[g]
            for lag in self.lags:
                for d in range(1, min(lag, len(t)) + 1):
                    j = lag - d
                    if j < len(seg):
                        self._pair(lag, g, t[-d], float(seg[j]))
            nt = t + [float(v) for v in seg[-self.maxlag :]]
            self.tail[g] = nt[-self.maxlag :]
            self.count[g] += len(seg)

    def rows(
        self, *, keys: list[str], level: str, metric: str, k: int, root: int
    ) -> list[dict]:
        out: list[dict] = []
        for gi, key in enumerate(keys):
            n = int(self.count[gi])
            band = 2.0 / np.sqrt(n) if n > 0 else None
            for lag in self.lags:
                np_, sa, sb, saa, sbb, sab = self.sums[lag][:, gi]
                value = None
                if np_ > 1:
                    cov = sab - sa * sb / np_
                    va = saa - sa * sa / np_
                    vb = sbb - sb * sb / np_
                    denom = float(np.sqrt(va * vb)) if va > 0 and vb > 0 else 0.0
                    if denom > 0:
                        value = float(cov / denom)
                out.append(
                    {
                        "root_seed": root,
                        "k": k,
                        "level": level,
                        "group_key": key,
                        "metric": metric,
                        "lag": lag,
                        "n_games": n,
                        "autocorrelation": value,
                        "diagnostic_band_low": -band if band is not None else None,
                        "diagnostic_band_high": band,
                    }
                )
        return out


def _iter_bucket_arrays(cfg: AppConfig, k: int, n_buckets: int):
    """Yield seed-sorted compact arrays per seed-range bucket (bounded mem).

    Each yield is ``(seed, winner_seat_no int8, n_rounds f64, strategies
    (B_bucket, k) int64)`` for one ascending seed range, sorted by seed.
    """
    from farkle_ii_tpu.utils.artifacts import iter_parquet_artifact_batches

    path = cfg.curated_rows_path(k)
    edges = np.linspace(0.0, float(2**64), n_buckets + 1)
    for b in range(n_buckets):
        lo, hi = edges[b], edges[b + 1]
        parts: list[tuple[np.ndarray, ...]] = []
        for batch in iter_parquet_artifact_batches(
            path, expected_producer="curate", columns=_rng_columns(k),
            validate=(b == 0),
        ):
            seed = batch["game_seed"].to_numpy(np.uint64, na_value=0).astype(np.float64)
            mask = (seed >= lo) & (seed < hi) if b < n_buckets - 1 else (seed >= lo)
            if not mask.any():
                continue
            sel = batch.loc[mask]
            winner_str = sel["winner_seat"].astype("string")
            winner_no = np.zeros(len(sel), dtype=np.int8)
            for s in range(1, k + 1):
                winner_no[(winner_str == f"P{s}").to_numpy(na_value=False)] = s
            strategies = np.stack(
                [sel[f"P{s}_strategy"].to_numpy(np.int64) for s in range(1, k + 1)],
                axis=1,
            )
            parts.append(
                (
                    sel["game_seed"].to_numpy(np.uint64, na_value=0),
                    winner_no,
                    sel["n_rounds"].to_numpy(np.float64),
                    strategies,
                )
            )
        if not parts:
            continue
        seed = np.concatenate([p[0] for p in parts])
        order = np.argsort(seed, kind="stable")
        yield (
            seed[order],
            np.concatenate([p[1] for p in parts])[order],
            np.concatenate([p[2] for p in parts])[order],
            np.concatenate([p[3] for p in parts], axis=0)[order],
        )


def _discover_groups(cfg: AppConfig, k: int, cap: int):
    """One streaming pass: strategy-id set, first-``cap`` lexicographic
    matchup lineups, global max strategy id, and total rows."""
    from farkle_ii_tpu.utils.artifacts import iter_parquet_artifact_batches

    sids: set[int] = set()
    lineups: np.ndarray | None = None  # running top-cap, lex-sorted
    total = 0
    capped = False
    for batch in iter_parquet_artifact_batches(
        cfg.curated_rows_path(k), expected_producer="curate",
        columns=[f"P{s}_strategy" for s in range(1, k + 1)], validate=True,
    ):
        total += len(batch)
        strategies = np.stack(
            [batch[f"P{s}_strategy"].to_numpy(np.int64) for s in range(1, k + 1)],
            axis=1,
        )
        sids.update(np.unique(strategies).tolist())
        batch_lineups = np.unique(np.sort(strategies, axis=1), axis=0)
        merged = (
            batch_lineups
            if lineups is None
            else np.unique(np.concatenate([lineups, batch_lineups]), axis=0)
        )
        if len(merged) > cap:
            capped = True
        lineups = merged[:cap]  # np.unique sorts rows lexicographically
    return (
        np.asarray(sorted(sids), dtype=np.int64),
        lineups if lineups is not None else np.empty((0, k), np.int64),
        capped,
        total,
    )


# target peak rows held per bucket pass (sort + accumulate working set)
_STREAM_BUCKET_ROWS = 1_500_000


def run_for_k(cfg: AppConfig, k: int) -> pd.DataFrame:
    root = int(cfg.sim.seed)
    lags = sorted({int(v) for v in cfg.analysis.rng_lags if int(v) >= 1})
    cap = int(cfg.analysis.rng_max_matchup_groups)

    uniq_sids, kept_lineups, capped, n_rows = _discover_groups(cfg, k, cap)
    if capped:
        logger.info(
            "rng diagnostics k=%d: matchup groups capped to %d "
            "(deterministic key order)", k, cap,
        )
    n_buckets = max(1, -(-n_rows // _STREAM_BUCKET_ROWS))
    m_labels = [":".join(str(int(v)) for v in row) for row in kept_lineups]
    sid_base = int(uniq_sids.max()) + 1 if len(uniq_sids) else 1

    glob_rounds = _LevelState(1, lags)
    glob_p1 = _LevelState(1, lags)
    strat = _LevelState(len(uniq_sids), lags)
    matchup = _LevelState(len(kept_lineups), lags)
    # matchup-strategy pair groups use a two-level dense code: the same
    # strategy can occupy several seats of a lineup but its *stream* per
    # matchup is one group — code by (m, rank of sid within the lineup's
    # unique sids), re-labeled by true pair code at the end
    ms = _LevelState(len(kept_lineups) * k, lags)
    lineup_uniq_sids = [np.unique(row) for row in kept_lineups]

    for seed, winner_no, n_rounds, strategies in _iter_bucket_arrays(
        cfg, k, n_buckets
    ):
        b = len(seed)
        zeros = np.zeros(b, dtype=np.int64)
        glob_rounds.extend(zeros, n_rounds)
        glob_p1.extend(zeros, (winner_no == 1).astype(np.float64))

        # strategy level: per-group stream ordered by (seed, seat) — the
        # one-shot path's lexsort((game, code)) with stable seat tiebreak
        seat_codes = np.searchsorted(uniq_sids, strategies)  # (b, k)
        sids_flat = seat_codes.T.reshape(-1)
        pos_flat = np.tile(np.arange(b, dtype=np.int64), k)
        seat_flat = np.repeat(np.arange(k, dtype=np.int64), b)
        won_flat = np.concatenate(
            [(winner_no == s).astype(np.float64) for s in range(1, k + 1)]
        )
        order = np.lexsort((seat_flat, pos_flat, sids_flat))
        strat.extend(sids_flat[order], won_flat[order])

        # matchup levels: only rows whose sorted lineup is a kept group
        sorted_lineup = np.sort(strategies, axis=1)
        if len(kept_lineups):
            pos = _lineup_codes(sorted_lineup, kept_lineups)
            sel = np.flatnonzero(pos >= 0)
            if len(sel):
                mk = pos[sel]
                morder = np.argsort(mk, kind="stable")
                msel = sel[morder]
                focal = sorted_lineup[msel, 0]
                focal_won = np.zeros(len(msel))
                for s in range(1, k + 1):
                    focal_won += (winner_no[msel] == s) & (
                        strategies[msel, s - 1] == focal
                    )
                matchup.extend(mk[morder], focal_won.astype(np.float64))

                # (matchup, sid) streams ordered by (seed, seat)
                kept_rows = kept_lineups[pos[sel]]  # (n_sel, k) sorted sids
                sid = strategies[sel]  # (n_sel, k) per-seat sids
                below = (kept_rows[:, :, None] < sid[:, None, :]).sum(axis=1)
                dup_below = (
                    (kept_rows[:, 1:, None] == kept_rows[:, :-1, None])
                    & (kept_rows[:, 1:, None] < sid[:, None, :])
                ).sum(axis=1)
                slot = below - dup_below  # (n_sel, k) unique-sid rank
                codes2 = (pos[sel][:, None] * k + slot).T.reshape(-1)
                pos2 = np.tile(sel.astype(np.int64), k)
                seat2 = np.repeat(np.arange(k, dtype=np.int64), len(sel))
                won2 = np.concatenate(
                    [
                        (winner_no[sel] == s).astype(np.float64)
                        for s in range(1, k + 1)
                    ]
                )
                order2 = np.lexsort((seat2, pos2, codes2))
                ms.extend(codes2[order2], won2[order2])

    out: list[dict] = []
    out += glob_rounds.rows(
        keys=["all"], level="global", metric="n_rounds", k=k, root=root
    )
    out += glob_p1.rows(
        keys=["all"], level="global", metric="p1_win", k=k, root=root
    )
    out += strat.rows(
        keys=[str(int(s)) for s in uniq_sids],
        level="strategy", metric="win", k=k, root=root,
    )
    if len(kept_lineups):
        out += matchup.rows(
            keys=m_labels, level="matchup", metric="focal_win", k=k, root=root
        )
        # emit only (matchup, sid) groups that occurred, in pair-code order
        ms_rows: list[dict] = []
        for m in range(len(kept_lineups)):
            for j, sid in enumerate(lineup_uniq_sids[m]):
                gi = m * k + j
                if ms.count[gi] == 0:
                    continue
                sub = _LevelState(1, lags)
                for lag in lags:
                    sub.sums[lag][:, 0] = ms.sums[lag][:, gi]
                sub.count[0] = ms.count[gi]
                ms_rows.append((m * sid_base + int(sid), sub, f"{m_labels[m]}|{int(sid)}"))
        ms_rows.sort(key=lambda t: t[0])
        for _code, sub, label in ms_rows:
            out += sub.rows(
                keys=[label], level="matchup_strategy", metric="win",
                k=k, root=root,
            )
    return pd.DataFrame(out)


def _lineup_codes(lineups: np.ndarray, kept: np.ndarray) -> np.ndarray:
    """Vectorized index of each lineup row in the lex-sorted kept matrix (-1
    if absent): structured-void views make lexicographic row comparison a
    plain searchsorted."""
    k = lineups.shape[1]
    dt = [("", np.int64)] * k
    kept_v = np.ascontiguousarray(kept, dtype=np.int64).view(dt).ravel()
    rows_v = np.ascontiguousarray(lineups, dtype=np.int64).view(dt).ravel()
    pos = np.searchsorted(kept_v, rows_v)
    pos_c = np.minimum(pos, len(kept_v) - 1)
    hit = kept_v[pos_c] == rows_v
    return np.where(hit, pos_c, -1).astype(np.int64)


def _run_for_k_inmemory(cfg: AppConfig, k: int) -> pd.DataFrame:
    """One-shot reference implementation (kept for equivalence tests)."""
    rows = read_parquet_artifact(
        cfg.curated_rows_path(k), expected_producer="curate",
        columns=_rng_columns(k),
    ).to_pandas()
    rows = rows.sort_values("game_seed", kind="mergesort").reset_index(drop=True)
    root = int(cfg.sim.seed)
    lags = sorted({int(v) for v in cfg.analysis.rng_lags if int(v) >= 1})
    out: list[dict] = []
    n_games = len(rows)
    # winner as a compact 1-based seat integer (0 = no winner): the string
    # column as numpy objects costs ~10x the memory at mega row counts
    winner_str = rows["winner_seat"].astype("string")
    winner_seat_no = np.zeros(n_games, dtype=np.int8)
    for s in range(1, k + 1):
        winner_seat_no[(winner_str == f"P{s}").to_numpy(na_value=False)] = s
    strategies = np.stack(
        [rows[f"P{s}_strategy"].to_numpy(np.int64) for s in range(1, k + 1)], axis=1
    )
    n_rounds = rows["n_rounds"].to_numpy(np.float64)
    del rows, winner_str

    # ── global level ────────────────────────────────────────────────────
    zeros = np.zeros(n_games, dtype=np.int64)
    out += _level_rows(
        codes=zeros, values=n_rounds,
        keys=["all"], level="global", metric="n_rounds", k=k, root=root, lags=lags,
    )
    out += _level_rows(
        codes=zeros, values=(winner_seat_no == 1).astype(np.float64),
        keys=["all"], level="global", metric="p1_win", k=k, root=root, lags=lags,
    )

    # ── strategy level: each strategy's exposure stream ────────────────
    sids = strategies.T.reshape(-1)  # seat-major: (K*B,) keeps per-seat order
    order = np.tile(np.arange(n_games), k)
    won = np.concatenate(
        [(winner_seat_no == s).astype(np.float64) for s in range(1, k + 1)]
    )
    uniq, codes = np.unique(sids, return_inverse=True)
    sort_idx = np.lexsort((order, codes))
    out += _level_rows(
        codes=codes[sort_idx], values=won[sort_idx],
        keys=[str(int(s)) for s in uniq],
        level="strategy", metric="win", k=k, root=root, lags=lags,
    )

    # ── matchup + matchup-strategy levels (all k, capped groups) ───────
    # grouping is fully integer-coded: building per-row string keys cost
    # tens of minutes at production row counts; labels are materialized
    # only for the <= cap kept groups
    sorted_lineup = np.sort(strategies, axis=1)
    uniq_rows, m_codes = np.unique(sorted_lineup, axis=0, return_inverse=True)
    cap = int(cfg.analysis.rng_max_matchup_groups)
    if len(uniq_rows) > cap:
        logger.info(
            "rng diagnostics k=%d: %d matchup groups capped to %d "
            "(deterministic key order)", k, len(uniq_rows), cap,
        )
    n_kept = min(cap, len(uniq_rows))
    # lineup rows sort lexicographically like the old string keys sorted
    # numerically-per-field; label order is deterministic either way
    m_labels = [":".join(str(int(v)) for v in row) for row in uniq_rows[:n_kept]]
    keep = np.flatnonzero(m_codes < cap)
    if len(keep):
        mk = m_codes[keep]
        midx = np.argsort(mk, kind="stable")
        sel = keep[midx]
        # matchup level: focal = lowest strategy id in the lineup
        focal = sorted_lineup[sel, 0]
        focal_won = np.zeros(len(sel))
        for s in range(1, k + 1):
            focal_won += (
                (winner_seat_no[sel] == s) & (strategies[sel, s - 1] == focal)
            )
        out += _level_rows(
            codes=m_codes[sel], values=focal_won.astype(np.float64),
            keys=m_labels,
            level="matchup", metric="focal_win", k=k, root=root, lags=lags,
        )
        # matchup-strategy level: per (matchup, seat strategy) win stream,
        # pair-coded as matchup * (max_sid + 1) + sid
        ms_sids = strategies[sel].T.reshape(-1).astype(np.int64)
        ms_matchup = np.tile(m_codes[sel].astype(np.int64), k)
        ms_order = np.tile(np.arange(len(sel)), k)
        ms_won = np.concatenate(
            [(winner_seat_no[sel] == s).astype(np.float64) for s in range(1, k + 1)]
        )
        sid_base = int(ms_sids.max()) + 1 if len(ms_sids) else 1
        uniq_pair, p_codes = np.unique(
            ms_matchup * sid_base + ms_sids, return_inverse=True
        )
        p_labels = [
            f"{m_labels[int(code // sid_base)]}|{int(code % sid_base)}"
            for code in uniq_pair
        ]
        p_sort = np.lexsort((ms_order, p_codes))
        out += _level_rows(
            codes=p_codes[p_sort], values=ms_won[p_sort],
            keys=p_labels,
            level="matchup_strategy", metric="win", k=k, root=root, lags=lags,
        )
    return pd.DataFrame(out)


def run(cfg: AppConfig, *, force: bool = False) -> None:
    stage_sha = compute_stage_config_sha(cfg, "rng_diagnostics")
    out_dir = cfg.scope_dir("diagnostics")
    state = resolve_stage_state(
        out_dir, "rng_diagnostics", config_sha=stage_sha,
        freshness_key=cfg.freshness_key(),
    )
    if state == StageState.COMPLETE_VALID and not force:
        logger.info("rng diagnostics up to date")
        return
    outputs, inputs = [], []
    for k in sorted(int(k) for k in cfg.sim.n_players_list):
        frame = run_for_k(cfg, k)
        path = diagnostics_path(cfg, k)
        write_parquet_artifact_atomic(
            pa.Table.from_pandas(frame, preserve_index=False), path,
            producer="rng_diagnostics", scope="diagnostics",
            metadata={
                "operation": "lagged_autocorrelation",
                "lags": sorted({int(v) for v in cfg.analysis.rng_lags}),
                "matchup_group_cap": int(cfg.analysis.rng_max_matchup_groups),
                "interpretation": "reference_bands_no_independence_claim",
            },
        )
        outputs.append(path)
        inputs.append(cfg.curated_rows_path(k))
    write_stage_done(
        out_dir, "rng_diagnostics", inputs=inputs, outputs=outputs,
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
