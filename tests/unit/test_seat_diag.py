"""Focused tests for seat-analysis diagnostics on hand-built frames."""

import numpy as np
import pandas as pd

from farkle_ii_tpu.analysis.seat_analysis import (
    build_seat_batch_counts,
    game_diagnostics,
    within_k_frames,
)


def make_2p_rows(records):
    """records: (batch, s0, s1, completed, p1_win)"""
    rows = []
    for batch, s0, s1, completed, p1win in records:
        rows.append(
            {
                "root_seed": 7,
                "k": 2,
                "deterministic_batch_id": batch,
                "termination_status": "completed" if completed else "safety_limit",
                "winner_seat": ("P1" if p1win else "P2") if completed else None,
                "P1_strategy": s0,
                "P2_strategy": s1,
            }
        )
    return pd.DataFrame(rows)


def test_selfplay_diagnostic():
    df = make_2p_rows(
        [
            (0, 5, 5, True, True),
            (0, 5, 5, True, False),
            (0, 5, 5, False, False),  # safety
            (0, 5, 9, True, True),  # not selfplay
        ]
    )
    selfplay, _ = game_diagnostics({2: df})
    assert len(selfplay) == 1
    row = selfplay.iloc[0]
    assert row["strategy"] == 5
    assert row["games_attempted"] == 3
    assert row["games_completed"] == 2
    assert row["games_safety_limit"] == 1
    assert row["p1_wins"] == 1
    assert row["p1_win_rate_given_completion"] == 0.5
    assert row["p1_effect_vs_chance"] == 1 / 3 - 0.5


def test_mirrored_pairing():
    # pair (3, 8): two forward (3,8), one reverse (8,3) in same batch
    # -> 1 mirrored pair, 1 unpaired forward
    df = make_2p_rows(
        [
            (0, 3, 8, True, True),   # forward, P1(=3) wins   paired (occ 0)
            (0, 3, 8, True, False),  # forward, P1 loses      unpaired (occ 1)
            (0, 8, 3, True, True),   # reverse, P1(=8) wins   paired (occ 0)
            (1, 3, 8, True, True),   # different batch: unpaired forward
            (0, 3, 8, False, False), # safety: excluded from pairing
        ]
    )
    _, mirrored = game_diagnostics({2: df})
    assert len(mirrored) == 1
    row = mirrored.iloc[0]
    assert row["strategy_a"] == 3 and row["strategy_b"] == 8
    assert row["paired_mirrored_games"] == 1
    assert row["games_attempted"] == 5
    assert row["games_completed"] == 4
    assert row["games_safety_limit"] == 1
    assert row["unpaired_forward_games"] == 2
    assert row["unpaired_reverse_games"] == 0
    # pair: forward p1_win=1, reverse p1_win=1 -> diff = 0
    assert row["mean_p1_win_difference"] == 0.0


def test_batch_counts_and_within_k():
    df = make_2p_rows(
        [
            (0, 1, 2, True, True),
            (0, 2, 1, True, False),
            (1, 1, 2, False, False),
        ]
    )
    counts = build_seat_batch_counts(df, 2)
    # strategy 1: seat1 in g0 (win), seat2 in g1... wait: rows are
    # (s0 -> seat1). strategy 1 exposures: (b0,seat1), (b0,seat2), (b1,seat1)
    s1 = counts[counts["strategy"] == 1]
    assert s1["raw_exposures"].sum() == 3
    assert s1["raw_wins"].sum() == 1 + 1  # won b0 as P1; won b0 as P2 (P1 lost)
    effects, population = within_k_frames(counts, 2)
    # population seat 1: 3 exposures, wins = games won by P1 = 1
    pop1 = population[population["seat"] == 1].iloc[0]
    assert pop1["raw_exposures"] == 3
    assert pop1["raw_wins"] == 1
    assert pop1["seat_effect"] == 1 / 3 - 0.5
