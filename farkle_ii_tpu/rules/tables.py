"""Dense scoring tables for on-device (XLA) roll evaluation.

The reference scores rolls through a Python dict keyed by face-count tuples
(``/root/reference/src/farkle/game/scoring_lookup.py:244``). A dict is useless
on a TPU; instead we enumerate every face-count key once on the host (via the
pure oracle in :mod:`farkle_ii_tpu.rules.oracle`) into a *dense* array indexed
by a mixed-radix perfect hash of the count tuple:

    key(c1..c6) = c1 + 7*c2 + 49*c3 + 343*c4 + 2401*c5 + 16807*c6

giving a table of ``7**6 = 117,649`` int32 entries (~460 KiB — fits in VMEM).
Each entry packs ``(score, used, single_fives, single_ones)``:

    bits  0..11  score          (0..3000)
    bits 12..14  used           (0..6)
    bits 15..17  single_fives   (0..6)
    bits 18..20  single_ones    (0..6)

Scoring a batch of rolls on device is then: one-hot face counting + a dot with
the radix vector + a single gather + bit unpacking — all VPU-friendly, fully
static shapes.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from farkle_ii_tpu.rules import oracle

TABLE_SIZE = 7**6  # 117,649

RADIX = np.array([7**i for i in range(6)], dtype=np.int32)

SCORE_SHIFT, SCORE_BITS = 0, 12
USED_SHIFT, USED_BITS = 12, 3
SF_SHIFT, SF_BITS = 15, 3
SO_SHIFT, SO_BITS = 18, 3


def counts_to_index(counts) -> int:
    """Mixed-radix perfect hash of a six-face count tuple."""
    return int(sum(int(c) * 7**i for i, c in enumerate(counts)))


def pack_entry(score: int, used: int, single_fives: int, single_ones: int) -> int:
    """Pack one scoring result into an int32 table entry."""
    assert 0 <= score < (1 << SCORE_BITS), score
    assert 0 <= used <= 6 and 0 <= single_fives <= 6 and 0 <= single_ones <= 6
    return (
        (score << SCORE_SHIFT)
        | (used << USED_SHIFT)
        | (single_fives << SF_SHIFT)
        | (single_ones << SO_SHIFT)
    )


def unpack_entry(entry: int) -> tuple[int, int, int, int]:
    """Inverse of :func:`pack_entry`."""
    score = (entry >> SCORE_SHIFT) & ((1 << SCORE_BITS) - 1)
    used = (entry >> USED_SHIFT) & ((1 << USED_BITS) - 1)
    sf = (entry >> SF_SHIFT) & ((1 << SF_BITS) - 1)
    so = (entry >> SO_SHIFT) & ((1 << SO_BITS) - 1)
    return score, used, sf, so


@lru_cache(maxsize=1)
def build_packed_score_table() -> np.ndarray:
    """Build the dense packed scoring table (int32, shape ``(TABLE_SIZE,)``).

    Entries for count vectors summing to 0 or more than 6 dice are zero
    (score 0 / used 0): the empty roll genuinely scores nothing and >6-dice
    keys are unreachable from real rolls.
    """
    table = np.zeros(TABLE_SIZE, dtype=np.int32)
    for key in oracle.all_count_keys():
        score, used, sf, so = oracle.score_counts(key)
        table[counts_to_index(key)] = pack_entry(score, used, sf, so)
    return table


@lru_cache(maxsize=1)
def build_unpacked_score_tables() -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Unpacked ``(score, used, single_fives, single_ones)`` int32 tables."""
    packed = build_packed_score_table()
    score = (packed >> SCORE_SHIFT) & ((1 << SCORE_BITS) - 1)
    used = (packed >> USED_SHIFT) & ((1 << USED_BITS) - 1)
    sf = (packed >> SF_SHIFT) & ((1 << SF_BITS) - 1)
    so = (packed >> SO_SHIFT) & ((1 << SO_BITS) - 1)
    return (
        score.astype(np.int32),
        used.astype(np.int32),
        sf.astype(np.int32),
        so.astype(np.int32),
    )
