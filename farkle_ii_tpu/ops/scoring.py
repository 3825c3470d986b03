"""Branchless on-device roll scoring (no gathers).

The first kernel iteration scored rolls by gathering from the dense 7^6 table
(:mod:`farkle_ii_tpu.rules.tables`); profiling showed dynamic gathers dominate
TPU step time (~100x over ALU work). Farkle scoring is simple enough to
compute *directly* with ~40 VPU ops on the (B, 6) count matrix — no memory
indirection at all, fully fusable by XLA.

Rule source: :mod:`farkle_ii_tpu.rules.oracle` (validated exhaustively against
it over all 924 count keys in tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# per-face triple scores: triple 1s = 300, triple f = 100*f
_TRIPLE_SCORES = jnp.array([300, 200, 300, 400, 500, 600], dtype=jnp.int32)


def score_counts_vec(counts: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Score rolls given face counts.

    Args:
        counts: (..., 6) int32, counts of faces 1..6, summing to <= 6.

    Returns:
        ``(score, used, single_fives, single_ones)`` each of shape ``(...)``.
    """
    n = counts.sum(axis=-1)
    is6 = n == 6
    pairs = (counts == 2).sum(axis=-1)
    trips = (counts == 3).sum(axis=-1)
    straight = is6 & jnp.all(counts == 1, axis=-1)
    three_pairs = is6 & (pairs == 3)
    two_triplets = is6 & (trips == 2)
    four_plus_pair = is6 & jnp.any(counts == 4, axis=-1) & (pairs == 1)
    special = straight | three_pairs | two_triplets | four_plus_pair
    special_score = jnp.where(two_triplets, 2500, 1500)

    # n-of-a-kind sets (per face, n >= 3)
    c = counts
    face_set_score = jnp.where(
        c == 3,
        _TRIPLE_SCORES,
        jnp.where(c == 4, 1000, jnp.where(c == 5, 2000, jnp.where(c == 6, 3000, 0))),
    )
    set_score = face_set_score.sum(axis=-1)
    set_used = jnp.where(c >= 3, c, 0).sum(axis=-1)

    # leftover singles: only faces 1 and 5 score when not part of a set
    lone_ones = jnp.where(c[..., 0] < 3, c[..., 0], 0)
    lone_fives = jnp.where(c[..., 4] < 3, c[..., 4], 0)
    singles_score = lone_ones * 100 + lone_fives * 50
    singles_used = lone_ones + lone_fives

    score = jnp.where(special, special_score, set_score + singles_score)
    used = jnp.where(special, 6, set_used + singles_used)
    sf = jnp.where(special, 0, lone_fives)
    so = jnp.where(special, 0, lone_ones)
    return score.astype(jnp.int32), used.astype(jnp.int32), sf.astype(jnp.int32), so.astype(jnp.int32)


def faces_to_counts_vec(faces: jax.Array) -> jax.Array:
    """(..., 6) dice faces (0 = inactive lane) -> (..., 6) face counts."""
    values = jnp.arange(1, 7, dtype=faces.dtype)
    return (faces[..., :, None] == values).sum(axis=-2, dtype=jnp.int32)

# per-face triple scores as Python ints (module-level jnp constants break
# pallas kernel capture; see tests/FAILURE_NOTES.md)
_TRIPLE_SCORES_FLAT = (300, 200, 300, 400, 500, 600)


def counts_from_faces_flat(faces: list[jax.Array]) -> list[jax.Array]:
    """Six flat face arrays (0 = inactive lane) -> six flat per-face counts.

    The flat formulation keeps every intermediate at the batch shape — no
    ``(B, 6)`` minor dimension, no cross-axis reductions — so XLA fuses the
    whole scoring DAG into the surrounding elementwise kernel instead of
    materializing lane-padded intermediates between fusions.
    """
    return [
        sum(((f == face).astype(jnp.int32) for f in faces), start=jnp.int32(0))
        for face in range(1, 7)
    ]


# SWAR constants for the nibble-packed scorer (python ints: pallas-safe)
_M1 = 0x111111  # one per face nibble
_H8 = 0x888888  # nibble high bits
# triple scores / 100 packed so that ``(e3 * _K3) >> 20`` sums the bases of
# set bits (e3 has bits at 4f for faces with count == 3; <= 2 such faces)
_K3 = (3 << 20) | (2 << 16) | (3 << 12) | (4 << 8) | (5 << 4) | 6


def _eq_nibble_mask(acc: jax.Array, v: int) -> jax.Array:
    """Bits ``4f+3`` set iff face ``f``'s count nibble equals ``v``.

    Borrow-free zero-nibble detection: ``(y | H) - 1`` per nibble stays
    nibble-local (the OR keeps every nibble >= 8, so no subtraction
    borrows cross nibble boundaries), and its high bit is clear iff the
    nibble was zero. Valid for nibble values <= 7 (counts are <= 6).
    """
    y = acc ^ (v * _M1)
    return ~((y | _H8) - _M1) & _H8


def _nibble_bit_count(mask: jax.Array) -> jax.Array:
    """Number of set ``4f+3`` bits (multiply-fold; no popcount needed)."""
    return (((mask >> 3) * _M1) >> 20) & 0xF


def score_packed_flat(
    acc: jax.Array, n_total: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Score rolls from the nibble-packed face-count word — SWAR twin.

    ``acc`` packs the six face counts as nibbles (``sum(1 << 4*face)``
    over active dice, counts <= 6, no carries). All per-face tests run on
    every nibble at once with borrow-free SWAR algebra, cutting the scorer
    from ~170 vector ops (``score_counts_flat`` on six extracted count
    words) to ~75 — the roll-step is VPU-issue-bound, so op count is the
    cost model. Exactly equal to ``score_counts_flat`` on every reachable
    count vector (exhaustive test over all sum<=6 compositions).

    Returns ``(score, used, single_fives, single_ones)`` int32 arrays.
    """
    is6 = n_total == 6
    pairs = _nibble_bit_count(_eq_nibble_mask(acc, 2))
    trips_mask = _eq_nibble_mask(acc, 3)
    trips = _nibble_bit_count(trips_mask)
    straight = is6 & (acc == _M1)
    three_pairs = is6 & (pairs == 3)
    two_triplets = is6 & (trips == 2)
    any4 = _eq_nibble_mask(acc, 4) != 0
    four_plus_pair = is6 & any4 & (pairs == 1)
    special = straight | three_pairs | two_triplets | four_plus_pair
    special_score = jnp.where(two_triplets, 2500, 1500)

    # n-of-a-kind sets: at most one face can reach 4+ with six dice, so the
    # 4/5/6-of-a-kind scores are flat any-face terms; triples fold their
    # per-face bases through one multiply
    # window is one nibble: the two-triple base sum is <= 11, and bits 24+
    # (other faces' bases shifted up) must be masked out
    score3 = (((trips_mask >> 3) * _K3) >> 20) & 0xF
    any5 = _eq_nibble_mask(acc, 5) != 0
    any6 = _eq_nibble_mask(acc, 6) != 0
    set_score = (
        score3 * 100
        + any4.astype(jnp.int32) * 1000
        + any5.astype(jnp.int32) * 2000
        + any6.astype(jnp.int32) * 3000
    )

    ge3 = ((acc + 5 * _M1) & _H8) >> 3  # bit 4f set iff count >= 3
    setmask = ge3 * 0xF  # full nibble where the face is in a set
    set_used = (((acc & setmask) * _M1) >> 20) & 0xF
    lone = acc & ~setmask
    lone_ones = lone & 0xF
    lone_fives = (lone >> 16) & 0xF

    score = jnp.where(special, special_score, set_score + lone_ones * 100 + lone_fives * 50)
    used = jnp.where(special, 6, set_used + lone_ones + lone_fives)
    sf = jnp.where(special, 0, lone_fives)
    so = jnp.where(special, 0, lone_ones)
    return score, used, sf, so


def score_counts_flat(
    counts: list[jax.Array], n_total: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Flat-array twin of :func:`score_counts_vec` (same algebra, same oracle).

    Args:
        counts: six flat int32 arrays, counts of faces 1..6.
        n_total: flat int32, number of dice rolled (== sum of counts).

    Returns:
        ``(score, used, single_fives, single_ones)`` flat int32 arrays.
    """
    is6 = n_total == 6
    pairs = sum(((c == 2).astype(jnp.int32) for c in counts), start=jnp.int32(0))
    trips = sum(((c == 3).astype(jnp.int32) for c in counts), start=jnp.int32(0))
    straight = is6
    for c in counts:
        straight &= c == 1
    three_pairs = is6 & (pairs == 3)
    two_triplets = is6 & (trips == 2)
    four_any = counts[0] == 4
    for c in counts[1:]:
        four_any |= c == 4
    four_plus_pair = is6 & four_any & (pairs == 1)
    special = straight | three_pairs | two_triplets | four_plus_pair
    special_score = jnp.where(two_triplets, 2500, 1500)

    set_score = jnp.zeros_like(n_total)
    set_used = jnp.zeros_like(n_total)
    for face, c in enumerate(counts):
        set_score = set_score + jnp.where(
            c == 3,
            _TRIPLE_SCORES_FLAT[face],
            jnp.where(c == 4, 1000, jnp.where(c == 5, 2000, jnp.where(c == 6, 3000, 0))),
        )
        set_used = set_used + jnp.where(c >= 3, c, 0)

    lone_ones = jnp.where(counts[0] < 3, counts[0], 0)
    lone_fives = jnp.where(counts[4] < 3, counts[4], 0)
    score = jnp.where(special, special_score, set_score + lone_ones * 100 + lone_fives * 50)
    used = jnp.where(special, 6, set_used + lone_ones + lone_fives)
    sf = jnp.where(special, 0, lone_fives)
    so = jnp.where(special, 0, lone_ones)
    return score, used, sf, so
