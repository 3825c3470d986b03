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
