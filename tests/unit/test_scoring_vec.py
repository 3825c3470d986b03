"""Vectorized device scorer vs host oracle: exhaustive over all count keys."""

import jax.numpy as jnp
import numpy as np

from farkle_ii_tpu.ops import scoring
from farkle_ii_tpu.rules import oracle


def test_score_counts_vec_matches_oracle_exhaustively():
    keys = list(oracle.all_count_keys()) + [(0, 0, 0, 0, 0, 0)]
    counts = jnp.asarray(np.array(keys, dtype=np.int32))
    score, used, sf, so = scoring.score_counts_vec(counts)
    score, used, sf, so = map(np.asarray, (score, used, sf, so))
    for i, key in enumerate(keys):
        expected = oracle.score_counts(key)
        got = (int(score[i]), int(used[i]), int(sf[i]), int(so[i]))
        assert got == expected, f"key={key}: {got} != {expected}"


def test_faces_to_counts_vec():
    faces = jnp.asarray([[1, 5, 5, 0, 0, 0], [6, 6, 6, 6, 6, 6], [0, 0, 0, 0, 0, 0]],
                        dtype=jnp.int32)
    counts = np.asarray(scoring.faces_to_counts_vec(faces))
    np.testing.assert_array_equal(counts[0], [1, 0, 0, 0, 2, 0])
    np.testing.assert_array_equal(counts[1], [0, 0, 0, 0, 0, 6])
    np.testing.assert_array_equal(counts[2], [0, 0, 0, 0, 0, 0])


def test_score_counts_flat_matches_vec_exhaustively():
    """Flat twin == (B, 6) vectorized scorer over all 924+empty count keys."""
    keys = list(oracle.all_count_keys()) + [(0, 0, 0, 0, 0, 0)]
    counts = jnp.asarray(np.array(keys, dtype=np.int32))
    vec = scoring.score_counts_vec(counts)
    flat = scoring.score_counts_flat(
        [counts[:, i] for i in range(6)], counts.sum(axis=1)
    )
    for a, b in zip(vec, flat):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_counts_from_faces_flat_matches_vec():
    rng = np.random.default_rng(7)
    faces_np = rng.integers(0, 7, size=(512, 6)).astype(np.int32)
    vec = scoring.faces_to_counts_vec(jnp.asarray(faces_np))
    flat = scoring.counts_from_faces_flat(
        [jnp.asarray(faces_np[:, i]) for i in range(6)]
    )
    np.testing.assert_array_equal(
        np.asarray(vec), np.stack([np.asarray(c) for c in flat], axis=1)
    )
