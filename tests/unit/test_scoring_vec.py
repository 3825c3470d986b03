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
