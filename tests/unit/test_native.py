"""Native C++ scoring oracle vs Python oracle/tables: exact agreement."""

import numpy as np
import pytest

from farkle_ii_tpu import native
from farkle_ii_tpu.rules import oracle, tables

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_score_counts_exhaustive():
    for key in oracle.all_count_keys():
        assert native.score_counts(key) == oracle.score_counts(key), key


def test_table_matches_python_builder_bytes():
    np.testing.assert_array_equal(
        native.build_score_table(), tables.build_packed_score_table()
    )


def test_batch_scorer_random_rolls():
    rng = np.random.default_rng(0)
    n = 50_000
    faces = np.zeros((n, 6), dtype=np.int8)
    for i in range(n):
        d = rng.integers(1, 7)
        faces[i, :d] = rng.integers(1, 7, size=d)
    out = native.score_rolls(faces)
    # spot-check a sample against the Python oracle
    for i in rng.integers(0, n, size=200):
        active = [int(x) for x in faces[i] if x > 0]
        assert tuple(out[i]) == oracle.score_faces(active)


def test_batch_scorer_validation():
    with pytest.raises(ValueError):
        native.score_rolls(np.zeros((3, 5), dtype=np.int8))
    with pytest.raises(ValueError):
        native.score_counts([1, 2, 3])
