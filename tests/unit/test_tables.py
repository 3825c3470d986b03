"""Dense scoring table vs. oracle: exhaustive parity + packing round-trip."""

import numpy as np

from farkle_ii_tpu.rules import oracle, tables


def test_pack_unpack_roundtrip():
    for entry in [(0, 0, 0, 0), (3000, 6, 0, 0), (150, 2, 1, 1), (450, 5, 1, 1)]:
        assert tables.unpack_entry(tables.pack_entry(*entry)) == entry


def test_table_matches_oracle_exhaustively():
    packed = tables.build_packed_score_table()
    assert packed.shape == (tables.TABLE_SIZE,)
    assert packed.dtype == np.int32
    nonzero = 0
    for key in oracle.all_count_keys():
        expected = oracle.score_counts(key)
        got = tables.unpack_entry(int(packed[tables.counts_to_index(key)]))
        assert got == expected, f"key={key}"
        if expected[0] > 0:
            nonzero += 1
    assert nonzero > 0


def test_empty_and_unreachable_entries_are_zero():
    packed = tables.build_packed_score_table()
    assert packed[0] == 0  # empty roll
    # a key with more than six dice is unreachable and zero
    assert packed[tables.counts_to_index((6, 6, 0, 0, 0, 0))] == 0


def test_unpacked_tables_consistent_with_packed():
    packed = tables.build_packed_score_table()
    score, used, sf, so = tables.build_unpacked_score_tables()
    idx = np.arange(tables.TABLE_SIZE)
    np.testing.assert_array_equal(score, (packed[idx] >> 0) & 0xFFF)
    np.testing.assert_array_equal(used, (packed[idx] >> 12) & 0x7)
    np.testing.assert_array_equal(sf, (packed[idx] >> 15) & 0x7)
    np.testing.assert_array_equal(so, (packed[idx] >> 18) & 0x7)
