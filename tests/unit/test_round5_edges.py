"""Round-5 edge tests: SWAR scorer specials, envelope families, config.

Cheap host-side tests (no device compiles) pinning the round-5 surfaces:
the nibble-packed SWAR scorer's special patterns, the rows-group and
tie-break envelope logic, and the new TPU config knobs.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np
import pytest

from farkle_ii_tpu.ops import scoring as sc
from farkle_ii_tpu.utils.fault_envelope import load_fault_envelope


def _acc(counts):
    return sum(c << (4 * f) for f, c in enumerate(counts))


def _score(counts):
    n = sum(counts)
    score, used, sf, so = (
        int(np.asarray(x)[0])
        for x in sc.score_packed_flat(
            jnp.asarray([_acc(counts)], dtype=jnp.int32),
            jnp.asarray([n], dtype=jnp.int32),
        )
    )
    return score, used, sf, so


def test_swar_straight():
    assert _score([1, 1, 1, 1, 1, 1]) == (1500, 6, 0, 0)


def test_swar_three_pairs():
    assert _score([2, 2, 0, 2, 0, 0]) == (1500, 6, 0, 0)


def test_swar_two_triplets():
    assert _score([3, 0, 0, 0, 0, 3]) == (2500, 6, 0, 0)


def test_swar_four_plus_pair():
    assert _score([4, 2, 0, 0, 0, 0]) == (1500, 6, 0, 0)


def test_swar_n_of_a_kind_ladder():
    # 4/5/6 of a kind score flat 1000/2000/3000 regardless of face
    assert _score([0, 4, 0, 0, 0, 0]) == (1000, 4, 0, 0)
    assert _score([0, 0, 5, 0, 0, 0]) == (2000, 5, 0, 0)
    assert _score([0, 0, 0, 6, 0, 0]) == (3000, 6, 0, 0)


def test_swar_triples_and_singles_mix():
    # triple 4s (400) + lone 1 (100) + lone 5 (50): 550, 5 dice used
    assert _score([1, 0, 0, 3, 1, 0]) == (550, 5, 1, 1)


def test_swar_farkle_and_lone_counting():
    assert _score([0, 1, 1, 1, 0, 0])[0] == 0  # 2,3,4 of 3: farkle
    # two lone fives + one lone one below set size
    assert _score([1, 0, 0, 0, 2, 0]) == (200, 3, 2, 1)


def test_swar_zero_dice_is_inert():
    assert _score([0, 0, 0, 0, 0, 0]) == (0, 0, 0, 0)


def _env(tmp_path, payload):
    p = tmp_path / "env.json"
    base = {
        "envelope_version": 1, "platform": "cpu", "device_kind": "t",
        "n_strategies": 5160, "probes": [], "ok_shapes": [],
        "block_group_probes": [], "h2h_probes": [], "h2h_ok_batches": [],
    }
    base.update(payload)
    p.write_text(json.dumps(base))
    return load_fault_envelope(p)


def test_rows_group_resolution(tmp_path):
    env = _env(tmp_path, {"rows_group_probes": [
        {"k": 5, "m": 2, "nsb": 43, "ok": True, "games_per_sec": 150_000},
        {"k": 5, "m": 4, "nsb": 43, "ok": True, "games_per_sec": 190_000},
        {"k": 5, "m": 8, "nsb": 43, "ok": False, "games_per_sec": None},
        {"k": 5, "m": 4, "nsb": 64, "ok": True, "games_per_sec": 990_000},
    ]})
    assert env.best_rows_group(5, nsb=43, max_m=100) == 4
    assert env.best_rows_group(5, nsb=43, max_m=3) == 2
    # other nsb values are a different program shape: never transfer
    assert env.best_rows_group(5, nsb=50, max_m=100) is None
    assert env.best_rows_group(3, nsb=43, max_m=100) is None


def test_rows_group_absent_is_none(tmp_path):
    env = _env(tmp_path, {})
    assert env.best_rows_group(5, nsb=43, max_m=100) is None


def test_h2h_window_selection(tmp_path):
    env = _env(tmp_path, {"h2h_window_probes": [
        {"nb": 32, "window": 2048, "ok": True, "games_per_sec": 1_000_000},
        {"nb": 512, "window": 2048, "ok": True, "games_per_sec": 5_000_000},
        {"nb": 1024, "window": 2048, "ok": False, "games_per_sec": None},
    ]})
    assert env.best_h2h_window() == (512, 2048, 5_000_000.0)


def test_config_round5_knobs_roundtrip(tmp_path):
    from farkle_ii_tpu import config as C

    cfg = C.AppConfig()
    assert cfg.tpu.game_impl == "auto"
    assert cfg.tpu.pallas_tile_rows == 16
    assert cfg.sim.row_writer_threads >= 1
    yaml_path = tmp_path / "c.yaml"
    yaml_path.write_text(
        "tpu:\n  game_impl: xla\n  pallas_tile_rows: 8\n"
        "sim:\n  row_writer_threads: 2\n"
    )
    loaded = C.load_app_config(yaml_path)
    assert loaded.tpu.game_impl == "xla"
    assert loaded.tpu.pallas_tile_rows == 8
    assert loaded.sim.row_writer_threads == 2


def test_config_rejects_unknown_tpu_key(tmp_path):
    from farkle_ii_tpu import config as C

    yaml_path = tmp_path / "c.yaml"
    yaml_path.write_text("tpu:\n  game_kernels: pallas\n")
    with pytest.raises(Exception, match="game_kernels|unknown"):
        C.load_app_config(yaml_path)


def test_pallas_slot_layout_is_dense_and_stable():
    from farkle_ii_tpu.ops import pallas_kernel as pk

    for k in (2, 5, 12):
        idx = pk._slot_index(k)
        assert len(idx) == pk.n_slots(k)
        assert sorted(idx.values()) == list(range(pk.n_slots(k)))
    # per-seat slots grow linearly with k
    assert pk.n_slots(12) - pk.n_slots(11) == len(pk._SEAT_SLOTS)


def test_fingerprint_jit_cache_and_determinism():
    from farkle_ii_tpu.simulation import rows as rows_mod

    a = rows_mod.coordinate_fingerprints(
        102, root_seed=7, k=3, shuffle_index=np.arange(4),
        game_index=np.arange(4),
    )
    b = rows_mod.coordinate_fingerprints(
        102, root_seed=7, k=3, shuffle_index=np.arange(4),
        game_index=np.arange(4),
    )
    np.testing.assert_array_equal(a, b)
    c = rows_mod.coordinate_fingerprints(
        102, root_seed=8, k=3, shuffle_index=np.arange(4),
        game_index=np.arange(4),
    )
    assert not np.array_equal(a, c)
    # the jitted kernel is memoized per (purpose, root, k)
    f1 = rows_mod._fingerprint_jit(102, 7, 3)
    f2 = rows_mod._fingerprint_jit(102, 7, 3)
    assert f1 is f2


def test_swar_matches_vec_scorer_on_random_batches():
    rng = np.random.default_rng(5)  # test-only stream
    for n in range(1, 7):
        faces = rng.integers(1, 7, size=(500, 6))
        faces[:, n:] = 0  # inactive lanes
        counts = np.stack(
            [(faces == f).sum(axis=1) for f in range(1, 7)], axis=1
        ).astype(np.int32)
        vec = sc.score_counts_vec(jnp.asarray(counts))
        acc = (counts * (1 << (4 * np.arange(6)))).sum(axis=1).astype(np.int32)
        packed = sc.score_packed_flat(
            jnp.asarray(acc), jnp.asarray(counts.sum(axis=1, dtype=np.int32))
        )
        for a, b in zip(vec, packed):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mixed_radix_face_extraction_matches_manual():
    from farkle_ii_tpu.ops import threefry as tf

    k0 = jnp.asarray([7, 9], dtype=jnp.uint32)
    k1 = jnp.asarray([3, 4], dtype=jnp.uint32)
    r = jnp.asarray([0, 5], dtype=jnp.uint32)
    seat = jnp.asarray([0, 2], dtype=jnp.uint32)
    faces = [np.asarray(f) for f in tf.roll_faces_1h(k0, k1, r, seat)]
    w0, w1 = (np.asarray(w) for w in tf.threefry2x32(k0, k1, r, seat))
    expect = []
    for w in (w0, w1):
        u = w.astype(np.uint64)
        for _ in range(3):
            expect.append((u % 6).astype(np.int32))
            u = u // 6
    for got, want in zip(faces, expect):
        np.testing.assert_array_equal(got, want)
