"""RNG contract tests: addressability, determinism, chain equivalence."""

import jax
import jax.numpy as jnp
import pytest

from farkle_ii_tpu.ops import rng


def key_bits(key):
    return tuple(int(x) for x in jax.random.key_data(key))


def test_determinism():
    a = rng.coordinate_key(rng.RandomPurpose.TOURNAMENT_PLAYER, root_seed=7, k=2,
                           shuffle_index=3, game_index=11, seat_index=1)
    b = rng.coordinate_key(rng.RandomPurpose.TOURNAMENT_PLAYER, root_seed=7, k=2,
                           shuffle_index=3, game_index=11, seat_index=1)
    assert key_bits(a) == key_bits(b)


def test_coordinate_sensitivity():
    base = dict(root_seed=7, k=2, shuffle_index=3, game_index=11, seat_index=1)
    ref = key_bits(rng.coordinate_key(rng.RandomPurpose.TOURNAMENT_PLAYER, **base))
    for field in base:
        mod = dict(base)
        mod[field] += 1
        assert key_bits(rng.coordinate_key(rng.RandomPurpose.TOURNAMENT_PLAYER, **mod)) != ref
    # purpose namespace separation
    assert key_bits(rng.coordinate_key(rng.RandomPurpose.H2H_PLAYER, **base)) != ref


def test_purpose_namespace_values_are_contract():
    # permanent namespace integers (reference utils/random.py:18-37)
    assert rng.RandomPurpose.INDEXED_SEED == 1
    assert rng.RandomPurpose.PLAYER == 10
    assert rng.RandomPurpose.STRATEGY == 11
    assert rng.RandomPurpose.TOURNAMENT_SHUFFLE == 100
    assert rng.RandomPurpose.SHUFFLE_PERMUTATION == 101
    assert rng.RandomPurpose.TOURNAMENT_GAME == 102
    assert rng.RandomPurpose.TOURNAMENT_PLAYER == 103
    assert rng.RandomPurpose.H2H_PAIR == 200
    assert rng.RandomPurpose.H2H_ORDER == 201
    assert rng.RandomPurpose.H2H_GAME == 202
    assert rng.RandomPurpose.H2H_PLAYER == 203
    assert rng.RandomPurpose.TRUESKILL_DIAGNOSTIC == 300
    assert rng.RandomPurpose.BOOTSTRAP == 400
    assert rng.RandomPurpose.ROOT_STABILITY_BOOTSTRAP == 401
    assert rng.RandomPurpose.TIE_BREAK == 500
    assert rng.RandomPurpose.HGB == 600
    assert rng.RandomPurpose.SEED_SELECTION == 700


def test_base_key_plus_trailing_equals_full_chain():
    base = rng.purpose_base_key(
        rng.RandomPurpose.TOURNAMENT_PLAYER, root_seed=42, k=4, shuffle_index=9
    )
    folded = rng.fold_trailing(base, game_index=5, seat_index=2)
    full = rng.coordinate_key(
        rng.RandomPurpose.TOURNAMENT_PLAYER,
        root_seed=42, k=4, shuffle_index=9, game_index=5, seat_index=2,
    )
    assert key_bits(folded) == key_bits(full)


def test_fold_trailing_vectorized_matches_scalar():
    base = rng.purpose_base_key(rng.RandomPurpose.TOURNAMENT_PLAYER, root_seed=1, k=2)
    g = jnp.arange(4, dtype=jnp.uint32)[:, None]
    s = jnp.arange(2, dtype=jnp.uint32)[None, :]
    batched = rng.fold_trailing(base, game_index=g, seat_index=s)
    data = jax.random.key_data(batched)
    assert data.shape == (4, 2, 2)
    for gi in range(4):
        for si in range(2):
            scalar = rng.fold_trailing(base, game_index=gi, seat_index=si)
            assert tuple(int(x) for x in data[gi, si]) == key_bits(scalar)


def test_large_coordinates_lossless():
    big = 2**40 + 12345
    a = rng.coordinate_key(rng.RandomPurpose.INDEXED_SEED, root_seed=big)
    b = rng.coordinate_key(rng.RandomPurpose.INDEXED_SEED, root_seed=big & 0xFFFFFFFF)
    assert key_bits(a) != key_bits(b)


def test_validation():
    with pytest.raises(ValueError):
        rng.coordinate_key(999999, root_seed=0)
    with pytest.raises(ValueError):
        rng.coordinate_key(rng.RandomPurpose.PLAYER, root_seed=-1)
    with pytest.raises(ValueError):
        rng.coordinate_key(rng.RandomPurpose.PLAYER, root_seed=2**64)


def test_fingerprint_stable_and_scalar():
    fp = rng.coordinate_fingerprint(
        rng.RandomPurpose.TOURNAMENT_GAME, root_seed=5, k=2, shuffle_index=1, game_index=3
    )
    assert isinstance(fp, int)
    assert fp == rng.coordinate_fingerprint(
        rng.RandomPurpose.TOURNAMENT_GAME, root_seed=5, k=2, shuffle_index=1, game_index=3
    )
