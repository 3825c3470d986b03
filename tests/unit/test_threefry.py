"""Threefry-2x32-20 known-answer tests (Random123 vectors) + dice sanity."""

import jax.numpy as jnp
import numpy as np

from farkle_ii_tpu.ops.threefry import roll_dice, threefry2x32


def _h(k0, k1, x0, x1):
    a, b = threefry2x32(
        jnp.uint32(k0), jnp.uint32(k1), jnp.uint32(x0), jnp.uint32(x1)
    )
    return int(a), int(b)


def test_known_answer_vectors():
    # Random123 KAT for threefry2x32, 20 rounds (also matched by jax's
    # internal implementation).
    assert _h(0, 0, 0, 0) == (0x6B200159, 0x99BA4EFE)
    assert _h(0x13198A2E, 0x03707344, 0x243F6A88, 0x85A308D3) == (
        0xC4923A9C,
        0x483DF7A0,
    )
    assert _h(0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF) == (
        0x1CB996FC,
        0xBB002BE7,
    )


def test_vectorized_matches_scalar():
    k0 = jnp.arange(8, dtype=jnp.uint32)
    k1 = jnp.full(8, 42, jnp.uint32)
    x0 = jnp.arange(8, dtype=jnp.uint32) * 3
    x1 = jnp.zeros(8, jnp.uint32)
    a, b = threefry2x32(k0, k1, x0, x1)
    for i in range(8):
        assert (int(a[i]), int(b[i])) == _h(i, 42, i * 3, 0)


def test_roll_dice_range_and_determinism():
    k0 = jnp.arange(1000, dtype=jnp.uint32)
    k1 = jnp.full(1000, 7, jnp.uint32)
    r = jnp.zeros(1000, jnp.uint32)
    dice = np.asarray(roll_dice(k0, k1, r))
    assert dice.shape == (1000, 6)
    assert dice.min() >= 1 and dice.max() <= 6
    np.testing.assert_array_equal(dice, np.asarray(roll_dice(k0, k1, r)))
    # distinct rolls differ
    dice2 = np.asarray(roll_dice(k0, k1, r + 1))
    assert (dice != dice2).any()


def test_roll_dice_face_distribution():
    # chi-square sanity over 60k dice: each face ~1/6
    k0 = jnp.arange(2000, dtype=jnp.uint32)
    k1 = jnp.zeros(2000, jnp.uint32)
    rolls = [np.asarray(roll_dice(k0, k1, jnp.full(2000, r, jnp.uint32))) for r in range(5)]
    faces = np.concatenate([d.reshape(-1) for d in rolls])
    counts = np.bincount(faces, minlength=7)[1:]
    n = faces.size
    chi2 = ((counts - n / 6) ** 2 / (n / 6)).sum()
    assert chi2 < 30, (chi2, counts)  # df=5, p~1e-5 cutoff
