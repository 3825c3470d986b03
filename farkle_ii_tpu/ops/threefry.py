"""Hand-rolled Threefry-2x32 (20 rounds) for the game-kernel hot path.

The first kernel iteration drew dice with ``vmap(jax.random.fold_in)`` +
``vmap(jax.random.randint)``; the vmapped key plumbing bloated the while-loop
body HLO (slow axon compiles) and ran more hashes than necessary. This module
implements the public Threefry-2x32-20 block cipher (Salmon et al.,
"Parallel Random Numbers: As Easy as 1, 2, 3", SC'11) directly on flat uint32
arrays — one clean vectorized HLO, validated against the Random123
known-answer vectors (which JAX's own implementation also matches).

Dice generation: each roll consumes three counter blocks
``(roll_index, j), j in {0, 1, 2}`` of the per-seat key, yielding six uint32
words; each die is ``word % 6 + 1`` (modulo bias 2^-30 — equivalent to
jax.random.randint's own bias class).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PARITY = 0x1BD11BDA  # python int: keeps pallas kernels constant-free
# rotation schedule: groups alternate between these two quadruples
_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)


def _rotl(x: jax.Array, d: int) -> jax.Array:
    return (x << d) | (x >> (32 - d))


def threefry2x32(
    k0: jax.Array, k1: jax.Array, x0: jax.Array, x1: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Threefry-2x32, 20 rounds. All args broadcastable uint32 arrays."""
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    x0 = jnp.asarray(x0, jnp.uint32)
    x1 = jnp.asarray(x1, jnp.uint32)
    ks = (k0, k1, k0 ^ k1 ^ jnp.uint32(_PARITY))

    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for group in range(5):
        rots = _ROT_A if group % 2 == 0 else _ROT_B
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x1 ^ x0
        x0 = x0 + ks[(group + 1) % 3]
        x1 = x1 + ks[(group + 2) % 3] + jnp.uint32(group + 1)
    return x0, x1


def roll_dice_words(
    k0: jax.Array,
    k1: jax.Array,
    roll_index: jax.Array,
    seat_index: jax.Array | int = 0,
) -> list[jax.Array]:
    """Six per-die uniform sources from two hashes (shared by XLA + pallas).

    The key addresses a *game* stream; the counter words address the draw
    within it: ``x0 = roll_index`` (the seat's monotonic roll counter) and
    ``x1 = seat_index * 4 + block`` for the two hash blocks — unique per
    (seat, roll, block), so seat streams are independent without per-seat key
    folds (which dominated key-derivation cost at 12 hashes per seat-game).

    Dice 0-3 draw from full 32-bit words (modulo bias 2^-30, the same class
    as jax.random.randint); dice 4-5 draw from the high 16 bits of the first
    two words (bias ~1e-5 relative, near-independent of the full-word
    draws). Every bias is orders of magnitude below the framework's
    statistical resolution contracts.
    """
    r = jnp.asarray(roll_index, jnp.uint32)
    salt = jnp.asarray(seat_index, jnp.uint32) * 4
    w0, w1 = threefry2x32(k0, k1, r, salt)
    w2, w3 = threefry2x32(k0, k1, r, salt + 1)
    return [w0, w1, w2, w3, w0 >> 16, w1 >> 16]


def roll_faces_1h(
    k0: jax.Array,
    k1: jax.Array,
    roll_index: jax.Array,
    seat_index: jax.Array | int = 0,
) -> list[jax.Array]:
    """Six per-die faces (0..5) from ONE threefry hash (dice stream v2).

    Counter words: ``x0 = roll_index``, ``x1 = seat_index`` — one block per
    (seat, roll). Each 32-bit output word yields three dice by mixed-radix
    base-6 extraction (``w % 6``, ``w//6 % 6``, ``w//36 % 6``): the joint
    triple is ``w mod 216`` whose bias is ``(2^32 mod 216)/2^32 ~ 1.5e-8`` —
    three orders of magnitude below the 16-bit-half bias the two-hash scheme
    already accepted, at half the hash cost (the v1 scheme's two hashes were
    ~17% of the roll-step's vector ops). XLA lowers the constant divisions
    to multiply-high sequences and CSEs the shared quotients, so extraction
    is also cheaper than v1's six independent ``% 6``.
    """
    r = jnp.asarray(roll_index, jnp.uint32)
    salt = jnp.asarray(seat_index, jnp.uint32)
    w0, w1 = threefry2x32(k0, k1, r, salt)
    faces = []
    for w in (w0, w1):
        u = w
        for _ in range(3):
            faces.append((u % jnp.uint32(6)).astype(jnp.int32))
            u = u // jnp.uint32(6)
    return faces


def roll_dice(
    k0: jax.Array,
    k1: jax.Array,
    roll_index: jax.Array,
    seat_index: jax.Array | int = 0,
    scheme: str = "1h",
) -> jax.Array:
    """Six dice in [1, 6] per (game key, seat, roll). Shapes: (B,) -> (B, 6).

    Deterministic pure function of ``(key, seat_index, roll_index, scheme)``
    — the in-kernel leaf of the coordinate-addressed RNG contract. The
    default ``"1h"`` scheme (stream v2) matches the production kernel; pass
    ``"2h"`` for the round-1/2 stream.
    """
    if scheme == "1h":
        faces = roll_faces_1h(k0, k1, roll_index, seat_index)
        return jnp.stack(faces, axis=-1) + 1
    words = roll_dice_words(k0, k1, roll_index, seat_index)
    dice = jnp.stack(words, axis=-1)  # (B, 6) uint32
    return (dice % jnp.uint32(6)).astype(jnp.int32) + 1
