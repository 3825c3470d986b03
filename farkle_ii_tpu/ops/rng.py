"""Coordinate-addressed random streams (TPU-native RNG contract).

The reference derives every random stream from a ``SeedSequence`` whose entropy
is ``(scheme_version, purpose_namespace, *uint32-pairs of semantic
coordinates)`` feeding a PCG64DXSM generator
(``/root/reference/src/farkle/utils/random.py:80-188``). The contract that
matters — and that this module preserves — is *addressability*: a stream is a
pure function of its semantic coordinates
``(purpose, root_seed, k, shuffle_index, pair_id, order, game_index,
seat_index, replicate_index)``; worker/shard assignment, chunking and
execution order are never coordinates, so results are independent of batch
placement and resumable at any block boundary.

On TPU the right primitive is a counter-based PRNG: JAX's threefry2x32 keys
with a :func:`jax.random.fold_in` chain over the same coordinate tuple. Bit
streams intentionally differ from the NumPy reference (different generator
family); acceptance is statistical indistinguishability at matched configs,
plus exact determinism/resumability of this scheme itself.

Every 64-bit coordinate is folded as two 32-bit words (lo, hi) so the chain is
lossless for the full coordinate domain, mirroring the reference's uint32-pair
entropy encoding.
"""

from __future__ import annotations

from enum import IntEnum
from types import MappingProxyType
from typing import Final

import jax
import jax.numpy as jnp

RNG_SCHEME_VERSION: Final = 2
MAX_UINT32: Final = 2**32 - 1
MAX_UINT64: Final = 2**64 - 1


class RandomPurpose(IntEnum):
    """Permanent integer namespaces; existing values must never be renumbered.

    Kept value-for-value compatible with the reference contract
    (``/root/reference/src/farkle/utils/random.py:18-37`` and
    ``docs/rng_contract.md``).
    """

    INDEXED_SEED = 1
    PLAYER = 10
    STRATEGY = 11
    TOURNAMENT_SHUFFLE = 100
    SHUFFLE_PERMUTATION = 101
    TOURNAMENT_GAME = 102
    TOURNAMENT_PLAYER = 103
    H2H_PAIR = 200
    H2H_ORDER = 201
    H2H_GAME = 202
    H2H_PLAYER = 203
    TRUESKILL_DIAGNOSTIC = 300
    BOOTSTRAP = 400
    ROOT_STABILITY_BOOTSTRAP = 401
    TIE_BREAK = 500
    HGB = 600
    SEED_SELECTION = 700


PURPOSE_NAMESPACES = MappingProxyType(
    {purpose.name.lower(): int(purpose) for purpose in RandomPurpose}
)

# Canonical coordinate order for the fold-in chain. Appending new coordinates
# at the end is allowed; reordering or removing existing ones is not.
COORDINATE_ORDER: Final = (
    "root_seed",
    "k",
    "shuffle_index",
    "pair_id",
    "order",
    "game_index",
    "seat_index",
    "replicate_index",
)


def _validate_coordinate(value: int, name: str) -> int:
    if isinstance(value, bool) or not 0 <= int(value) <= MAX_UINT64:
        raise ValueError(f"{name} must be an integer in [0, 2**64 - 1]")
    return int(value)


def coordinate_key(
    purpose: RandomPurpose | int,
    *,
    root_seed: int,
    k: int = 0,
    shuffle_index: int = 0,
    pair_id: int = 0,
    order: int = 0,
    game_index: int = 0,
    seat_index: int = 0,
    replicate_index: int = 0,
) -> jax.Array:
    """Build the typed threefry key for one semantic coordinate tuple.

    Host-side entry point (Python ints). For vectorized per-game/per-seat key
    derivation inside kernels use :func:`fold_coordinates` /
    :func:`jax.random.fold_in` on the partial key this returns.
    """
    try:
        namespace = RandomPurpose(int(purpose))
    except (TypeError, ValueError) as exc:
        raise ValueError(f"unregistered RNG purpose namespace: {purpose!r}") from exc

    key = jax.random.key(RNG_SCHEME_VERSION)
    key = jax.random.fold_in(key, int(namespace))
    values = {
        "root_seed": root_seed,
        "k": k,
        "shuffle_index": shuffle_index,
        "pair_id": pair_id,
        "order": order,
        "game_index": game_index,
        "seat_index": seat_index,
        "replicate_index": replicate_index,
    }
    for name in COORDINATE_ORDER:
        value = _validate_coordinate(values[name], name)
        key = jax.random.fold_in(key, value & MAX_UINT32)
        key = jax.random.fold_in(key, value >> 32)
    return key


def purpose_base_key(
    purpose: RandomPurpose | int,
    *,
    root_seed: int,
    k: int = 0,
    shuffle_index: int = 0,
    pair_id: int = 0,
    order: int = 0,
) -> jax.Array:
    """Partial fold-in chain over the *static* coordinates of a purpose.

    Returns a key folded over ``(scheme, purpose, root_seed, k,
    shuffle_index, pair_id, order)``. Kernels then fold the dynamic trailing
    coordinates ``(game_index, seat_index, replicate_index)`` — in that
    order, lo word then hi word each — via :func:`fold_trailing`, which is
    exactly equivalent to calling :func:`coordinate_key` with the full tuple.
    """
    try:
        namespace = RandomPurpose(int(purpose))
    except (TypeError, ValueError) as exc:
        raise ValueError(f"unregistered RNG purpose namespace: {purpose!r}") from exc
    key = jax.random.key(RNG_SCHEME_VERSION)
    key = jax.random.fold_in(key, int(namespace))
    values = {
        "root_seed": root_seed,
        "k": k,
        "shuffle_index": shuffle_index,
        "pair_id": pair_id,
        "order": order,
    }
    for name in ("root_seed", "k", "shuffle_index", "pair_id", "order"):
        value = _validate_coordinate(values[name], name)
        key = jax.random.fold_in(key, value & MAX_UINT32)
        key = jax.random.fold_in(key, value >> 32)
    return key


def fold_trailing(
    base_key: jax.Array,
    *,
    game_index: jax.Array | int = 0,
    seat_index: jax.Array | int = 0,
    replicate_index: jax.Array | int = 0,
) -> jax.Array:
    """Fold the dynamic trailing coordinates onto a :func:`purpose_base_key`.

    Traceable: the coordinates may be (broadcast-compatible) JAX arrays; the
    result is a key array of the broadcast shape. Dynamic coordinates are
    assumed < 2**32 (game/seat/replicate indices always are), so the hi word
    folds a constant zero to stay chain-compatible with
    :func:`coordinate_key`.
    """

    def _fold(key, g, s, r):
        for value in (g, s, r):
            key = jax.random.fold_in(key, value)
            key = jax.random.fold_in(key, 0)
        return key

    g = jnp.asarray(game_index, dtype=jnp.uint32)
    s = jnp.asarray(seat_index, dtype=jnp.uint32)
    r = jnp.asarray(replicate_index, dtype=jnp.uint32)
    shape = jnp.broadcast_shapes(g.shape, s.shape, r.shape)
    if shape == ():
        return _fold(base_key, g, s, r)
    g, s, r = (jnp.broadcast_to(x, shape).reshape(-1) for x in (g, s, r))
    flat = jax.vmap(_fold, in_axes=(None, 0, 0, 0))(base_key, g, s, r)
    return flat.reshape(shape)


def scheme_purpose_key(purpose: RandomPurpose | int) -> jax.Array:
    """Key folded over ``(scheme, purpose)`` only — prefix for vectorized use."""
    try:
        namespace = RandomPurpose(int(purpose))
    except (TypeError, ValueError) as exc:
        raise ValueError(f"unregistered RNG purpose namespace: {purpose!r}") from exc
    key = jax.random.key(RNG_SCHEME_VERSION)
    return jax.random.fold_in(key, int(namespace))


def vector_coordinate_keys(
    purpose: RandomPurpose | int,
    *,
    root_seed: int,
    k: int = 0,
    shuffle_index: jax.Array | int = 0,
    pair_id: jax.Array | int = 0,
    order: jax.Array | int = 0,
    game_index: jax.Array | int = 0,
    seat_index: jax.Array | int = 0,
    replicate_index: jax.Array | int = 0,
) -> jax.Array:
    """Traceable, broadcast-vectorized :func:`coordinate_key`.

    ``root_seed`` and ``k`` are host ints (folded losslessly as two words);
    the remaining coordinates may be JAX arrays (assumed < 2**32, true for
    every index coordinate) and are broadcast together. Returns a key array of
    the broadcast shape, chain-identical to :func:`coordinate_key` at each
    coordinate tuple.
    """
    key = scheme_purpose_key(purpose)
    for value in (root_seed, k):
        v = _validate_coordinate(value, "root_seed/k")
        key = jax.random.fold_in(key, v & MAX_UINT32)
        key = jax.random.fold_in(key, v >> 32)

    arrays = [
        jnp.asarray(x, dtype=jnp.uint32)
        for x in (shuffle_index, pair_id, order, game_index, seat_index, replicate_index)
    ]
    shape = jnp.broadcast_shapes(*(a.shape for a in arrays))

    def _fold(kk, coords):
        for value in coords:
            kk = jax.random.fold_in(kk, value)
            kk = jax.random.fold_in(kk, 0)
        return kk

    if shape == ():
        return _fold(key, arrays)
    flat = [jnp.broadcast_to(a, shape).reshape(-1) for a in arrays]
    keys = jax.vmap(lambda *cs: _fold(key, cs))(*flat)
    return keys.reshape(shape)


def tournament_player_key(
    *, root_seed: int, k: int, shuffle_index: int, game_index: int, seat_index: int
) -> jax.Array:
    """Seat stream for one tournament game (namespace 103)."""
    return coordinate_key(
        RandomPurpose.TOURNAMENT_PLAYER,
        root_seed=root_seed,
        k=k,
        shuffle_index=shuffle_index,
        game_index=game_index,
        seat_index=seat_index,
    )


def h2h_player_key(
    *, root_seed: int, pair_id: int, order: int, attempt_index: int, seat_index: int
) -> jax.Array:
    """Seat stream for one head-to-head attempt (namespace 203)."""
    return coordinate_key(
        RandomPurpose.H2H_PLAYER,
        root_seed=root_seed,
        k=2,
        pair_id=pair_id,
        order=order,
        game_index=attempt_index,
        seat_index=seat_index,
    )


def coordinate_numpy_rng(
    purpose: RandomPurpose | int,
    *,
    root_seed: int,
    k: int = 0,
    shuffle_index: int = 0,
    pair_id: int = 0,
    order: int = 0,
    game_index: int = 0,
    seat_index: int = 0,
    replicate_index: int = 0,
):
    """Host-side coordinate-addressed NumPy generator (analysis randomness).

    Device streams are threefry; host-side statistical machinery (bootstrap
    resampling, HGB folds, TrueSkill diagnostics) uses NumPy generators
    seeded from a ``SeedSequence`` whose entropy is the same
    ``(scheme, purpose, *uint32-pairs)`` coordinate layout as the reference
    contract (``utils/random.py:80-188``) — addressable, independent, and
    never derived from execution order.
    """
    import numpy as np

    try:
        namespace = RandomPurpose(int(purpose))
    except (TypeError, ValueError) as exc:
        raise ValueError(f"unregistered RNG purpose namespace: {purpose!r}") from exc
    entropy: list[int] = [RNG_SCHEME_VERSION, int(namespace)]
    values = {
        "root_seed": root_seed,
        "k": k,
        "shuffle_index": shuffle_index,
        "pair_id": pair_id,
        "order": order,
        "game_index": game_index,
        "seat_index": seat_index,
        "replicate_index": replicate_index,
    }
    for name in COORDINATE_ORDER:
        value = _validate_coordinate(values[name], name)
        entropy.extend([value & MAX_UINT32, value >> 32])
    return np.random.Generator(np.random.PCG64DXSM(np.random.SeedSequence(entropy)))


def coordinate_fingerprint(
    purpose: RandomPurpose | int,
    *,
    root_seed: int,
    k: int = 0,
    shuffle_index: int = 0,
    pair_id: int = 0,
    order: int = 0,
    game_index: int = 0,
    seat_index: int = 0,
    replicate_index: int = 0,
) -> int:
    """Collision-tolerant diagnostic fingerprint for a coordinate tuple.

    Mirrors the reference's ``coordinate_seed`` (random.py:191): a reduced
    scalar for provenance columns (``shuffle_seed``, ``game_seed``) that is
    *never* used as an RNG root.
    """
    key = coordinate_key(
        purpose,
        root_seed=root_seed,
        k=k,
        shuffle_index=shuffle_index,
        pair_id=pair_id,
        order=order,
        game_index=game_index,
        seat_index=seat_index,
        replicate_index=replicate_index,
    )
    data = jax.random.key_data(key)
    return int((int(data[0]) << 32) | int(data[1]))
