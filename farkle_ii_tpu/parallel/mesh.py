"""Device-mesh scale-out for tournament execution.

The reference's main parallel axis is an embarrassingly-parallel shuffle
fan-out over a process pool with pickled counter reduction
(``/root/reference/src/farkle/simulation/run_tournament.py:1337``,
``utils/parallel.py:158``). The TPU-native equivalent implemented here:

* a 1-D ``jax.sharding.Mesh`` over all chips, axis ``"shuffles"``;
* ``shard_map`` splits a batch of shuffle coordinates across devices — each
  chip plays its shuffles' full game batch locally through the fused
  play+aggregate program;
* per-strategy partial aggregates are reduced with ``psum`` over ICI, giving
  replicated exact int32 partials that the host absorbs into int64.

Because game coordinates are semantic (never derived from device placement),
any device count produces identical results — the mesh analogue of the
reference's "changing worker counts never changes results" contract
(docs/turn_and_row_contract.md:29-31).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from farkle_ii_tpu.simulation.tournament import (
    TournamentAggregates,
    TournamentSpec,
    aggregate,
    pack_aggregates,
    pack_result_rows,
    play_and_aggregate,
    play_and_aggregate_block,
    play_shuffles,
)

SHUFFLE_AXIS = "shuffles"


def make_mesh(n_devices: int | None = None, *, backend: str | None = None) -> Mesh:
    """1-D device mesh over the first ``n_devices`` (default: all).

    If the default backend has too few devices, falls back to the ``cpu``
    backend, which honours ``--xla_force_host_platform_device_count`` — this
    lets multi-chip code paths run on virtual CPU devices without touching
    global jax config.
    """
    devices = jax.devices(backend) if backend else jax.devices()
    if n_devices is not None:
        if n_devices > len(devices) and backend is None:
            devices = jax.devices("cpu")
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SHUFFLE_AXIS,))


def sharded_play_and_aggregate(spec: TournamentSpec, mesh: Mesh):
    """Build the jitted multi-chip tournament step for ``spec`` on ``mesh``.

    Returns a function ``(params, shuffle_indices) -> TournamentAggregates``
    where ``shuffle_indices`` has length divisible by the mesh size; each
    device plays ``NS / n_devices`` whole shuffles and partial per-strategy
    aggregates ride ICI via ``psum``.
    """

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(SHUFFLE_AXIS)),
        out_specs=P(),
        # the game-kernel while_loop initializes its carry from constants
        # (unvarying) while the body output varies over the shuffle axis;
        # skip the varying-manual-axes check rather than pvary-ing a
        # 24-leaf carry.
        check_vma=False,
    )
    def run(st, dt, fl, shuffles_local) -> TournamentAggregates:
        agg = play_and_aggregate(spec, (st, dt, fl), shuffles_local)
        return jax.tree.map(lambda x: jax.lax.psum(x, SHUFFLE_AXIS), agg)

    def step(params, shuffle_indices) -> TournamentAggregates:
        st, dt, fl = params
        n_dev = mesh.devices.size
        if len(shuffle_indices) % n_dev != 0:
            raise ValueError(
                f"shuffle batch of {len(shuffle_indices)} not divisible by "
                f"{n_dev} devices"
            )
        return run(st, dt, fl, shuffle_indices)

    return jax.jit(step)


def sharded_block_step(
    spec: TournamentSpec, mesh: Mesh, *, compact: bool = True,
    pad_multiple: int | None = None, game_kwargs: dict | None = None,
):
    """Multi-chip block execution: device-local chunk scan + one psum.

    Input shuffle coordinates have shape ``(n_chunks, span)`` with ``span``
    divisible by the mesh size; each device scans its ``(n_chunks, ns_local)``
    share through the fused chunk program, accumulating a packed int64
    aggregate locally, and the block total rides ICI once per block.
    """

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(None, SHUFFLE_AXIS)),
        out_specs=P(),
        check_vma=False,  # see sharded_play_and_aggregate
    )
    def run(st, dt, fl, shuffles_local):
        lo, hi = play_and_aggregate_block(
            spec, (st, dt, fl), shuffles_local, compact=compact,
            pad_multiple=pad_multiple, game_kwargs=game_kwargs,
        )
        # limbs stay exact under psum: per-device partials are < 2**31 / n_dev
        # for any realistic block, and addition commutes with recombination
        return jax.lax.psum(lo, SHUFFLE_AXIS), jax.lax.psum(hi, SHUFFLE_AXIS)

    def step(params, shuffle_indices_2d):
        st, dt, fl = params
        n_dev = mesh.devices.size
        if shuffle_indices_2d.shape[1] % n_dev != 0:
            raise ValueError(
                f"chunk span of {shuffle_indices_2d.shape[1]} not divisible "
                f"by {n_dev} devices"
            )
        return run(st, dt, fl, shuffle_indices_2d)

    return jax.jit(step)


def sharded_packed_step(
    spec: TournamentSpec, mesh: Mesh, *, compact: bool = True,
    pad_multiple: int | None = None, game_kwargs: dict | None = None,
):
    """Production multi-chip tournament step: packed aggregates over ICI.

    The runner's execution unit: each device plays ``NS / n_devices`` whole
    shuffles of the chunk locally, partial per-strategy aggregates are packed
    into one int32 vector and ``psum``-reduced over the mesh, and the host
    fetches the replicated vector once (same single-fetch contract as the
    single-device packed step). Exactness: psum of int32 partials is the
    same associative integer addition the host accumulator performs, so any
    device count produces bit-identical totals (the mesh analogue of the
    reference's "changing worker counts never changes results",
    run_tournament.py:1337 + utils/parallel.py:158).
    """

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(SHUFFLE_AXIS)),
        out_specs=P(),
        check_vma=False,  # see sharded_play_and_aggregate
    )
    def run(st, dt, fl, shuffles_local):
        agg = play_and_aggregate(
            spec, (st, dt, fl), shuffles_local, compact=compact,
            pad_multiple=pad_multiple, game_kwargs=game_kwargs,
        )
        return jax.lax.psum(pack_aggregates(agg), SHUFFLE_AXIS)

    def step(params, shuffle_indices):
        st, dt, fl = params
        n_dev = mesh.devices.size
        if len(shuffle_indices) % n_dev != 0:
            raise ValueError(
                f"shuffle batch of {len(shuffle_indices)} not divisible by "
                f"{n_dev} devices"
            )
        return run(st, dt, fl, shuffle_indices)

    return jax.jit(step)


def sharded_compact_group_step(
    spec: TournamentSpec, mesh: Mesh, *, family: str = "scan",
    compact: bool = True, pad_multiple: int | None = None,
    game_kwargs: dict | None = None,
):
    """Multi-chip compact-fetch block group: the production dispatch unit.

    Shards the ``(m, nsb)`` group's shuffle axis over the mesh: each device
    plays its ``nsb / n_devices`` shuffles of every block through
    ``play_blocks_compact`` and the three outputs ride ICI once per group —
    per-block counts and both metric limb vectors are sums over shuffles,
    so ``psum`` of device partials is the same associative integer addition
    the single-device program performs (limb decomposition is
    sum-preserving under any grouping; ``lo + (hi << 16)`` recombines to
    the exact total). Bit-identical to the single-device group for any
    device count — asserted by tests and by ``__graft_entry__.dryrun_multichip``.
    """
    from farkle_ii_tpu.simulation.tournament import play_blocks_compact

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(None, SHUFFLE_AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False,  # see sharded_play_and_aggregate
    )
    def run(st, dt, fl, shuffles_local):
        counts, mlo, mhi = play_blocks_compact(
            spec, (st, dt, fl), shuffles_local, family=family,
            compact=compact, pad_multiple=pad_multiple,
            game_kwargs=game_kwargs,
        )
        return (
            jax.lax.psum(counts, SHUFFLE_AXIS),
            jax.lax.psum(mlo, SHUFFLE_AXIS),
            jax.lax.psum(mhi, SHUFFLE_AXIS),
        )

    def step(params, shuffle_indices_2d):
        st, dt, fl = params
        n_dev = mesh.devices.size
        if shuffle_indices_2d.shape[1] % n_dev != 0:
            raise ValueError(
                f"group block span of {shuffle_indices_2d.shape[1]} not "
                f"divisible by {n_dev} devices"
            )
        return run(st, dt, fl, shuffle_indices_2d)

    return jax.jit(step)


def sharded_rows_step(
    spec: TournamentSpec, mesh: Mesh, *, compact: bool = True,
    pad_multiple: int | None = None,
):
    """Multi-chip row-export step: sharded play, gathered packed rows.

    Each device plays ``NS / n_devices`` whole shuffles locally; packed
    per-strategy aggregates ride ICI via ``psum`` (replicated), while the
    packed per-game row buffer stays sharded over the shuffle axis — the
    host fetch assembles it in global shuffle order (device d holds the
    d-th contiguous shuffle slice). This removes the round-2 single-device
    pin on row export (runner.py:377-381 then); the reference writes row
    shards from every pool worker in parallel
    (run_tournament.py:491-513).
    """

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(SHUFFLE_AXIS)),
        out_specs=(P(), P(SHUFFLE_AXIS)),
        check_vma=False,  # see sharded_play_and_aggregate
    )
    def run(st, dt, fl, shuffles_local):
        result, seat_ids = play_shuffles(
            spec, (st, dt, fl), shuffles_local, compact=compact,
            pad_multiple=pad_multiple,
        )
        agg = aggregate(result, seat_ids, spec.n_strategies)
        packed = jax.lax.psum(pack_aggregates(agg), SHUFFLE_AXIS)
        return packed, pack_result_rows(result, seat_ids)

    def step(params, shuffle_indices):
        st, dt, fl = params
        n_dev = mesh.devices.size
        if len(shuffle_indices) % n_dev != 0:
            raise ValueError(
                f"shuffle batch of {len(shuffle_indices)} not divisible by "
                f"{n_dev} devices"
            )
        return run(st, dt, fl, shuffle_indices)

    return jax.jit(step)
