"""Config-driven tournament runner: plan -> execute -> checkpoint -> publish.

The TPU-native counterpart of the reference runner
(``/root/reference/src/farkle/simulation/runner.py:748-1106``) and tournament
driver (``run_tournament.py:979``). Differences by design:

* the execution unit is a *device batch* of whole shuffles played by the
  fused XLA program (one dispatch), not a process-pool chunk;
* recovery granularity is the deterministic batch block from the workload
  plan: per-block exact int64 aggregates are persisted as ``.npz`` sidecar'd
  artifacts, and resume = absorb completed blocks (order-independent exact
  addition) + re-run the rest. Changing device counts or batch sizes never
  changes results because every game's RNG is coordinate-addressed;
* the pre-run throughput probe plays a handful of shuffles through the
  compiled step (reference ``:536 _measure_throughput`` analogue).

Published artifacts keep the reference layout: ``{n}p_checkpoint.parquet``
(per-strategy outcome summary), ``{n}p_metrics.parquet`` (expanded
sums/square-sums), ``strategy_manifest.parquet``, workload plan JSON, NDJSON
manifest events, and a content-authenticated ``simulation.done.json``.
"""

from __future__ import annotations

import io
import logging
import time
from collections import deque

import jax
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable

import numpy as np
import pyarrow as pa

from farkle_ii_tpu.config import AppConfig, compute_stage_config_sha
from farkle_ii_tpu.ops import game_kernel as gk
from farkle_ii_tpu.simulation import strategies as S
from farkle_ii_tpu.simulation import tournament as T
from farkle_ii_tpu.simulation.workload import (
    TournamentWorkloadPlan,
    WorkloadCapExceeded,
    plan_tournament_workload,
)
from farkle_ii_tpu.utils import manifest as mf
from farkle_ii_tpu.utils.artifacts import (
    make_sidecar,
    validate_sidecar,
    write_parquet_artifact_atomic,
)
from farkle_ii_tpu.parallel.distributed import host_partition, owns_block
from farkle_ii_tpu.utils.fault_envelope import load_fault_envelope
from farkle_ii_tpu.utils.stage_completion import write_stage_done
from farkle_ii_tpu.utils.writer import atomic_path, write_json_atomic

logger = logging.getLogger(__name__)

# how many deterministic blocks may be dispatched ahead of absorption
PIPELINE_BLOCK_DEPTH = 4

# how long the finalizing host waits for peers' block artifacts
_PEER_BLOCK_TIMEOUT_S = 3600.0

SIM_STATE_VERSION = 1


# smallest k at which the gridded pallas mega-kernel beats the XLA
# while-loop kernel on v5e. The equal-batch impl race (results/
# impl_race.json) put the crossover at k=6, but on the PRODUCTION m=67
# group program (4.4M games per dispatch) pallas also wins k=5 by 9%
# (1.454M vs 1.331M games/s, round-5 A/B) while k<=4 stays clearly XLA
# (k=4: 1.64M vs 1.30M; k=3: 2.13M vs 0.98M) — the crossover is batch-
# size dependent and production batches are the relevant regime.
PALLAS_MIN_K = 5


def resolve_game_impl(configured: str, k: int) -> str:
    """Per-k game-kernel implementation under ``tpu.game_impl``.

    "auto" picks the measured-faster kernel for the player count;
    explicit "xla"/"pallas" force it. Execution-only — the kernels are
    bit-identical (tests/unit/test_pallas_kernel.py).
    """
    if configured == "auto":
        # Mosaic kernels only compile for real TPU backends; CPU (including
        # the virtual test meshes) always takes the XLA kernel
        on_tpu = jax.devices()[0].platform != "cpu"
        return "pallas" if on_tpu and k >= PALLAS_MIN_K else "xla"
    if configured not in ("xla", "pallas"):
        raise ValueError(f"unknown tpu.game_impl {configured!r}")
    return configured


def resolve_strategies(cfg: AppConfig) -> list[S.ThresholdStrategy]:
    """Materialize the configured strategy grid with deterministic ids."""
    return S.build_strategy_grid(
        score_thresholds=cfg.sim.score_thresholds,
        dice_thresholds=cfg.sim.dice_thresholds,
        smart_five_opts=cfg.sim.smart_five_opts,
        smart_one_opts=cfg.sim.smart_one_opts,
        consider_score_opts=cfg.sim.consider_score_opts,
        consider_dice_opts=cfg.sim.consider_dice_opts,
        auto_hot_dice_opts=cfg.sim.auto_hot_dice_opts,
        run_up_score_opts=cfg.sim.run_up_score_opts,
        include_stop_at=cfg.sim.include_stop_at,
        include_stop_at_heuristic=cfg.sim.include_stop_at_heuristic,
    )


def validate_player_counts(cfg: AppConfig, n_strategies: int) -> None:
    """Every configured player count must divide the grid size."""
    bad = [k for k in cfg.sim.n_players_list if n_strategies % int(k) != 0]
    if bad:
        raise ValueError(
            f"strategy grid size {n_strategies} is not divisible by player "
            f"counts {bad}; adjust the grid or n_players_list"
        )


def build_strategy_manifest_table(strategies: list[S.ThresholdStrategy]) -> pa.Table:
    rows = []
    for s in strategies:
        row = dict(zip(S.STRATEGY_TUPLE_FIELDS, S.strategy_tuple(s), strict=True))
        row["favor_dice_or_score"] = str(row["favor_dice_or_score"])
        row["strategy_id"] = s.strategy_id
        row["strategy_str"] = str(s)
        rows.append(row)
    return pa.Table.from_pylist(rows)


# ─────────────────────────────────────────────────────────────────────────────
# Per-block persistence
# ─────────────────────────────────────────────────────────────────────────────


def _block_path(cfg: AppConfig, n: int, batch_id: int) -> Path:
    return cfg.n_players_dir(n) / "blocks" / f"block_{batch_id:06d}.npz"


def save_block_aggregate(
    path: Path,
    acc: T.TournamentAccumulator,
    *,
    batch_id: int,
    coordinates: dict | None = None,
) -> None:
    state = acc.state_dict()
    buf = io.BytesIO()
    # uncompressed: filled aggregates are near-incompressible int64 noise,
    # and the ~100 ms/block of zlib ran on the absorb critical path (~86 s
    # of a mega run); plain npz is ~2 ms
    np.savez(
        buf,
        **{k: np.asarray(v) for k, v in state.items()},
        batch_id=np.asarray(batch_id),
    )
    with atomic_path(path) as tmp:
        Path(tmp).write_bytes(buf.getvalue())
    make_sidecar(
        path, producer="simulation", scope="by_k",
        metadata={"batch_id": batch_id, **(coordinates or {})},
    )


def load_block_aggregate(
    path: Path, *, expected_coordinates: dict | None = None,
    allow_counts_only: bool = False,
) -> T.TournamentAccumulator:
    """Load one persisted block, cross-checking its semantic coordinates.

    Resume must never trust a block just because its bytes validate: the
    reference re-derives every expected shuffle seed and cross-checks
    manifests before accepting resume state (runner.py:536-745). Here the
    equivalent is exact coordinate identity — the sidecar's recorded
    (root_seed, k, shuffle range, plan shape) must match what the current
    plan derives for this batch id, and the stored batch_id and conserved
    game counts must agree.
    """
    meta = validate_sidecar(path, expected_producer="simulation").get("metadata", {})
    if meta.get("counts_only") and not allow_counts_only:
        # the block's metric sums live in its group artifact; absorbing the
        # npz alone would silently drop them
        raise ValueError(
            f"block {path.name} is counts-only; its metrics require the "
            "group artifact"
        )
    with np.load(path) as data:
        state = {k: data[k] for k in data.files if k != "batch_id"}
        stored_batch = int(data["batch_id"])
    state["n_strategies"] = int(state["n_strategies"])
    state["games_attempted"] = int(state["games_attempted"])
    state["games_completed"] = int(state["games_completed"])
    state["games_safety_limit"] = int(state["games_safety_limit"])
    acc = T.TournamentAccumulator.from_state_dict(state)
    if expected_coordinates is not None:
        mismatches = {
            key: (meta.get(key), expected)
            for key, expected in expected_coordinates.items()
            if meta.get(key) != expected
        }
        if stored_batch != expected_coordinates.get("batch_id", stored_batch):
            mismatches["stored_batch_id"] = (stored_batch, expected_coordinates["batch_id"])
        expected_games = (
            expected_coordinates["shuffle_hi"] - expected_coordinates["shuffle_lo"]
        ) * expected_coordinates["games_per_shuffle"]
        if acc.games_attempted != expected_games:
            mismatches["games_attempted"] = (acc.games_attempted, expected_games)
        if mismatches:
            raise ValueError(
                f"block {path.name} does not match expected coordinates: {mismatches}"
            )
    return acc


def _group_metrics_path(cfg: AppConfig, n: int, lo: int, hi: int) -> Path:
    return cfg.n_players_dir(n) / "blocks" / f"group_{lo:06d}_{hi:06d}_metrics.npz"


def save_group_metrics(
    path: Path, sums: np.ndarray, sq: np.ndarray, *, coordinates: dict
) -> None:
    """Persist one block group's int64 metric totals (compact-fetch path)."""
    buf = io.BytesIO()
    np.savez(buf, metric_sums=sums, metric_sq_sums=sq)
    with atomic_path(path) as tmp:
        Path(tmp).write_bytes(buf.getvalue())
    make_sidecar(
        path, producer="simulation", scope="by_k", metadata=coordinates
    )


def load_group_metrics(
    path: Path, *, expected_coordinates: dict
) -> tuple[np.ndarray, np.ndarray]:
    meta = validate_sidecar(path, expected_producer="simulation").get("metadata", {})
    mismatches = {
        key: (meta.get(key), expected)
        for key, expected in expected_coordinates.items()
        if meta.get(key) != expected
    }
    if mismatches:
        raise ValueError(
            f"group metrics {path.name} does not match expected coordinates: "
            f"{mismatches}"
        )
    with np.load(path) as data:
        return (
            data["metric_sums"].astype(np.int64),
            data["metric_sq_sums"].astype(np.int64),
        )


def _write_row_shard(
    cfg: AppConfig,
    *,
    n: int,
    spec: T.TournamentSpec,
    batch_id: int,
    shuffle_lo: int,
    shuffle_hi: int,
    result,
    seat_ids: np.ndarray,
) -> Path:
    """Publish one per-device-chunk row shard + manifest line.

    Shard naming follows the reference pattern
    ``rows_{root}_{k}p_{shuffle:012d}.parquet`` keyed by the chunk's first
    shuffle (run_tournament.py:491-513); one shard covers a contiguous
    shuffle range instead of a single shuffle because the device plays whole
    chunks at once.
    """
    from farkle_ii_tpu.ops import rng as _rng
    from farkle_ii_tpu.simulation import rows as rows_mod

    g = spec.games_per_shuffle
    ns = shuffle_hi - shuffle_lo
    shuffle_per_game = np.repeat(np.arange(shuffle_lo, shuffle_hi, dtype=np.int64), g)
    game_index = np.tile(np.arange(g, dtype=np.int32), ns)
    shuffle_seed = rows_mod.coordinate_fingerprints(
        _rng.RandomPurpose.TOURNAMENT_SHUFFLE,
        root_seed=spec.root_seed, k=spec.k,
        shuffle_index=shuffle_per_game,
    )
    game_seed = rows_mod.coordinate_fingerprints(
        _rng.RandomPurpose.TOURNAMENT_GAME,
        root_seed=spec.root_seed, k=spec.k,
        shuffle_index=shuffle_per_game, game_index=game_index,
    )
    table = rows_mod.rows_table(
        result,
        seat_ids,
        root_seed=spec.root_seed,
        k=spec.k,
        shuffle_index=shuffle_per_game,
        game_index=game_index,
        deterministic_batch_id=batch_id,
        shuffle_seed=shuffle_seed,
        game_seed=game_seed,
    )
    rows_dir = cfg.rows_dir(n)
    shard = rows_dir / f"rows_{spec.root_seed}_{spec.k}p_{shuffle_lo:012d}.parquet"
    write_parquet_artifact_atomic(
        table, shard, producer="simulation", scope="by_k",
        metadata={
            "k": spec.k, "root_seed": spec.root_seed,
            "shuffle_lo": shuffle_lo, "shuffle_hi": shuffle_hi,
            "deterministic_batch_id": batch_id, "n_rows": table.num_rows,
        },
    )
    mf.append_manifest_line(
        rows_dir / "rows_manifest.ndjson",
        {
            "kind": "row_shard", "name": shard.name, "k": spec.k,
            "root_seed": spec.root_seed, "shuffle_lo": shuffle_lo,
            "shuffle_hi": shuffle_hi, "deterministic_batch_id": batch_id,
            "n_rows": table.num_rows,
        },
    )
    return shard, table


# ─────────────────────────────────────────────────────────────────────────────
# Execution
# ─────────────────────────────────────────────────────────────────────────────


@dataclass
class CellRunResult:
    """Outcome of one (root, k) cell run."""

    plan: TournamentWorkloadPlan
    accumulator: T.TournamentAccumulator
    completed_batches: list[int]
    resumed_batches: list[int]
    elapsed_seconds: float
    games_per_second: float
    # False on a non-finalizing multi-host worker: its blocks are published
    # but the cell totals were not assembled (host 0 finalizes)
    finalized: bool = True


def _compile_step(
    spec: T.TournamentSpec, params, ns: int, use_aot_cache: bool, *,
    with_rows: bool = False, compact: bool = True, pad_multiple: int | None = None,
    game_kwargs: dict | None = None, wide_rows: bool = False,
):
    import jax
    import jax.numpy as jnp

    # aggregates are packed into one int32 vector on device: remote backends
    # pay a full round-trip per fetched array, so one buffer per chunk
    if with_rows:
        row_format = "wide" if wide_rows else "bits"

        def fn(params, sh):
            out = T.play_and_aggregate_with_rows(
                spec, params, sh, compact=compact, pad_multiple=pad_multiple,
                row_format=row_format,
            )
            if row_format == "bits":
                agg, words, overflow = out
                return T.pack_aggregates(agg), words, overflow
            agg, packed_rows = out
            return T.pack_aggregates(agg), packed_rows

        if game_kwargs:
            raise ValueError("game_kwargs unsupported on the row-export path")

    else:

        def fn(params, sh):
            return T.pack_aggregates(
                T.play_and_aggregate(
                    spec, params, sh, compact=compact, pad_multiple=pad_multiple,
                    game_kwargs=game_kwargs,
                )
            )

    if use_aot_cache:
        from farkle_ii_tpu.utils.aot_cache import cached_compile

        compiled = cached_compile(
            fn,
            params,
            jnp.arange(ns, dtype=jnp.uint32),
            extra_key=f"tournament-k{spec.k}-s{spec.n_strategies}-ns{ns}"
            f"-t{spec.target_score}-r{spec.max_rounds}-rows{int(with_rows)}"
            f"-p{pad_multiple}"
            + ("-widerows" if (with_rows and wide_rows) else "")
            + ("" if compact else "-nocompact"),
        )
        return compiled
    return jax.jit(fn)


def run_cell(
    cfg: AppConfig,
    *,
    n: int,
    strategies: list[S.ThresholdStrategy],
    run_id: str,
    progress: Callable[[str], None] | None = None,
) -> CellRunResult:
    """Run (resume) the tournament for one player count under the plan."""
    import jax
    import jax.numpy as jnp

    spec = T.TournamentSpec(
        root_seed=cfg.sim.seed, k=int(n), n_strategies=len(strategies)
    )
    plan = plan_tournament_workload(
        root_seed=cfg.sim.seed,
        k=int(n),
        strategy_count=len(strategies),
        resolution_delta=cfg.screening.resolution_delta,
        confidence=cfg.screening.interval_confidence,
        batch_count=cfg.batching.target_batches,
        min_shuffles_per_batch=cfg.batching.min_shuffles_per_batch,
        shuffle_cap=cfg.screening.max_shuffles_per_root_k,
        projected_games_per_second=cfg.screening.projected_games_per_second,
    )
    if plan.cap_exceeded:
        raise WorkloadCapExceeded(plan)

    p = S.pack_strategy_params(strategies)
    params = (
        jnp.asarray(p.score_threshold),
        jnp.asarray(p.dice_threshold),
        jnp.asarray(p.flags),
    )

    with_rows = cfg.sim.row_dir is not None
    compact = cfg.tpu.straggler_compaction

    # device-batch sizing: sub-chunk each deterministic batch block. A probed
    # fault-envelope artifact (tpu.fault_envelope_path) overrides the
    # configured chunk size with the largest measured-fault-free shape for
    # this k — chunk size never affects results (execution invariance), only
    # device utilization and the fault risk.
    envelope = load_fault_envelope(
        cfg.tpu.fault_envelope_path, n_strategies=len(strategies)
    )
    configured_ns = min(
        cfg.sim.shuffles_per_device_batch,
        min(T.MAX_SHUFFLES_PER_BATCH, plan.shuffles_per_batch),
    )
    ns_device, compact = _resolve_cell_chunk(cfg, n, plan, envelope)
    if (ns_device, compact) != (configured_ns, cfg.tpu.straggler_compaction):
        logger.info(
            "k=%d: device chunk %d shuffles (compaction %s) from the probed "
            "fault envelope (configured %d)",
            n, ns_device, "on" if compact else "off", configured_ns,
        )

    # multi-chip: shard whole shuffles over the device mesh (the production
    # analogue of the reference's process-pool shuffle fan-out,
    # run_tournament.py:1337). Row export shards too: each device's packed
    # row buffer stays sharded over the shuffle axis and the host assembles
    # it in global shuffle order (parallel/mesh.sharded_rows_step) — the
    # round-2 single-device pin is gone.
    avail = jax.devices()
    requested = cfg.tpu.mesh_devices or len(avail)
    n_mesh = max(1, min(int(requested), len(avail)))
    mesh = None
    if n_mesh > 1:
        from farkle_ii_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_mesh)
        logger.info("k=%d: sharding shuffles over %d devices", n, n_mesh)
    elif cfg.tpu.mesh_devices and cfg.tpu.mesh_devices > 1:
        logger.info(
            "k=%d: mesh of %s requested but only %d device(s); running "
            "single-device", n, cfg.tpu.mesh_devices, len(avail),
        )

    pad_multiple = int(cfg.tpu.compact_pad_multiple)
    # execution-only kernel tuning (sweep-derived; cannot change results).
    # The row-export path keeps kernel defaults: its step signature differs
    # and the tuning target is the aggregate-only production route.
    game_kwargs: dict | None = None
    ratios = tuple(int(r) for r in cfg.tpu.compact_ratios)
    cadence = int(cfg.tpu.cond_check_every)
    if (ratios, cadence) != ((8, 64, 512), 8):
        game_kwargs = {"compact_ratios": ratios, "cond_check_every": cadence}
    # per-k kernel implementation: the gridded pallas mega-kernel beats
    # the while-loop kernel from k >= PALLAS_MIN_K (results/impl_race.json
    # — 1.5-1.8x at k >= 10: VMEM residency removes the wide-carry HBM
    # traffic and per-op launch overhead that grow with seat count).
    # Execution-only; kernels are bit-identical at every k (impl_race
    # asserts winners).
    if resolve_game_impl(cfg.tpu.game_impl, n) == "pallas":
        game_kwargs = dict(game_kwargs or {})
        game_kwargs["impl"] = "pallas"
        game_kwargs["pallas_tile_rows"] = int(cfg.tpu.pallas_tile_rows)
    agg_kwargs = None if with_rows else game_kwargs
    # the chunk-shaped step compiles LAZILY via step_for: cells whose blocks
    # are fully covered by compact groups never dispatch it, and its AOT
    # deserialization alone costs ~10-20 s on the remote tunnel

    total = T.TournamentAccumulator(len(strategies))
    completed: list[int] = []
    resumed: list[int] = []

    # resume: absorb previously persisted blocks, each validated against the
    # coordinates the current plan derives for its batch id
    def _expected_coords(batch_id: int) -> dict:
        lo = batch_id * plan.shuffles_per_batch
        return {
            "batch_id": batch_id,
            "root_seed": int(cfg.sim.seed),
            "k": int(n),
            "shuffle_lo": lo,
            "shuffle_hi": lo + plan.shuffles_per_batch,
            "games_per_shuffle": plan.games_per_shuffle,
            # dice-stream definition version: a stream change (round 3's
            # one-hash mixed-radix draw) changes outcomes, so blocks played
            # under an older stream must be replayed, never merged
            "dice_stream": gk.DICE_STREAM_VERSION,
        }

    # compact-fetch block groups: per-block counts + per-group metric
    # totals (the (m, packed) group fetch cost ~0.99 MB/block against a
    # ~23 MB/s tunnel — see tournament.play_blocks_compact). Single-host,
    # aggregate-only path; group boundaries are ABSOLUTE (batch ids
    # [g*m, (g+1)*m)) so resume and dispatch always agree on membership.
    host_index, host_count = host_partition()
    # round-5: the compact-group dispatch also runs sharded — each device
    # plays nsb/n_mesh shuffles of every block and the three outputs psum
    # over ICI (parallel/mesh.sharded_compact_group_step, bit-identical)
    use_compact_groups = not with_rows and host_count == 1

    def _group_coords(lo: int, hi: int) -> dict:
        return {
            "batch_lo": lo,
            "batch_hi": hi,
            "root_seed": int(cfg.sim.seed),
            "k": int(n),
            "games_per_shuffle": plan.games_per_shuffle,
            "shuffles_per_batch": plan.shuffles_per_batch,
            "dice_stream": gk.DICE_STREAM_VERSION,
        }

    for batch_id in range(plan.batch_count):
        path = _block_path(cfg, n, batch_id)
        if path.exists():
            try:
                acc = load_block_aggregate(
                    path, expected_coordinates=_expected_coords(batch_id)
                )
                total.merge(acc)
                resumed.append(batch_id)
            except Exception as exc:
                logger.warning("block %s unusable (%s); will replay", path.name, exc)

    def _resume_compact_groups(m: int) -> None:
        """Absorb completed compact groups: all m counts-only blocks plus
        the group metrics artifact; anything partial replays whole."""
        if not use_compact_groups or m <= 1:
            return
        for lo in range(0, plan.batch_count, m):
            hi = min(lo + m, plan.batch_count)
            members = list(range(lo, hi))
            if any(b in resumed for b in members):
                continue  # full per-block artifacts already absorbed
            gpath = _group_metrics_path(cfg, n, lo, hi)
            if not gpath.exists():
                continue
            try:
                sums, sq = load_group_metrics(
                    gpath, expected_coordinates=_group_coords(lo, hi)
                )
                accs = [
                    load_block_aggregate(
                        _block_path(cfg, n, b),
                        expected_coordinates=_expected_coords(b),
                        allow_counts_only=True,
                    )
                    for b in members
                ]
            except Exception as exc:
                logger.warning(
                    "group %d..%d unusable (%s); will replay", lo, hi - 1, exc
                )
                continue
            for b, acc in zip(members, accs):
                total.merge(acc)
                resumed.append(b)
            total.add_metric_totals(sums, sq)

    if cfg.tpu.profile_dir:
        # optional jax profiler trace over the executed blocks (reference
        # tracing analogue: profiling HTML snapshots / throughput probe)
        jax.profiler.start_trace(cfg.tpu.profile_dir)

    start = time.perf_counter()
    games_done = 0

    # compiled steps are memoized per (chunk size, compaction): re-tracing or
    # re-deserializing a cached executable per block costs seconds
    step_cache: dict[tuple, Any] = {}

    def step_for(
        size: int, compact_: bool, *, sharded: bool = False,
        wide_rows: bool = False,
    ):
        key = ("chunk", size, compact_, sharded, wide_rows)
        if key not in step_cache:
            if sharded and with_rows:
                from farkle_ii_tpu.parallel.mesh import sharded_rows_step

                step_cache[key] = sharded_rows_step(
                    spec, mesh, compact=compact_, pad_multiple=pad_multiple,
                )
            elif sharded:
                from farkle_ii_tpu.parallel.mesh import sharded_packed_step

                step_cache[key] = sharded_packed_step(
                    spec, mesh, compact=compact_, pad_multiple=pad_multiple,
                    game_kwargs=agg_kwargs,
                )
            else:
                step_cache[key] = _compile_step(
                    spec, params, size, cfg.tpu.aot_cache,
                    with_rows=with_rows, compact=compact_, pad_multiple=pad_multiple,
                    game_kwargs=agg_kwargs, wide_rows=wide_rows,
                )
        return step_cache[key]

    def block_step_for(n_chunks: int, span: int, compact_: bool, *, sharded: bool):
        key = ("block", n_chunks, span, compact_, sharded)
        if key not in step_cache:
            if sharded:
                from farkle_ii_tpu.parallel.mesh import sharded_block_step

                step_cache[key] = sharded_block_step(
                    spec, mesh, compact=compact_, pad_multiple=pad_multiple,
                    game_kwargs=agg_kwargs,
                )
            elif cfg.tpu.aot_cache:
                from farkle_ii_tpu.utils.aot_cache import cached_compile

                step_cache[key] = cached_compile(
                    lambda p, sh: T.play_and_aggregate_block(
                        spec, p, sh, compact=compact_, pad_multiple=pad_multiple,
                        game_kwargs=agg_kwargs,
                    ),
                    params,
                    jnp.zeros((n_chunks, span), dtype=jnp.uint32),
                    extra_key=f"block-k{spec.k}-s{spec.n_strategies}-c{n_chunks}x{span}"
                    f"-t{spec.target_score}-r{spec.max_rounds}-p{pad_multiple}"
                    + ("" if compact_ else "-nocompact"),
                )
            else:
                step_cache[key] = jax.jit(
                    lambda p, sh: T.play_and_aggregate_block(
                        spec, p, sh, compact=compact_, pad_multiple=pad_multiple,
                        game_kwargs=agg_kwargs,
                    )
                )
        return step_cache[key]

    # block-group dispatch: the roll-step is latency-bound on its dependency
    # chain (per-iteration cost nearly flat in B, results/step_cost_k2.json),
    # so one recovery block is far too small a play batch. Group m whole
    # blocks into ONE device batch with per-block exact aggregation
    # (T.play_and_aggregate_blocks) — per-block persistence/resume unchanged.
    group_m = 1
    group_family = "scan"
    nsb = plan.shuffles_per_batch
    if n_mesh == 1 or (use_compact_groups and nsb % n_mesh == 0):
        # sharded compact groups split each block's shuffles across the
        # mesh, so the per-device batch is smaller than the probed
        # single-device geometry (safe side of the fault envelope)
        group_m, group_family = _resolve_cell_group(
            cfg, n, plan, envelope, ns_device, compact, with_rows=with_rows
        )
        if group_m > 1:
            logger.info(
                "k=%d: %d blocks per %s dispatch (%d shuffles, %d games "
                "per device batch)",
                n, group_m, group_family, group_m * nsb,
                group_m * nsb * plan.games_per_shuffle,
            )

    _resume_compact_groups(group_m)

    def group_step_for(m: int, compact_: bool):
        fam_full = group_family[1:] if group_family.startswith("c") else group_family
        key = ("group", m, compact_, with_rows, fam_full)
        if key not in step_cache:
            if with_rows:

                def fn(p, sh):
                    return T.play_and_aggregate_blocks_with_rows(
                        spec, p, sh, compact=compact_, pad_multiple=pad_multiple,
                        row_format="bits",
                    )

            else:

                # both group program families keep per-block packed
                # aggregates; the measured-faster one is k-dependent (scan
                # amortizes dispatch round trips per step; the flat batch
                # fills the pipeline deeper) — the probed envelope picks
                play = (
                    T.play_and_aggregate_blocks_scanned
                    if fam_full == "scan"
                    else T.play_and_aggregate_blocks
                )

                def fn(p, sh):
                    return play(
                        spec, p, sh, compact=compact_, pad_multiple=pad_multiple,
                        game_kwargs=agg_kwargs,
                    )

            if cfg.tpu.aot_cache:
                from farkle_ii_tpu.utils.aot_cache import cached_compile

                step_cache[key] = cached_compile(
                    fn, params, jnp.zeros((m, nsb), dtype=jnp.uint32),
                    extra_key=(
                        f"blkgrp-k{spec.k}-s{spec.n_strategies}"
                        f"-m{m}x{nsb}-t{spec.target_score}-r{spec.max_rounds}"
                        f"-p{pad_multiple}-rows2bits"
                        if with_rows
                        else f"blk{fam_full}-k{spec.k}-s{spec.n_strategies}"
                        f"-m{m}x{nsb}-t{spec.target_score}-r{spec.max_rounds}"
                        f"-p{pad_multiple}"
                    )
                    + ("" if compact_ else "-nocompact"),
                )
            else:
                step_cache[key] = jax.jit(fn)
        return step_cache[key]

    def compact_group_step_for(m: int, compact_: bool):
        # envelope probes record the compact families as "cscan"/"cflat";
        # normalize to the play-order family the program takes
        fam = group_family[1:] if group_family.startswith("c") else group_family
        key = ("cgroup", m, compact_, fam, n_mesh > 1)
        if key not in step_cache:
            if n_mesh > 1:
                from farkle_ii_tpu.parallel.mesh import (
                    sharded_compact_group_step,
                )

                step_cache[key] = sharded_compact_group_step(
                    spec, mesh, family=fam, compact=compact_,
                    pad_multiple=pad_multiple, game_kwargs=agg_kwargs,
                )
                return step_cache[key]

            def fn(p, sh):
                return T.play_blocks_compact(
                    spec, p, sh, family=fam, compact=compact_,
                    pad_multiple=pad_multiple, game_kwargs=agg_kwargs,
                )

            if cfg.tpu.aot_cache:
                from farkle_ii_tpu.utils.aot_cache import cached_compile

                step_cache[key] = cached_compile(
                    fn, params, jnp.zeros((m, nsb), dtype=jnp.uint32),
                    extra_key=(
                        f"cblk{fam}-k{spec.k}-s{spec.n_strategies}"
                        f"-m{m}x{nsb}-t{spec.target_score}-r{spec.max_rounds}"
                        f"-p{pad_multiple}"
                    )
                    + ("" if compact_ else "-nocompact"),
                )
            else:
                step_cache[key] = jax.jit(fn)
        return step_cache[key]

    def dispatch_group(batch_ids: list[int], *, compact_: bool) -> Any:
        sh = np.stack(
            [
                np.arange(b * nsb, (b + 1) * nsb, dtype=np.uint32)
                for b in batch_ids
            ]
        )
        if use_compact_groups:
            return compact_group_step_for(len(batch_ids), compact_)(
                params, jnp.asarray(sh)
            )
        return group_step_for(len(batch_ids), compact_)(params, jnp.asarray(sh))

    def absorb_group_compact(batch_ids: list[int], out: Any) -> None:
        nonlocal games_done
        try:
            counts_rows, mlo, mhi = out
            counts_rows = np.asarray(counts_rows)
            mlo = np.asarray(mlo)
            mhi = np.asarray(mhi)
        except (jax.errors.JaxRuntimeError, RuntimeError, ValueError):
            # device fault: replay each block serially without compaction
            # (per-block full artifacts; resume stays consistent)
            logger.warning(
                "device fault in k=%d compact group %s; replaying per block "
                "without compaction", n, batch_ids,
            )
            for b in batch_ids:
                absorb_block(b, dispatch_block(b, compact_=False), retried=True)
            return
        lo_id, hi_id = batch_ids[0], batch_ids[-1] + 1
        for i, b in enumerate(batch_ids):
            acc = T.unpack_block_counts(
                counts_rows[i], nsb, plan.games_per_shuffle, len(strategies)
            )
            acc.check_conservation()
            _enqueue_block_save(b, acc, counts_only=True)
            total.merge(acc)
            completed.append(b)
            games_done += nsb * plan.games_per_shuffle
        sums, sq = T.group_metrics_from_limbs(mlo, mhi, len(strategies))
        total.add_metric_totals(sums, sq)
        _enqueue_group_save(lo_id, hi_id, sums, sq)
        if progress:
            progress(
                f"k={n} batches {lo_id + 1}..{hi_id}/"
                f"{plan.batch_count} ({games_done:,} games)"
            )

    def absorb_group(batch_ids: list[int], out: Any) -> None:
        nonlocal games_done
        try:
            if with_rows:
                packed_aggs, packed_rows, row_overflow = out
                aggs = np.asarray(packed_aggs)
                row_buf = np.asarray(packed_rows)
                if bool(np.asarray(row_overflow)):
                    # a field exceeded its validated bit width (never
                    # observed in practice): replay through the wide format
                    logger.warning(
                        "k=%d group %s: bit-packed row overflow; replaying "
                        "blocks through the wide row format", n, batch_ids,
                    )
                    for b in batch_ids:
                        absorb_block(
                            b,
                            dispatch_block(b, compact_=compact, wide_rows=True),
                            wide_rows=True,
                        )
                    return
            else:
                aggs = np.asarray(out)
                row_buf = None
        except (jax.errors.JaxRuntimeError, RuntimeError, ValueError):
            # device fault: replay each block serially without compaction
            logger.warning(
                "device fault in k=%d block group %s; replaying per block "
                "without compaction", n, batch_ids,
            )
            for b in batch_ids:
                absorb_block(b, dispatch_block(b, compact_=False), retried=True)
            return
        games_per_block = nsb * plan.games_per_shuffle
        for i, b in enumerate(batch_ids):
            acc = T.TournamentAccumulator(len(strategies))
            acc.absorb(T.unpack_aggregates(aggs[i], len(strategies)))
            acc.check_conservation()
            if row_buf is not None:
                result, seat_ids = T.unpack_result_rows_bits(
                    row_buf[:, i * games_per_block : (i + 1) * games_per_block],
                    int(n),
                )
                _enqueue_row_shard(
                    batch_id=b, shuffle_lo=b * nsb, shuffle_hi=(b + 1) * nsb,
                    result=result, seat_ids=seat_ids,
                )
            _enqueue_block_save(b, acc)
            total.merge(acc)
            completed.append(b)
            games_done += games_per_block
        if progress:
            progress(
                f"k={n} batches {batch_ids[0] + 1}..{batch_ids[-1] + 1}/"
                f"{plan.batch_count} ({games_done:,} games)"
            )

    def dispatch_block(
        batch_id: int, *, compact_: bool, wide_rows: bool = False
    ) -> list[tuple[int, int, Any]]:
        """Dispatch one deterministic block without waiting for results.

        Aggregate-only execution scans all full chunks of the block on
        device in a single dispatch (remote dispatch round trips dominated
        production throughput at fault-safe chunk sizes); the sub-chunk
        remainder and the row-export path dispatch per chunk.
        """
        lo = batch_id * plan.shuffles_per_batch
        hi = lo + plan.shuffles_per_batch
        pending: list[tuple[int, int, Any]] = []
        pos = lo
        span = ns_device * n_mesh
        if not with_rows:
            n_full = (hi - lo) // span
            if n_full >= 1:
                idx = np.arange(lo, lo + n_full * span, dtype=np.uint32)
                out = block_step_for(n_full, span, compact_, sharded=n_mesh > 1)(
                    params, jnp.asarray(idx.reshape(n_full, span))
                )
                pending.append((lo, lo + n_full * span, out))
                pos = lo + n_full * span
        if n_mesh > 1:
            # remainder sharded chunks: always an exact multiple of the mesh
            # size; the sub-mesh tail falls through to single-device chunks
            sharded_hi = pos + ((hi - pos) // n_mesh) * n_mesh
            while pos < sharded_hi:
                size = min(span, sharded_hi - pos)
                size -= size % n_mesh
                idx = np.arange(pos, pos + size, dtype=np.uint32)
                out = step_for(size, compact_, sharded=True)(params, jnp.asarray(idx))
                pending.append((pos, pos + size, out))
                pos += size
        for chunk_lo in range(pos, hi, ns_device):
            chunk_hi = min(chunk_lo + ns_device, hi)
            idx = np.arange(chunk_lo, chunk_hi, dtype=np.uint32)
            out = step_for(len(idx), compact_, wide_rows=wide_rows)(
                params, jnp.asarray(idx)
            )
            pending.append((chunk_lo, chunk_hi, out))
        return pending

    def absorb_block(
        batch_id: int, pending: list[tuple[int, int, Any]], *,
        retried: bool = False, wide_rows: bool = False
    ) -> None:
        nonlocal games_done
        acc = T.TournamentAccumulator(len(strategies))
        try:
            for chunk_lo, chunk_hi, out in pending:
                if with_rows:
                    # the mesh-sharded rows step still emits the wide format
                    if wide_rows or len(out) == 2:
                        packed, packed_rows = out
                        result, seat_ids = T.unpack_result_rows(
                            packed_rows, int(n)
                        )
                    else:
                        packed, row_words, row_overflow = out
                        if bool(np.asarray(row_overflow)):
                            # a row field exceeded its validated bit width
                            # (never observed): replay this block through
                            # the wide row format
                            logger.warning(
                                "k=%d block %d: bit-packed row overflow; "
                                "replaying via the wide row format",
                                n, batch_id,
                            )
                            absorb_block(
                                batch_id,
                                dispatch_block(
                                    batch_id, compact_=compact, wide_rows=True
                                ),
                                retried=retried, wide_rows=True,
                            )
                            return
                        result, seat_ids = T.unpack_result_rows_bits(
                            np.asarray(row_words), int(n)
                        )
                    _enqueue_row_shard(
                        batch_id=batch_id, shuffle_lo=chunk_lo,
                        shuffle_hi=chunk_hi, result=result, seat_ids=seat_ids,
                    )
                    agg = T.unpack_aggregates(packed, len(strategies))
                elif isinstance(out, tuple):  # block-scan limb pair
                    agg = T.unpack_block_aggregates(out, len(strategies))
                else:
                    agg = T.unpack_aggregates(out, len(strategies))
                acc.absorb(agg)
        except (jax.errors.JaxRuntimeError, RuntimeError, ValueError):
            # device fault while fetching a chunk: re-dispatch the whole block
            # serially with straggler compaction disabled (some batch shapes
            # have triggered hard TPU-runtime faults in the compaction path)
            if retried:
                raise
            logger.warning(
                "device fault in k=%d block %d; retrying without compaction",
                n, batch_id,
            )
            absorb_block(
                batch_id,
                dispatch_block(batch_id, compact_=False, wide_rows=wide_rows),
                retried=True, wide_rows=wide_rows,
            )
            return
        acc.check_conservation()
        _enqueue_block_save(batch_id, acc)
        total.merge(acc)
        completed.append(batch_id)
        games_done += plan.shuffles_per_batch * plan.games_per_shuffle
        if progress:
            progress(
                f"k={n} batch {batch_id + 1}/{plan.batch_count} "
                f"({games_done:,} games)"
            )

    # async block persistence: publishing a block (atomic npz + sidecar,
    # fsyncs) is pure host IO independent of absorption, so a single writer
    # thread takes it off the critical path; the queue joins before the cell
    # conserves, and a writer failure fails the run (still resumable).
    import queue as queue_mod
    import threading

    # writer pool: row shards measured ~120k games/s per writer after the
    # jitted-fingerprint fix, so the rows path shards the writing across
    # threads (Arrow releases the GIL). Per-batch FIFO is preserved by
    # pinning every batch id to one worker — the "rows published before the
    # block npz" resume invariant holds per batch, which is all it needs.
    n_writers = max(1, int(cfg.sim.row_writer_threads)) if with_rows else 1
    save_queues: list[queue_mod.Queue] = [
        queue_mod.Queue(maxsize=16) for _ in range(n_writers)
    ]
    save_errors: list[BaseException] = []
    # per-shard unconditional sufficient-statistic partials, computed on the
    # writer thread from the in-memory device row buffers (shuffle_lo -> df);
    # read only after _join_writer
    emit_metrics = with_rows and bool(cfg.sim.emit_batch_metrics)
    metrics_partials: dict[int, Any] = {}

    def _writer(save_queue: queue_mod.Queue) -> None:
        while True:
            item = save_queue.get()
            if item is None:
                return
            try:
                if item[0] == "rows":
                    _, b_id, lo, hi, result, seat_ids = item
                    _, rows_table = _write_row_shard(
                        cfg, n=n, spec=spec, batch_id=b_id,
                        shuffle_lo=lo, shuffle_hi=hi,
                        result=result, seat_ids=seat_ids,
                    )
                    if emit_metrics:
                        from farkle_ii_tpu.analysis.all_player_metrics import (
                            partial_raw_sums,
                        )

                        metrics_partials[lo] = partial_raw_sums(
                            rows_table.to_pandas(), int(n)
                        )
                elif item[0] == "group":
                    _, lo_id, hi_id, sums, sq = item
                    save_group_metrics(
                        _group_metrics_path(cfg, n, lo_id, hi_id), sums, sq,
                        coordinates=_group_coords(lo_id, hi_id),
                    )
                else:
                    _, b_id, b_acc, counts_only = item
                    coords = _expected_coords(b_id)
                    if counts_only:
                        coords = dict(coords, counts_only=True)
                    save_block_aggregate(
                        _block_path(cfg, n, b_id), b_acc, batch_id=b_id,
                        coordinates=coords,
                    )
            except BaseException as exc:  # surfaced at join
                save_errors.append(exc)

    writers = [
        threading.Thread(
            target=_writer, args=(q,), name=f"block-writer-k{n}-{i}",
            daemon=True,
        )
        for i, q in enumerate(save_queues)
    ]
    for w in writers:
        w.start()

    def _queue_for(b_id: int) -> queue_mod.Queue:
        return save_queues[b_id % n_writers]

    def _enqueue_block_save(b_id: int, b_acc, *, counts_only: bool = False) -> None:
        if save_errors:
            raise RuntimeError("block writer failed") from save_errors[0]
        _queue_for(b_id).put(("block", b_id, b_acc, counts_only))

    def _enqueue_group_save(lo_id: int, hi_id: int, sums, sq) -> None:
        if save_errors:
            raise RuntimeError("block writer failed") from save_errors[0]
        _queue_for(lo_id).put(("group", lo_id, hi_id, sums, sq))

    def _enqueue_row_shard(
        *, batch_id: int, shuffle_lo: int, shuffle_hi: int, result, seat_ids
    ) -> None:
        # FIFO with the block save: enqueued before its block's npz on the
        # SAME per-batch worker, so the shard is durably published before a
        # resume can see the completed block (per-batch ordering is the
        # whole invariant; cross-batch order is free)
        if save_errors:
            raise RuntimeError("block writer failed") from save_errors[0]
        _queue_for(batch_id).put(
            ("rows", batch_id, shuffle_lo, shuffle_hi, result, seat_ids)
        )

    def _join_writer() -> None:
        for q in save_queues:
            q.put(None)
        for w in writers:
            w.join()
        if save_errors:
            raise RuntimeError("block writer failed") from save_errors[0]

    # cross-block pipeline: keep a few blocks' chunks dispatched ahead so the
    # device never idles while the host absorbs aggregates and writes block
    # artifacts (absorption is exact and order-independent, so depth only
    # affects latency, never results)
    host_index, host_count = host_partition()
    if host_count > 1:
        logger.info(
            "k=%d: host %d/%d owns %d of %d blocks",
            n, host_index, host_count,
            sum(1 for b in range(plan.batch_count) if owns_block(b, host_index, host_count)),
            plan.batch_count,
        )
    pending_ids = [
        b for b in range(plan.batch_count)
        if b not in resumed
        and (host_count == 1 or owns_block(b, host_index, host_count))
    ]

    def _absorb(entry) -> None:
        if entry[0] == "group":
            if use_compact_groups:
                absorb_group_compact(entry[1], entry[2])
            else:
                absorb_group(entry[1], entry[2])
        else:
            absorb_block(entry[1], entry[2])

    inflight: deque[tuple] = deque()
    if use_compact_groups and group_m > 1:
        # absolute group boundaries: a group dispatches compactly only when
        # EVERY member is pending (a partially-resumed group replays its
        # stragglers per block, keeping absorbed counts single-counted)
        work: list[tuple] = []
        pending_set = set(pending_ids)
        for lo in range(0, plan.batch_count, group_m):
            members = list(range(lo, min(lo + group_m, plan.batch_count)))
            pend = [b for b in members if b in pending_set]
            if pend and len(pend) == len(members):
                # full groups AND the tail partial group run compactly (a
                # per-block remainder would load two more executables per
                # cell — measured 30+ s of deserialize/warm-up stall each)
                work.append(("group", members))
            else:
                work.extend(("block", b) for b in pend)
        for kind, payload in work:
            if kind == "group":
                inflight.append(
                    ("group", payload, dispatch_group(payload, compact_=compact))
                )
            else:
                inflight.append(
                    ("block", payload, dispatch_block(payload, compact_=compact))
                )
            if len(inflight) >= PIPELINE_BLOCK_DEPTH:
                _absorb(inflight.popleft())
    else:
        i = 0
        while i < len(pending_ids):
            if group_m > 1 and i + group_m <= len(pending_ids):
                ids = pending_ids[i : i + group_m]
                inflight.append(("group", ids, dispatch_group(ids, compact_=compact)))
                i += group_m
            else:
                b = pending_ids[i]
                inflight.append(("block", b, dispatch_block(b, compact_=compact)))
                i += 1
            if len(inflight) >= PIPELINE_BLOCK_DEPTH:
                _absorb(inflight.popleft())
    while inflight:
        _absorb(inflight.popleft())
    _join_writer()
    elapsed = max(time.perf_counter() - start, 1e-9)
    if cfg.tpu.profile_dir:
        jax.profiler.stop_trace()

    if host_count > 1:
        missing = sorted(
            b for b in range(plan.batch_count)
            if b not in resumed and b not in completed
        )
        if host_index != 0:
            # worker: its blocks are durably published; host 0 assembles
            logger.info(
                "k=%d: host %d published %d blocks; host 0 finalizes",
                n, host_index, len(completed),
            )
            return CellRunResult(
                plan=plan, accumulator=total, completed_batches=completed,
                resumed_batches=resumed, elapsed_seconds=elapsed,
                games_per_second=games_done / elapsed if games_done else 0.0,
                finalized=False,
            )
        # host 0: absorb peers' published blocks from the shared data plane
        deadline = time.time() + _PEER_BLOCK_TIMEOUT_S
        pending = set(missing)
        while pending:
            for b in sorted(pending):
                path = _block_path(cfg, n, b)
                if not path.exists():
                    continue
                try:
                    acc = load_block_aggregate(
                        path, expected_coordinates=_expected_coords(b)
                    )
                except Exception:
                    continue  # partially published; retry next poll
                total.merge(acc)
                completed.append(b)
                games_done += plan.shuffles_per_batch * plan.games_per_shuffle
                pending.discard(b)
            if pending:
                if time.time() > deadline:
                    raise RuntimeError(
                        f"k={n}: timed out waiting for peer blocks {sorted(pending)}"
                    )
                logger.info(
                    "k=%d: waiting for %d peer blocks", n, len(pending)
                )
                time.sleep(2.0)

    total.check_conservation()
    expected_games = plan.required_shuffles * plan.games_per_shuffle
    if total.games_attempted != expected_games:
        raise RuntimeError(
            f"game conservation failure: attempted {total.games_attempted} != "
            f"planned {expected_games}"
        )
    if with_rows:
        _publish_immutable_rows_manifest(cfg, n)
        if emit_metrics:
            from farkle_ii_tpu.analysis.all_player_metrics import (
                publish_device_batch_metrics,
            )

            publish_device_batch_metrics(
                cfg, int(n), metrics_partials, expected_games=expected_games,
            )
    return CellRunResult(
        plan=plan,
        accumulator=total,
        completed_batches=completed,
        resumed_batches=resumed,
        elapsed_seconds=elapsed,
        games_per_second=games_done / elapsed if games_done else 0.0,
    )


def _publish_immutable_rows_manifest(cfg: AppConfig, n: int) -> None:
    """Freeze the cell's append-only row-shard log into an immutable manifest.

    The NDJSON manifest is the live redo log during execution (appends may
    arrive in any resume order); once the cell conserves, its entries are
    canonically ordered by (k, shuffle_lo) and published with a chained root
    hash, so the finished shard log can never be silently appended to,
    edited, or reordered (reference authenticated_contract.py:1200).
    """
    from farkle_ii_tpu.utils.authenticated_contract import (
        StageIdentity,
        canonical_json_sha,
        publish_immutable_manifest_atomic,
    )

    live = cfg.rows_dir(n) / "rows_manifest.ndjson"
    if not live.exists():
        return
    entries = {}
    for rec in mf.read_manifest(live):
        if rec.get("kind") == "row_shard" and int(rec.get("k", -1)) == int(n):
            entries[(int(rec["k"]), int(rec["shuffle_lo"]))] = rec
    if not entries:
        return
    ordered = [entries[key] for key in sorted(entries)]
    identity = StageIdentity(
        stage="simulation",
        config_sha=compute_stage_config_sha(cfg, "simulation"),
        freshness_sha=canonical_json_sha(cfg.freshness_key()),
    )
    publish_immutable_manifest_atomic(
        cfg.rows_dir(n) / "rows_manifest.v3.ndjson",
        ordered,
        stage_identity=identity,
        coordinate_fields=("k", "shuffle_lo"),
    )


# ─────────────────────────────────────────────────────────────────────────────
# Output publication
# ─────────────────────────────────────────────────────────────────────────────


def summary_table(acc: T.TournamentAccumulator) -> pa.Table:
    """Per-strategy outcome summary (``{n}p_checkpoint.parquet`` parity)."""
    s = np.arange(acc.n_strategies)
    attempted = acc.attempted_exposures
    completed = acc.completed_exposures
    with np.errstate(divide="ignore", invalid="ignore"):
        win_rate_attempt = np.where(attempted > 0, acc.wins / attempted, np.nan)
        win_rate_completed = np.where(completed > 0, acc.wins / completed, np.nan)
        safety_rate = np.where(
            attempted > 0, acc.safety_limit_exposures / attempted, np.nan
        )
    return pa.table(
        {
            "strategy_id": pa.array(s, pa.int64()),
            "wins": pa.array(acc.wins, pa.int64()),
            "attempted_exposures": pa.array(attempted, pa.int64()),
            "completed_exposures": pa.array(completed, pa.int64()),
            "safety_limit_exposures": pa.array(acc.safety_limit_exposures, pa.int64()),
            "win_rate_per_attempt": pa.array(win_rate_attempt, pa.float64()),
            "win_rate_per_completion": pa.array(win_rate_completed, pa.float64()),
            "safety_limit_rate": pa.array(safety_rate, pa.float64()),
        }
    )


def expanded_metrics_table(acc: T.TournamentAccumulator) -> pa.Table:
    """Per-strategy winner-metric sums/square-sums (``{n}p_metrics.parquet``)."""
    cols: dict[str, Any] = {
        "strategy_id": pa.array(np.arange(acc.n_strategies), pa.int64()),
        "wins": pa.array(acc.wins, pa.int64()),
    }
    for i, label in enumerate(T.METRIC_LABELS):
        cols[f"{label}_sum"] = pa.array(acc.metric_sums[:, i], pa.int64())
        cols[f"{label}_sq_sum"] = pa.array(acc.metric_sq_sums[:, i], pa.int64())
    return pa.table(cols)


# run_simulation cell progress (index of the cell currently executing),
# consumed by the one-ahead prewarm worker
_PREWARM_PROGRESS: dict[int, int] = {}


def _resolve_cell_chunk(cfg: AppConfig, n: int, plan, envelope):
    """Envelope-resolved (ns_device, compact) for one cell (run_cell logic)."""
    compact = cfg.tpu.straggler_compaction
    ns_cap = min(T.MAX_SHUFFLES_PER_BATCH, plan.shuffles_per_batch)
    ns_device = min(cfg.sim.shuffles_per_device_batch, ns_cap)
    if envelope is not None:
        if compact:
            shape = envelope.best_shape(int(n), cap=ns_cap)
            if shape is not None:
                ns_device, compact = shape
        else:
            probed = envelope.best_ns(int(n), compact=False, cap=ns_cap)
            if probed is not None:
                ns_device = probed
    return ns_device, compact


def _resolve_cell_group(
    cfg: AppConfig, n: int, plan, envelope, ns_device, compact,
    *, with_rows: bool = False,
):
    """Envelope-resolved (group_m, family) for one cell (run_cell logic).

    The rows path resolves against the separately probed rows-group family
    (``rows_group_probes``): the row-export program differs from the
    aggregate-only groups (row packing + a much larger fetch), so
    aggregate probes do not transfer — the round-4 gap where the plan's
    43-shuffle batches matched no probed shape and rows fell back to
    16-shuffle chunks at ~25k games/s.
    """
    group_m, group_family = 1, "scan"
    nsb = plan.shuffles_per_batch
    if nsb <= T.MAX_SHUFFLES_PER_BATCH:
        cfg_m = cfg.tpu.blocks_per_dispatch
        if cfg_m is not None:
            group_m = max(1, int(cfg_m))
        elif with_rows and envelope is not None:
            m = envelope.best_rows_group(
                int(n), nsb=nsb, max_m=plan.batch_count
            )
            if m:
                group_m = m
        elif envelope is not None:
            probed = envelope.best_block_group(
                int(n), nsb=nsb, compact=compact, max_m=plan.batch_count,
                floor_speed=envelope.chunk_speed(
                    int(n), ns=ns_device, compact=compact
                ),
            )
            if probed:
                group_m, group_family = probed
    return group_m, group_family


def prewarm_cell_executables(cfg: AppConfig, strategies) -> None:
    """Deserialize every cell's primary executables on a background thread.

    The mega run paid ~15 s of fixed cost per cell, part of it AOT
    deserialization serialized with the cell's own execution
    (RESULTS.md round 3). This resolves each cell's envelope shapes with
    the same logic run_cell uses and issues the same cached_compile calls;
    the in-process single-flight memo (utils/aot_cache) hands the warm
    executables to the cells when they ask. Runs while the first cell
    computes; errors are logged and ignored (the cell compiles normally).
    """
    import threading

    import jax as _jax

    if (
        not cfg.tpu.prewarm_executables
        or not cfg.tpu.aot_cache
        or len(_jax.devices()) > 1
    ):
        return
    import jax.numpy as jnp

    from farkle_ii_tpu.utils import aot_cache

    p = S.pack_strategy_params(strategies)
    params = (
        jnp.asarray(p.score_threshold),
        jnp.asarray(p.dice_threshold),
        jnp.asarray(p.flags),
    )
    envelope = load_fault_envelope(
        cfg.tpu.fault_envelope_path, n_strategies=len(strategies)
    )
    pad_multiple = int(cfg.tpu.compact_pad_multiple)

    def one_cell(n: int) -> None:
        try:
            plan = plan_tournament_workload(
                root_seed=cfg.sim.seed,
                k=int(n),
                strategy_count=len(strategies),
                resolution_delta=cfg.screening.resolution_delta,
                confidence=cfg.screening.interval_confidence,
                batch_count=cfg.batching.target_batches,
                min_shuffles_per_batch=cfg.batching.min_shuffles_per_batch,
                shuffle_cap=cfg.screening.max_shuffles_per_root_k,
                projected_games_per_second=cfg.screening.projected_games_per_second,
            )
            spec = T.TournamentSpec(
                root_seed=int(cfg.sim.seed), k=int(n), n_strategies=len(strategies)
            )
            ns_device, compact = _resolve_cell_chunk(cfg, n, plan, envelope)
            # mirror run_cell's execution-tuning kwargs exactly or the
            # jaxpr-hash cache keys will not line up
            ratios = tuple(int(r) for r in cfg.tpu.compact_ratios)
            cadence = int(cfg.tpu.cond_check_every)
            agg_kwargs = (
                {"compact_ratios": ratios, "cond_check_every": cadence}
                if (ratios, cadence) != ((8, 64, 512), 8)
                else None
            )
            _compile_step(
                spec, params, ns_device, True, with_rows=False,
                compact=compact, pad_multiple=pad_multiple,
                game_kwargs=agg_kwargs,
            )
            group_m, group_family = _resolve_cell_group(
                cfg, n, plan, envelope, ns_device, compact
            )
            if group_m > 1:
                fam = (
                    group_family[1:] if group_family.startswith("c")
                    else group_family
                )
                nsb = plan.shuffles_per_batch
                sizes = [group_m]
                tail = plan.batch_count % group_m
                if tail:
                    sizes.append(tail)
                for m_sz in sizes:
                    aot_cache.cached_compile(
                        lambda p_, sh: T.play_blocks_compact(
                            spec, p_, sh, family=fam, compact=compact,
                            pad_multiple=pad_multiple, game_kwargs=agg_kwargs,
                        ),
                        params, jnp.zeros((m_sz, nsb), dtype=jnp.uint32),
                        extra_key=(
                            f"cblk{fam}-k{spec.k}-s{spec.n_strategies}"
                            f"-m{m_sz}x{nsb}-t{spec.target_score}"
                            f"-r{spec.max_rounds}-p{pad_multiple}"
                        )
                        + ("" if compact else "-nocompact"),
                    )
        except Exception as exc:  # best-effort: the cell compiles normally
            logger.info("prewarm for k=%s skipped (%s)", n, exc)

    import time as _time

    def worker() -> None:
        # skip the first cell (it compiles in the foreground) and stay at
        # most one cell ahead of execution so deserialization never storms
        # the tunnel the running cell needs
        cells = [int(n) for n in cfg.sim.n_players_list]
        for idx, n in enumerate(cells[1:], start=1):
            while _PREWARM_PROGRESS.get(id_key) is not None and (
                _PREWARM_PROGRESS[id_key] < idx - 1
            ):
                _time.sleep(0.5)
            one_cell(n)

    id_key = id(cfg)
    _PREWARM_PROGRESS[id_key] = 0
    threading.Thread(target=worker, name="cell-prewarm", daemon=True).start()


def run_simulation(
    cfg: AppConfig, *, force: bool = False, progress: Callable[[str], None] | None = None
) -> dict[str, Any]:
    """Full config-driven simulation across all configured player counts."""
    strategies = resolve_strategies(cfg)
    validate_player_counts(cfg, len(strategies))
    run_id = mf.new_run_id()
    manifest_path = cfg.manifest_path()
    config_sha = cfg.config_sha or ""
    mf.append_manifest_event(
        manifest_path, "run_start", run_id=run_id, config_sha=config_sha,
        command="run", n_players_list=[int(x) for x in cfg.sim.n_players_list],
    )

    if force:
        import shutil

        for n in cfg.sim.n_players_list:
            blocks = cfg.n_players_dir(int(n)) / "blocks"
            if blocks.exists():
                shutil.rmtree(blocks)

    # warm every cell's executables concurrently with the first cell
    prewarm_cell_executables(cfg, strategies)

    # strategy manifest (once per root)
    write_parquet_artifact_atomic(
        build_strategy_manifest_table(strategies),
        cfg.strategy_manifest_path(),
        producer="simulation",
        metadata={"n_strategies": len(strategies)},
    )

    results: dict[int, CellRunResult] = {}
    outputs: list[Path] = [cfg.strategy_manifest_path()]
    plans: dict[str, Any] = {}
    # per-n execution overrides (reference sim.per_n). Only execution knobs
    # may vary per player count — the strategy grid is a per-root contract.
    _PER_N_KEYS = {"shuffles_per_device_batch", "row_dir", "expanded_metrics",
                   "desired_sec_per_chunk", "ckpt_every_sec", "n_jobs"}
    base_cfg = cfg

    def _cell_cfg(n: int):
        overrides = base_cfg.sim.per_n.get(str(n), {})
        if not overrides:
            return base_cfg
        import copy

        bad = set(overrides) - _PER_N_KEYS
        if bad:
            raise ValueError(
                f"sim.per_n[{n}] may only override execution knobs "
                f"{sorted(_PER_N_KEYS)}; got {sorted(bad)}"
            )
        cell = copy.deepcopy(base_cfg)
        for key, value in overrides.items():
            setattr(cell.sim, key, value)
        return cell

    def _run_and_publish_cell(n: int):
        cell = _cell_cfg(n)
        mf.append_manifest_event(
            manifest_path, "stage_start", run_id=run_id, config_sha=config_sha,
            stage="simulation", k=n,
        )
        res = run_cell(cell, n=n, strategies=strategies, run_id=run_id, progress=progress)
        results[n] = res
        if not res.finalized:
            # multi-host worker: blocks are on the shared data plane; the
            # finalizing host publishes summaries and the completion stamp
            mf.append_manifest_event(
                manifest_path, "stage_end", run_id=run_id, config_sha=config_sha,
                stage="simulation", k=n, status="worker_blocks_published",
            )
            return
        plan = res.plan
        if res.games_per_second > 0:
            # measured-throughput runtime projection (reference
            # _measure_throughput analogue, using real steady-state rate)
            plan = plan.with_games_per_second(res.games_per_second)
        plans[str(n)] = plan.to_dict()
        write_parquet_artifact_atomic(
            summary_table(res.accumulator),
            cell.checkpoint_path(n),
            producer="simulation",
            scope="by_k",
            metadata={"k": n, "root_seed": cell.sim.seed},
        )
        outputs.append(cell.checkpoint_path(n))
        if cell.sim.expanded_metrics:
            write_parquet_artifact_atomic(
                expanded_metrics_table(res.accumulator),
                cell.metrics_path(n),
                producer="simulation",
                scope="by_k",
                metadata={"k": n, "root_seed": cell.sim.seed},
            )
            outputs.append(cell.metrics_path(n))
        mf.append_manifest_event(
            manifest_path, "stage_end", run_id=run_id, config_sha=config_sha,
            stage="simulation", k=n,
            games_attempted=res.accumulator.games_attempted,
            games_per_second=res.games_per_second,
        )

    cells = [int(n) for n in cfg.sim.n_players_list]
    workers = max(1, int(getattr(cfg.sim, "cell_concurrency", 1)))
    if workers > 1 and len(cells) > 1:
        # overlap one cell's host-side fixed costs (tracing, executable
        # deserialization, setup/summary IO — measured 10-40 s per cell on
        # the remote tunnel) with another's device dispatches. Device work
        # serializes on the chip either way; results are bit-identical by
        # construction (coordinate RNG + exact per-block aggregation), and
        # the cross-thread artifact plane is already atomic/locked.
        from concurrent.futures import ThreadPoolExecutor

        logger.info("running %d cells with %d concurrent workers", len(cells), workers)
        with ThreadPoolExecutor(max_workers=workers) as pool:
            futures = [pool.submit(_run_and_publish_cell, n) for n in cells]
            for fut in futures:
                fut.result()
    else:
        for n in cells:
            _run_and_publish_cell(n)

    cfg = base_cfg  # per-cell clones are function-local; identity uses the base
    if any(not r.finalized for r in results.values()):
        mf.append_manifest_event(
            manifest_path, "run_end", run_id=run_id, config_sha=config_sha,
            status="worker_done",
        )
        return {"run_id": run_id, "results": results,
                "n_strategies": len(strategies), "finalized": False}
    write_json_atomic(cfg.workload_plan_path(), plans)
    outputs.append(cfg.workload_plan_path())

    stage_sha = compute_stage_config_sha(cfg, "simulation")
    write_stage_done(
        cfg.results_root,
        "simulation",
        outputs=outputs,
        config_sha=stage_sha,
        freshness_key=cfg.freshness_key(),
        extra={"run_id": run_id},
    )
    mf.append_manifest_event(
        manifest_path, "run_end", run_id=run_id, config_sha=config_sha, status="ok"
    )
    return {
        "run_id": run_id,
        "results": results,
        "n_strategies": len(strategies),
    }
