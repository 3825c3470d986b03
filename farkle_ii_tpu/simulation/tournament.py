"""Tournament batch execution: shuffle permutations + on-device aggregation.

TPU-native re-design of the reference tournament hot path
(``/root/reference/src/farkle/simulation/run_tournament.py:287`` per-shuffle
loop → per-game Python engine). Here a *batch of whole shuffles* is played as
one fused XLA program:

1. per-shuffle strategy permutations are generated on device from their
   semantic coordinate (namespace 101), then split contiguously into
   ``n_strategies / k`` tables — same seating rule as the reference;
2. every game derives its dice streams from ``(root, k, shuffle, game)``
   coordinates (namespace 103); seats separate via the in-kernel counter;
3. the whole batch advances through the game kernel's single while_loop;
4. results are reduced on device into per-strategy win counts, outcome
   exposures, and winner-metric sums via ``segment_sum`` — the TPU analogue
   of the reference's pickled ``OutcomeCounter`` absorption.

Square sums are accumulated exactly: each metric value ``v < 2**22`` is split
as ``v = hi * 2**12 + lo`` and three int32 segment sums (``hi^2``, ``hi*lo``,
``lo^2``) are carried per batch, recombined into int64 on the host. This keeps
all device math in int32 (TPU-friendly) with zero floating-point error; the
int32 headroom bounds one device batch to ``MAX_SHUFFLES_PER_BATCH`` shuffles.

Aggregates are additive across batches, devices, and resume boundaries, so
deterministic-batch recovery reduces to summing per-block int64 arrays in any
order — a strictly stronger exactly-once story than the reference's
order-sensitive float absorption.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from farkle_ii_tpu.ops import game_kernel as gk
from farkle_ii_tpu.ops import rng

# Per-winning-strategy metric fields, order-compatible with the reference
# (run_tournament.py:98-110).
METRIC_LABELS: tuple[str, ...] = (
    "winning_score",
    "n_rounds",
    "winner_farkles",
    "winner_rolls",
    "winner_highest_turn",
    "winner_smart_five_uses",
    "winner_n_smart_five_dice",
    "winner_smart_one_uses",
    "winner_n_smart_one_dice",
    "winner_hot_dice",
    "winner_hit_max_rounds",
)
N_METRICS = len(METRIC_LABELS)

# int32-exactness bound for the split-limb square sums (see module docstring).
MAX_SHUFFLES_PER_BATCH = 128

_SPLIT = 1 << 12  # limb split for exact squares; metric values are < 2**22


@dataclass(frozen=True)
class TournamentSpec:
    """Static description of one (root_seed, k) tournament cell."""

    root_seed: int
    k: int
    n_strategies: int
    target_score: int = 10_000
    max_rounds: int = 200

    def __post_init__(self) -> None:
        if self.n_strategies % self.k != 0:
            raise ValueError(
                f"n_strategies={self.n_strategies} must be divisible by k={self.k}"
            )

    @property
    def games_per_shuffle(self) -> int:
        return self.n_strategies // self.k


class TournamentAggregates(NamedTuple):
    """Additive per-strategy aggregates for one device batch (all int32).

    Shapes: (S,) for counts, (S, M) for metric sums, with M = N_METRICS.
    """

    wins: jax.Array
    attempted_exposures: jax.Array
    completed_exposures: jax.Array
    safety_limit_exposures: jax.Array
    games_attempted: jax.Array  # ()
    games_completed: jax.Array  # ()
    games_safety_limit: jax.Array  # ()
    metric_sums: jax.Array  # (S, M)
    metric_sq_hi2: jax.Array  # (S, M) sum of hi^2
    metric_sq_hilo: jax.Array  # (S, M) sum of hi*lo
    metric_sq_lo2: jax.Array  # (S, M) sum of lo^2


def pack_aggregates(agg: TournamentAggregates) -> jax.Array:
    """Flatten one batch's aggregates into a single int32 vector.

    Remote-backend fetches cost a full round-trip per array; packing the 11
    aggregate fields into one buffer makes each device chunk cost exactly one
    host transfer (see ``unpack_aggregates``).
    """
    return jnp.concatenate([jnp.ravel(x).astype(jnp.int32) for x in agg])


def aggregate_field_shapes(n_strategies: int) -> list[tuple[int, ...]]:
    s, m = n_strategies, N_METRICS
    return [(s,), (s,), (s,), (s,), (), (), (), (s, m), (s, m), (s, m), (s, m)]


def packed_length(n_strategies: int) -> int:
    return sum(
        int(np.prod(shape)) if shape else 1
        for shape in aggregate_field_shapes(n_strategies)
    )


def unpack_aggregates(vec, n_strategies: int) -> TournamentAggregates:
    """Host-side inverse of :func:`pack_aggregates` (one fetch, then views)."""
    flat = np.asarray(vec)
    parts = []
    offset = 0
    for shape in aggregate_field_shapes(n_strategies):
        count = int(np.prod(shape)) if shape else 1
        chunk = flat[offset : offset + count]
        parts.append(chunk.reshape(shape) if shape else chunk[0])
        offset += count
    if offset != flat.shape[0]:
        raise ValueError(f"packed aggregate length {flat.shape[0]} != expected {offset}")
    return TournamentAggregates(*parts)


def shuffle_seat_ids(
    spec: TournamentSpec, shuffle_indices: jax.Array
) -> jax.Array:
    """Per-shuffle on-device grid permutations -> seat ids ``(NS, G, k)``.

    Each shuffle permutes the full strategy grid with its namespace-101
    coordinate key and splits it contiguously into ``G = S/k`` tables
    (reference seating rule, run_tournament.py:298-327).
    """
    keys = rng.vector_coordinate_keys(
        rng.RandomPurpose.SHUFFLE_PERMUTATION,
        root_seed=spec.root_seed,
        k=spec.k,
        shuffle_index=jnp.asarray(shuffle_indices, dtype=jnp.uint32),
    )
    perm = jax.vmap(
        lambda key: jax.random.permutation(key, spec.n_strategies).astype(jnp.int32)
    )(keys)
    ns = perm.shape[0]
    return perm.reshape(ns, spec.games_per_shuffle, spec.k)


def play_shuffles(
    spec: TournamentSpec,
    params: tuple[jax.Array, jax.Array, jax.Array],
    shuffle_indices: jax.Array,
    *,
    compact: bool = True,
    pad_multiple: int | None = None,
    game_kwargs: dict | None = None,
) -> tuple[gk.GameResult, jax.Array]:
    """Play every game of a batch of shuffles. Jit-compatible.

    Args:
        spec: static tournament cell description.
        params: ``(score_threshold, dice_threshold, flags)`` int32 arrays of
            shape (S,) — the packed strategy grid on device.
        shuffle_indices: (NS,) shuffle coordinates to play.

    Returns:
        ``(GameResult over B = NS * G games, seat_ids (B, k))``.
    """
    st_tab, dt_tab, fl_tab = params
    seat_ids = shuffle_seat_ids(spec, shuffle_indices)  # (NS, G, k)
    ns, g, k = seat_ids.shape
    flat_ids = seat_ids.reshape(ns * g, k)

    st = st_tab[flat_ids]
    dt = dt_tab[flat_ids]
    fl = fl_tab[flat_ids]

    shuffle_per_game = jnp.repeat(
        jnp.asarray(shuffle_indices, dtype=jnp.uint32), g
    )  # (B,)
    game_idx = jnp.tile(jnp.arange(g, dtype=jnp.uint32), ns)  # (B,)

    game_keys = rng.vector_coordinate_keys(
        rng.RandomPurpose.TOURNAMENT_PLAYER,
        root_seed=spec.root_seed,
        k=spec.k,
        shuffle_index=shuffle_per_game,
        game_index=game_idx,
    )
    key_data = jax.random.key_data(game_keys)  # (B, 2)

    result = gk.play_games(
        key_data, st, dt, fl,
        target_score=spec.target_score,
        max_rounds=spec.max_rounds,
        compact=compact,
        pad_multiple=pad_multiple,
        **(game_kwargs or {}),
    )
    return result, flat_ids


def winner_metrics(result: gk.GameResult) -> tuple[jax.Array, jax.Array]:
    """Per-game winner metric matrix ``(B, M)`` and winner strategy gather seat.

    For safety-limit games the winner row is garbage (seat argmax) — callers
    must mask with ``result.completed``.
    """
    w = jnp.clip(result.winner_seat, 0, None)[:, None]  # (B,1)

    def at_winner(arr):
        return jnp.take_along_axis(arr, w, axis=1)[:, 0]

    metrics = jnp.stack(
        [
            result.winning_score,
            result.n_rounds,
            at_winner(result.n_farkles),
            at_winner(result.n_rolls),
            at_winner(result.highest_turn),
            at_winner(result.smart_five_uses),
            at_winner(result.n_smart_five_dice),
            at_winner(result.smart_one_uses),
            at_winner(result.n_smart_one_dice),
            at_winner(result.n_hot_dice),
            jnp.zeros_like(result.n_rounds),  # hit_max_rounds: 0 for winners
        ],
        axis=1,
    )
    return metrics, w[:, 0]


def aggregate(
    result: gk.GameResult, seat_ids: jax.Array, n_strategies: int
) -> TournamentAggregates:
    """Reduce a played batch into per-strategy aggregates (device-side).

    Semantics mirror the reference ``OutcomeCounter.record_row``
    (run_tournament.py:168-189): every seated strategy gets one attempted
    exposure per game; completed games add completed exposures and exactly one
    win; safety-limit games add safety exposures and no winner-conditioned
    data.
    """
    b, k = seat_ids.shape
    completed = result.completed
    flat_seats = seat_ids.reshape(-1)
    ones = jnp.ones(b * k, dtype=jnp.int32)
    comp_bk = jnp.repeat(completed, k).astype(jnp.int32)

    def seg(data):
        return jax.ops.segment_sum(data, flat_seats, num_segments=n_strategies)

    attempted = seg(ones)
    completed_exp = seg(comp_bk)
    safety_exp = attempted - completed_exp

    winner_sid = jnp.take_along_axis(
        seat_ids, jnp.clip(result.winner_seat, 0, None)[:, None], axis=1
    )[:, 0]
    win_inc = completed.astype(jnp.int32)
    wins = jax.ops.segment_sum(win_inc, winner_sid, num_segments=n_strategies)

    metrics, _ = winner_metrics(result)  # (B, M)
    masked = jnp.where(completed[:, None], metrics, 0)
    hi = masked // _SPLIT
    lo = masked % _SPLIT

    def seg_m(data):
        return jax.ops.segment_sum(data, winner_sid, num_segments=n_strategies)

    # zero out safety rows before segment (winner_sid is garbage there)
    def z(x):
        return jnp.where(completed[:, None], x, 0)

    return TournamentAggregates(
        wins=wins,
        attempted_exposures=attempted,
        completed_exposures=completed_exp,
        safety_limit_exposures=safety_exp,
        games_attempted=jnp.asarray(b, dtype=jnp.int32),
        games_completed=completed.astype(jnp.int32).sum(),
        games_safety_limit=(~completed).astype(jnp.int32).sum(),
        metric_sums=seg_m(z(masked)),
        metric_sq_hi2=seg_m(z(hi * hi)),
        metric_sq_hilo=seg_m(z(hi * lo)),
        metric_sq_lo2=seg_m(z(lo * lo)),
    )


# Winner-metric reduction implementation for aggregate_from_permutation:
#   "matmul" — exact MXU contraction (default): replaces the (NS, S, M)
#              expand+gather with one systolic-array contraction. Measured
#              equal-within-noise on the tunnel-attached v5e headline
#              program (results/headline_ab_k5_mmagg.json vs
#              headline_ab_k5.json — the device slope is dominated by the
#              roll-step loop, not aggregation) but removes the largest
#              intermediate tensor from the hot program;
#   "gather" — the round-3 permutation-gather path (kept as the
#              equivalence oracle; bit-identical by integer exactness).
_METRICS_IMPL_DEFAULT = "matmul"

# 7-bit limb planes cover every payload column: metric values < 2^22
# (METRIC_LABELS bound), square products hi*hi < 2^20, hi*lo < 2^22,
# lo*lo < 2^24 — four shifts reach bit 27.
_MM_SHIFTS = (0, 7, 14, 21)


def winner_metric_totals_matmul(
    masked: jax.Array,  # (B, M) int32 winner metrics, safety rows zeroed
    winner_sid: jax.Array,  # (B,) int32 winning strategy id (garbage rows
    #                         allowed where masked is zero)
    n_strategies: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Exact per-strategy metric totals as ONE MXU contraction.

    The per-strategy sums ``out[s, c] = sum_b payload[b, c] * [sid_b == s]``
    are a matmul between the winner one-hot and the payload columns. TPU
    matmuls ride the systolic array at hundreds of TFLOPs while the
    gather/scatter alternatives measured ~78 ms per 66k-game chunk
    (results/agg_cost_k5.json) — but bf16 operands only carry 8 mantissa
    bits, so exactness needs limb planes: each int32 payload column is
    split into 7-bit limbs (values 0..127, exactly representable in bf16);
    every per-(plane, strategy) accumulation is a sum of <= shuffles-many
    such limbs (each strategy wins at most once per shuffle), so all
    partial sums stay below 2^24 and float32 MXU accumulation is exact.
    Recombination ``sum(plane << shift)`` is monotone-bounded by the true
    int32 total, so int32 never overflows. Bit-identical to the gather
    path; tests assert equality.

    Payload columns: [metric sums, hi^2, hi*lo, lo^2] with hi/lo the
    ``_SPLIT`` square limbs — the exact contract of
    ``TournamentAggregates``.
    """
    b, m = masked.shape
    hi = masked // _SPLIT
    lo = masked % _SPLIT
    payload = jnp.concatenate([masked, hi * hi, hi * lo, lo * lo], axis=1)
    planes = jnp.concatenate(
        [(payload >> s) & 0x7F for s in _MM_SHIFTS], axis=1
    ).astype(jnp.bfloat16)  # (B, len(shifts)*4M)
    onehot = (
        winner_sid[:, None] == jnp.arange(n_strategies, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)  # (B, S)
    acc = jax.lax.dot_general(
        onehot,
        planes,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (S, len(shifts)*4M)
    acc = acc.astype(jnp.int32).reshape(n_strategies, len(_MM_SHIFTS), 4 * m)
    tot = sum(acc[:, i, :] << s for i, s in enumerate(_MM_SHIFTS))
    return tot[:, :m], tot[:, m : 2 * m], tot[:, 2 * m : 3 * m], tot[:, 3 * m :]


def aggregate_from_permutation(
    result: gk.GameResult, seat_ids: jax.Array, n_strategies: int, k: int,
    *, metrics_impl: str | None = None,
) -> TournamentAggregates:
    """Permutation-structured reduction: gathers instead of scatter-adds.

    Every strategy is seated exactly once per shuffle, so the per-shuffle
    seat assignment is a permutation of the grid. Inverting it turns every
    per-strategy sum into a *gather* (fast on TPU) followed by a clean
    reduction over the shuffle axis — replacing ~40 segment-sum scatters
    that measured ~80 ms/step. The winner-metric part goes further: the
    default "matmul" impl reduces it on the MXU
    (:func:`winner_metric_totals_matmul`). Bit-identical to
    :func:`aggregate` (pure integer sums, order-independent); tests assert
    equality.
    """
    ns_g, _ = seat_ids.shape
    perm = seat_ids.reshape(-1, n_strategies)  # (NS, S)
    ns = perm.shape[0]
    impl = metrics_impl or _METRICS_IMPL_DEFAULT
    if impl == "matmul" and ns >= (1 << 24) // 127:
        raise ValueError(
            f"{ns} shuffles exceed the bf16-exactness bound of the "
            "matmul metric reduction"
        )
    g = n_strategies // k
    inv = jnp.argsort(perm, axis=1)  # (NS, S): position of strategy s

    completed = result.completed.reshape(ns, g)
    winner_seat = result.winner_seat.reshape(ns, g)
    # per-position values (NS, S): position p belongs to game p//k, seat p%k
    pos_game = jnp.arange(n_strategies, dtype=jnp.int32) // k
    pos_seat = jnp.arange(n_strategies, dtype=jnp.int32) % k
    completed_pos = completed[:, pos_game]
    win_pos = completed_pos & (winner_seat[:, pos_game] == pos_seat[None, :])

    def gsum(pos_values):  # (NS, S) -> (S,)
        return jnp.take_along_axis(pos_values, inv, axis=1).sum(
            axis=0, dtype=jnp.int32
        )

    attempted = jnp.full((n_strategies,), ns, dtype=jnp.int32)
    completed_exp = gsum(completed_pos.astype(jnp.int32))
    wins = gsum(win_pos.astype(jnp.int32))

    metrics, _ = winner_metrics(result)  # (B, M)
    if impl == "matmul":
        masked_bm = jnp.where(result.completed[:, None], metrics, 0)
        winner_sid = jnp.take_along_axis(
            seat_ids, jnp.clip(result.winner_seat, 0, None)[:, None], axis=1
        )[:, 0]
        sums, sq_hi2, sq_hilo, sq_lo2 = winner_metric_totals_matmul(
            masked_bm, winner_sid, n_strategies
        )
    elif impl == "gather":
        masked = jnp.where(result.completed[:, None], metrics, 0).reshape(
            ns, g, N_METRICS
        )
        # expand winner metrics to positions, zeroed off the winner's seat
        metrics_pos = jnp.where(
            win_pos[:, :, None], masked[:, pos_game, :], 0
        )  # (NS, S, M)
        gathered = jnp.take_along_axis(metrics_pos, inv[:, :, None], axis=1)
        hi = gathered // _SPLIT
        lo = gathered % _SPLIT
        sums = gathered.sum(axis=0, dtype=jnp.int32)
        sq_hi2 = (hi * hi).sum(axis=0, dtype=jnp.int32)
        sq_hilo = (hi * lo).sum(axis=0, dtype=jnp.int32)
        sq_lo2 = (lo * lo).sum(axis=0, dtype=jnp.int32)
    else:
        raise ValueError(f"unknown metrics_impl {impl!r}")
    return TournamentAggregates(
        wins=wins,
        attempted_exposures=attempted,
        completed_exposures=completed_exp,
        safety_limit_exposures=attempted - completed_exp,
        games_attempted=jnp.asarray(ns * g, dtype=jnp.int32),
        games_completed=result.completed.astype(jnp.int32).sum(),
        games_safety_limit=(~result.completed).astype(jnp.int32).sum(),
        metric_sums=sums,
        metric_sq_hi2=sq_hi2,
        metric_sq_hilo=sq_hilo,
        metric_sq_lo2=sq_lo2,
    )


def play_and_aggregate(
    spec: TournamentSpec,
    params: tuple[jax.Array, jax.Array, jax.Array],
    shuffle_indices: jax.Array,
    *,
    compact: bool = True,
    pad_multiple: int | None = None,
    game_kwargs: dict | None = None,
) -> TournamentAggregates:
    """Fused play + reduce for one shuffle batch (the jit unit)."""
    result, seat_ids = play_shuffles(
        spec, params, shuffle_indices, compact=compact, pad_multiple=pad_multiple,
        game_kwargs=game_kwargs,
    )
    return aggregate_from_permutation(result, seat_ids, spec.n_strategies, spec.k)


def play_and_aggregate_blocks(
    spec: TournamentSpec,
    params: tuple[jax.Array, jax.Array, jax.Array],
    shuffle_indices_2d: jax.Array,  # (m_blocks, nsb) uint32, nsb <= 128
    *,
    compact: bool = True,
    pad_multiple: int | None = None,
    game_kwargs: dict | None = None,
) -> jax.Array:
    """Play a group of recovery blocks as ONE device batch; aggregate per block.

    Measured on v5e, the roll-step is latency-bound on its dependency chain:
    per-iteration cost is nearly flat in B (111 us at B=8k and B=33k,
    ``results/step_cost_k2.json``), so the marginal game is ~100x cheaper
    than the average one until B reaches ~10^6. A single recovery block is
    only 18k-111k games — far too small to fill the pipeline. This program
    therefore plays ``m`` whole blocks in one ``play_games`` batch and slices
    the aggregation at block boundaries (each block is <= 128 shuffles, so
    per-block int32 packed aggregates stay exact — no limb carry needed).

    Returns ``(m_blocks, packed_length)`` int32 — one buffer, one fetch,
    per-block exactness, so the runner's per-block persistence/resume
    story is unchanged. The reference's process pool has no analogous
    batch-size physics (run_tournament.py:1337 fans out per worker).
    """
    m, nsb = shuffle_indices_2d.shape
    if nsb > MAX_SHUFFLES_PER_BATCH:
        raise ValueError(
            f"block size {nsb} exceeds exact-aggregation bound "
            f"{MAX_SHUFFLES_PER_BATCH}"
        )
    flat = shuffle_indices_2d.reshape(-1)
    result, seat_ids = play_shuffles(
        spec, params, flat, compact=compact, pad_multiple=pad_multiple,
        game_kwargs=game_kwargs,
    )
    g = spec.games_per_shuffle
    per_block = nsb * g

    def agg_one(sl_result, sl_seats):
        return pack_aggregates(
            aggregate_from_permutation(
                sl_result, sl_seats, spec.n_strategies, spec.k
            )
        )

    rows = []
    for b in range(m):
        lo_i = b * per_block
        sl_res = jax.tree.map(lambda a: a[lo_i : lo_i + per_block], result)
        rows.append(agg_one(sl_res, seat_ids[lo_i : lo_i + per_block]))
    return jnp.stack(rows)


def play_and_aggregate_blocks_scanned(
    spec: TournamentSpec,
    params: tuple[jax.Array, jax.Array, jax.Array],
    shuffle_indices_2d: jax.Array,  # (m_blocks, nsb) uint32, nsb <= 128
    *,
    compact: bool = True,
    pad_multiple: int | None = None,
    game_kwargs: dict | None = None,
) -> jax.Array:
    """Scan a group of recovery blocks on device; aggregate per block.

    Same (m, packed_length) int32 contract as
    :func:`play_and_aggregate_blocks`, but the blocks run as a
    ``lax.scan`` of per-block game batches instead of one flat batch.
    Measured on v5e the scan family out-runs the flat m-block batch at
    production sizes (``results/scan_shape_sweep_k5.json``: the 8x64 chunk
    scan sustains 1.32M games/s at k=5 where the flat variant reaches
    ~1.07M and a single 64-shuffle dispatch only 683k — dispatch/fetch
    round trips amortize across the scanned blocks while each step keeps
    the fault-probed per-block batch shape). Per-block int32 aggregates
    are exact by the ``MAX_SHUFFLES_PER_BATCH`` bound; no limb carry is
    needed because nothing sums across blocks.
    """
    m, nsb = shuffle_indices_2d.shape
    if nsb > MAX_SHUFFLES_PER_BATCH:
        raise ValueError(
            f"block size {nsb} exceeds exact-aggregation bound "
            f"{MAX_SHUFFLES_PER_BATCH}"
        )

    def body(_, sh):
        packed = pack_aggregates(
            play_and_aggregate(
                spec, params, sh, compact=compact, pad_multiple=pad_multiple,
                game_kwargs=game_kwargs,
            )
        )
        return None, packed

    _, rows = jax.lax.scan(body, None, shuffle_indices_2d)
    return rows


def play_blocks_compact(
    spec: TournamentSpec,
    params: tuple[jax.Array, jax.Array, jax.Array],
    shuffle_indices_2d: jax.Array,  # (m_blocks, nsb) uint32, nsb <= 128
    *,
    family: str = "scan",
    compact: bool = True,
    pad_multiple: int | None = None,
    game_kwargs: dict | None = None,
):
    """Block group with a compact fetch: per-block counts, group metrics.

    The (m, packed) group programs fetch ~0.99 MB *per block* (4 + 4M
    int32 arrays of length S), and the device->host tunnel moves ~23 MB/s
    (results/fetch_bandwidth.json) — the fetch alone was ~43 ms of every
    145 ms production chunk. Per-block metric sums only serve resume
    granularity (analysis needs counts per deterministic batch but metrics
    only per cell), so this program returns:

    * ``counts`` (m, 2S+3) int32 — per-block wins, completed exposures and
      the three game totals (attempted exposures are the constant ``nsb``;
      safety = attempted - completed);
    * ``mlo``/``mhi`` (4*S*M,) int32 — the group's metric sums and three
      square limbs accumulated across blocks in 16-bit carry limbs
      (each per-block value v < 2^31 adds as ``v & 0xFFFF`` / ``v >> 16``;
      m <= 2^15 blocks keeps both int32-exact; host recombines
      ``lo + (hi << 16)`` into int64).

    ~3.7x less fetch per block; bit-identical totals (tests assert against
    the per-block path). Resume granularity for metrics becomes the group.
    """
    m, nsb = shuffle_indices_2d.shape
    if nsb > MAX_SHUFFLES_PER_BATCH:
        raise ValueError(
            f"block size {nsb} exceeds exact-aggregation bound "
            f"{MAX_SHUFFLES_PER_BATCH}"
        )

    def counts_and_metrics(agg: TournamentAggregates):
        counts = jnp.concatenate(
            [
                agg.wins,
                agg.completed_exposures,
                agg.games_attempted[None],
                agg.games_completed[None],
                agg.games_safety_limit[None],
            ]
        )
        metr = jnp.concatenate(
            [
                agg.metric_sums.ravel(),
                agg.metric_sq_hi2.ravel(),
                agg.metric_sq_hilo.ravel(),
                agg.metric_sq_lo2.ravel(),
            ]
        )
        return counts, metr

    if family == "flat":
        flat = shuffle_indices_2d.reshape(-1)
        result, seat_ids = play_shuffles(
            spec, params, flat, compact=compact, pad_multiple=pad_multiple,
            game_kwargs=game_kwargs,
        )
        per_block = nsb * spec.games_per_shuffle
        counts_rows = []
        mlo = jnp.zeros((4 * spec.n_strategies * N_METRICS,), jnp.int32)
        mhi = jnp.zeros_like(mlo)
        for b in range(m):
            lo_i = b * per_block
            sl_res = jax.tree.map(lambda a: a[lo_i : lo_i + per_block], result)
            agg = aggregate_from_permutation(
                sl_res, seat_ids[lo_i : lo_i + per_block],
                spec.n_strategies, spec.k,
            )
            counts, metr = counts_and_metrics(agg)
            counts_rows.append(counts)
            mlo = mlo + (metr & 0xFFFF)
            mhi = mhi + (metr >> 16)
        return jnp.stack(counts_rows), mlo, mhi

    def body(carry, sh):
        agg = play_and_aggregate(
            spec, params, sh, compact=compact, pad_multiple=pad_multiple,
            game_kwargs=game_kwargs,
        )
        counts, metr = counts_and_metrics(agg)
        lo, hi = carry
        return (lo + (metr & 0xFFFF), hi + (metr >> 16)), counts

    zero = jnp.zeros((4 * spec.n_strategies * N_METRICS,), jnp.int32)
    (mlo, mhi), counts = jax.lax.scan(body, (zero, zero), shuffle_indices_2d)
    return counts, mlo, mhi


def unpack_block_counts(
    counts_row: np.ndarray, nsb: int, games_per_shuffle: int, n_strategies: int
) -> "TournamentAccumulator":
    """One compact counts row -> a counts-only block accumulator."""
    s = n_strategies
    acc = TournamentAccumulator(s)
    wins = np.asarray(counts_row[:s], dtype=np.int64)
    completed = np.asarray(counts_row[s : 2 * s], dtype=np.int64)
    acc.wins += wins
    acc.completed_exposures += completed
    acc.attempted_exposures += nsb
    acc.safety_limit_exposures += nsb - completed
    acc.games_attempted += int(counts_row[2 * s])
    acc.games_completed += int(counts_row[2 * s + 1])
    acc.games_safety_limit += int(counts_row[2 * s + 2])
    return acc


def group_metrics_from_limbs(
    mlo: np.ndarray, mhi: np.ndarray, n_strategies: int
) -> tuple[np.ndarray, np.ndarray]:
    """(mlo, mhi) int32 limb sums -> int64 (metric_sums, metric_sq_sums)."""
    total = np.asarray(mlo, dtype=np.int64) + (
        np.asarray(mhi, dtype=np.int64) << 16
    )
    s, mm = n_strategies, N_METRICS
    parts = total.reshape(4, s, mm)
    sums = parts[0]
    sq = parts[1] * (_SPLIT * _SPLIT) + 2 * _SPLIT * parts[2] + parts[3]
    return sums, sq


def play_and_aggregate_blocks_with_rows(
    spec: TournamentSpec,
    params: tuple[jax.Array, jax.Array, jax.Array],
    shuffle_indices_2d: jax.Array,  # (m_blocks, nsb) uint32, nsb <= 128
    *,
    compact: bool = True,
    pad_multiple: int | None = None,
    game_kwargs: dict | None = None,
    row_format: str = "wide",
):
    """Row-export twin of :func:`play_and_aggregate_blocks`.

    One device batch plays ``m`` whole recovery blocks; returns per-block
    packed aggregates ``(m, packed_length)`` plus the packed per-game row
    buffer ``(m * nsb * games_per_shuffle, 6 + 12K)`` — two fetches per
    dispatch total. Row order is (block, shuffle, game) coordinate order,
    so host-side slicing by block is a view. Replaces the per-chunk
    dispatch that ran row export at ~9.7k games/s (round-2 RESULTS.md);
    the reference writes row shards from every worker in parallel
    (run_tournament.py:491-513).
    """
    m, nsb = shuffle_indices_2d.shape
    if nsb > MAX_SHUFFLES_PER_BATCH:
        raise ValueError(
            f"block size {nsb} exceeds exact-aggregation bound "
            f"{MAX_SHUFFLES_PER_BATCH}"
        )
    flat = shuffle_indices_2d.reshape(-1)
    result, seat_ids = play_shuffles(
        spec, params, flat, compact=compact, pad_multiple=pad_multiple,
        game_kwargs=game_kwargs,
    )
    g = spec.games_per_shuffle
    per_block = nsb * g
    rows = []
    for b in range(m):
        lo_i = b * per_block
        sl_res = jax.tree.map(lambda a: a[lo_i : lo_i + per_block], result)
        rows.append(
            pack_aggregates(
                aggregate_from_permutation(
                    sl_res, seat_ids[lo_i : lo_i + per_block],
                    spec.n_strategies, spec.k,
                )
            )
        )
    if row_format == "bits":
        words, overflow = pack_result_rows_bits(result, seat_ids)
        return jnp.stack(rows), words, overflow
    return jnp.stack(rows), pack_result_rows(result, seat_ids)


def play_and_aggregate_block(
    spec: TournamentSpec,
    params: tuple[jax.Array, jax.Array, jax.Array],
    shuffle_indices_2d: jax.Array,  # (n_chunks, ns) uint32
    *,
    compact: bool = True,
    pad_multiple: int | None = None,
    game_kwargs: dict | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Scan a whole deterministic block of chunks on device: one dispatch.

    The reference pays one process-pool round trip per chunk
    (run_tournament.py:1337); on a remote-tunneled accelerator each dispatch
    costs a ~30 ms round trip, which dominated production throughput at the
    fault-safe 16-shuffle chunk size. Scanning the block's chunks *on device*
    (same per-chunk program and batch shapes as individual dispatches) and
    accumulating the packed aggregates in a carry makes a block cost one
    dispatch + one fetch, with no change to chunk shapes or results.

    Exactness across chunks: a single chunk's int32 packed aggregate is
    exact by the ``MAX_SHUFFLES_PER_BATCH`` bound, but sums across a block's
    many chunks can exceed int32 for metric sums — and TPU jax runs with
    x64 disabled. The carry is therefore a (lo16, hi15) split-limb pair of
    int32 vectors (every packed value is non-negative), exact for up to
    2**15 chunks per block; the host recombines into int64
    (:func:`unpack_block_aggregates`).
    """

    def body(carry, sh):
        lo, hi = carry
        packed = pack_aggregates(
            play_and_aggregate(
                spec, params, sh, compact=compact, pad_multiple=pad_multiple,
                game_kwargs=game_kwargs,
            )
        )
        return (lo + (packed & 0xFFFF), hi + (packed >> 16)), None

    n = packed_length(spec.n_strategies)
    init = (jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32))
    (lo, hi), _ = jax.lax.scan(body, init, shuffle_indices_2d)
    return lo, hi


def unpack_block_aggregates(
    lo_hi: tuple[jax.Array, jax.Array], n_strategies: int
) -> TournamentAggregates:
    """Host-side inverse of :func:`play_and_aggregate_block`'s limb carry."""
    lo, hi = lo_hi
    total = np.asarray(lo, dtype=np.int64) + (np.asarray(hi, dtype=np.int64) << 16)
    return unpack_aggregates(total, n_strategies)


# per-game scalar GameResult fields, in packed-row order
_ROW_GAME_FIELDS = (
    "completed", "winner_seat", "winning_score", "margin", "n_rounds",
    "roll_limit_hits",
)
# (B, K) GameResult fields, in packed-row order (seat_ids appended last)
_ROW_SEAT_FIELDS = (
    "scores", "ranks", "n_farkles", "n_rolls", "n_turns", "highest_turn",
    "smart_five_uses", "n_smart_five_dice", "smart_one_uses",
    "n_smart_one_dice", "n_hot_dice",
)


def pack_result_rows(result: gk.GameResult, seat_ids: jax.Array) -> jax.Array:
    """All row-export fields in one ``(B, 6 + 12K)`` int32 buffer.

    A remote backend pays a full round trip per fetched array; the row path
    had been fetching ~35 arrays per chunk, which dominated row-export wall
    clock. One buffer = one fetch (host-side inverse:
    :func:`unpack_result_rows`).
    """
    per_game = jnp.stack(
        [getattr(result, f).astype(jnp.int32) for f in _ROW_GAME_FIELDS], axis=1
    )
    per_seat = [getattr(result, f).astype(jnp.int32) for f in _ROW_SEAT_FIELDS]
    return jnp.concatenate([per_game, *per_seat, seat_ids.astype(jnp.int32)], axis=1)


# ── bit-packed row export ────────────────────────────────────────────────────
# Row export is fetch-bandwidth bound on remote backends (~22-27 MB/s
# measured, results/fetch_bandwidth.json): the wide (B, 6+12K) int32 buffer
# costs 264 B/game at k=5. The bit-packed format below packs the same 17
# fields into ~100 B/game with per-field validated widths — a runtime
# overflow flag (one OR-reduce on device) guards every width that is not
# provable from the rules, and the runner falls back to the wide format for
# the (never observed) chunk that trips it. Field widths, LSB-first greedy
# word layout, and the host-side inverse all derive from ONE table so the
# two sides cannot drift.
#
# Provable widths: n_rounds/n_turns/n_farkles <= max_rounds+2 (9 bits at the
# production cap), ranks <= K <= 15, winner_seat+1 <= K+1, seat_id < 8192
# for the 5,160-strategy grid. Validated widths (overflow-checked): scores/
# winning_score/margin/highest_turn < 2^18, n_rolls < 2^13, smart-discard
# and hot-dice counters < 2^11..2^12, roll_limit_hits < 2^8.

_ROW_BITS_GAME = (
    ("completed", 1), ("winner_seat_p1", 4), ("n_rounds", 9),
    ("roll_limit_hits", 8), ("winning_score", 18), ("margin", 18),
)
_ROW_BITS_SEAT = (
    ("scores", 18), ("ranks", 4), ("n_farkles", 9), ("n_rolls", 13),
    ("n_turns", 9), ("highest_turn", 18), ("smart_five_uses", 11),
    ("n_smart_five_dice", 12), ("smart_one_uses", 11),
    ("n_smart_one_dice", 12), ("n_hot_dice", 11), ("seat_id", 13),
)


def row_bits_layout(k: int) -> tuple[list, int]:
    """Greedy LSB-first word layout: [((field, seat|None), word, shift, bits)]."""
    slots: list = []
    word = 0
    used = 0

    def place(name, seat, bits):
        nonlocal word, used
        if used + bits > 32:
            word += 1
            used = 0
        slots.append(((name, seat), word, used, bits))
        used += bits

    for name, bits in _ROW_BITS_GAME:
        place(name, None, bits)
    for j in range(k):
        for name, bits in _ROW_BITS_SEAT:
            place(name, j, bits)
    return slots, word + 1


def pack_result_rows_bits(
    result: gk.GameResult, seat_ids: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Device-side bit pack -> ``((W, B) uint32 words, () bool overflow)``.

    The words buffer is laid out ``(W, B)`` — batch in the minor dimension —
    so the on-device tiling is dense and the fetch transfers no lane
    padding. ``overflow`` is True iff ANY field exceeded its validated
    width; the caller must then replay the chunk through the wide format.
    """
    b, k = seat_ids.shape
    slots, n_words = row_bits_layout(k)

    def value_of(name, seat):
        if name == "winner_seat_p1":
            return result.winner_seat + 1
        if name == "seat_id":
            return seat_ids[:, seat]
        v = getattr(result, name)
        if name in {f for f, _ in _ROW_BITS_GAME}:
            return v.astype(jnp.int32)
        return v[:, seat].astype(jnp.int32)

    words = [jnp.zeros((b,), dtype=jnp.uint32) for _ in range(n_words)]
    overflow = jnp.zeros((b,), dtype=bool)
    for (name, seat), w, shift, bits in slots:
        v = value_of(name, seat).astype(jnp.uint32)
        overflow |= (v >> bits) != 0
        words[w] = words[w] | (v << shift)
    return jnp.stack(words), overflow.any()


def unpack_result_rows_bits(packed, k: int) -> tuple[gk.GameResult, np.ndarray]:
    """Host-side inverse of :func:`pack_result_rows_bits` (numpy bit ops)."""
    arr = np.asarray(packed).astype(np.uint32)  # (W, B)
    slots, n_words = row_bits_layout(k)
    if arr.shape[0] != n_words:
        raise ValueError(f"packed row words {arr.shape[0]} != layout {n_words}")
    b = arr.shape[1]
    game: dict[str, np.ndarray] = {}
    seat: dict[str, np.ndarray] = {
        name: np.empty((b, k), dtype=np.int32) for name, _ in _ROW_BITS_SEAT
    }
    for (name, sj), w, shift, bits in slots:
        v = ((arr[w] >> np.uint32(shift)) & np.uint32((1 << bits) - 1)).astype(
            np.int32
        )
        if sj is None:
            game[name] = v
        else:
            seat[name][:, sj] = v
    seat_ids = seat.pop("seat_id")
    fields: dict[str, np.ndarray] = dict(seat)
    fields["completed"] = game["completed"].astype(bool)
    fields["winner_seat"] = game["winner_seat_p1"] - 1
    fields["winning_score"] = game["winning_score"]
    fields["margin"] = game["margin"]
    fields["n_rounds"] = game["n_rounds"]
    fields["roll_limit_hits"] = game["roll_limit_hits"]
    return gk.GameResult(**fields), seat_ids


def unpack_result_rows(packed, k: int) -> tuple[gk.GameResult, np.ndarray]:
    """Host-side inverse of :func:`pack_result_rows` (numpy views)."""
    arr = np.asarray(packed)
    fields: dict[str, np.ndarray] = {}
    for i, f in enumerate(_ROW_GAME_FIELDS):
        fields[f] = arr[:, i]
    fields["completed"] = fields["completed"].astype(bool)
    off = len(_ROW_GAME_FIELDS)
    for j, f in enumerate(_ROW_SEAT_FIELDS):
        fields[f] = arr[:, off + j * k : off + (j + 1) * k]
    seat_ids = arr[:, off + len(_ROW_SEAT_FIELDS) * k :]
    return gk.GameResult(**fields), seat_ids


def play_and_aggregate_with_rows(
    spec: TournamentSpec,
    params: tuple[jax.Array, jax.Array, jax.Array],
    shuffle_indices: jax.Array,
    *,
    compact: bool = True,
    pad_multiple: int | None = None,
    row_format: str = "wide",
):
    """Play + reduce, also returning packed per-game rows for export.

    ``row_format="bits"`` returns ``(agg, words, overflow)`` with the
    ~2.6x-smaller bit-packed buffer (fetch-bandwidth is the row path's
    bottleneck); ``"wide"`` returns ``(agg, packed_rows)``.
    """
    result, seat_ids = play_shuffles(
        spec, params, shuffle_indices, compact=compact, pad_multiple=pad_multiple
    )
    agg = aggregate_from_permutation(result, seat_ids, spec.n_strategies, spec.k)
    if row_format == "bits":
        words, overflow = pack_result_rows_bits(result, seat_ids)
        return agg, words, overflow
    return agg, pack_result_rows(result, seat_ids)


# ---------------------------------------------------------------------------
# Host-side exact accumulation
# ---------------------------------------------------------------------------


class TournamentAccumulator:
    """Exact int64 host accumulator over device batches.

    Addition is associative and commutative here, so absorption order never
    affects results (unlike float accumulation) — any resume/replay order of
    deterministic batches reproduces identical totals.
    """

    def __init__(self, n_strategies: int) -> None:
        s, m = n_strategies, N_METRICS
        self.n_strategies = n_strategies
        self.wins = np.zeros(s, dtype=np.int64)
        self.attempted_exposures = np.zeros(s, dtype=np.int64)
        self.completed_exposures = np.zeros(s, dtype=np.int64)
        self.safety_limit_exposures = np.zeros(s, dtype=np.int64)
        self.games_attempted = 0
        self.games_completed = 0
        self.games_safety_limit = 0
        self.metric_sums = np.zeros((s, m), dtype=np.int64)
        self.metric_sq_sums = np.zeros((s, m), dtype=np.int64)

    def absorb(self, agg: TournamentAggregates) -> None:
        """Add one device batch (or a restored per-block aggregate)."""
        a = jax.tree.map(lambda x: np.asarray(x, dtype=np.int64), agg)
        self.wins += a.wins
        self.attempted_exposures += a.attempted_exposures
        self.completed_exposures += a.completed_exposures
        self.safety_limit_exposures += a.safety_limit_exposures
        self.games_attempted += int(a.games_attempted)
        self.games_completed += int(a.games_completed)
        self.games_safety_limit += int(a.games_safety_limit)
        self.metric_sums += a.metric_sums
        self.metric_sq_sums += (
            a.metric_sq_hi2 * (_SPLIT * _SPLIT)
            + 2 * _SPLIT * a.metric_sq_hilo
            + a.metric_sq_lo2
        )

    def add_metric_totals(self, sums_i64: np.ndarray, sq_i64: np.ndarray) -> None:
        """Absorb group-level int64 metric totals (compact-fetch path)."""
        self.metric_sums += sums_i64
        self.metric_sq_sums += sq_i64

    def merge(self, other: "TournamentAccumulator") -> None:
        """Absorb another accumulator (cross-block / cross-host reduction)."""
        if other.n_strategies != self.n_strategies:
            raise ValueError("accumulator strategy-count mismatch")
        self.wins += other.wins
        self.attempted_exposures += other.attempted_exposures
        self.completed_exposures += other.completed_exposures
        self.safety_limit_exposures += other.safety_limit_exposures
        self.games_attempted += other.games_attempted
        self.games_completed += other.games_completed
        self.games_safety_limit += other.games_safety_limit
        self.metric_sums += other.metric_sums
        self.metric_sq_sums += other.metric_sq_sums

    def check_conservation(self) -> None:
        """Exposure conservation invariants (run_tournament.py:644-672 analogue)."""
        k_total = self.attempted_exposures.sum()
        if self.games_attempted and k_total % self.games_attempted != 0:
            raise ValueError("attempted exposures are not a multiple of games")
        if (
            self.attempted_exposures
            != self.completed_exposures + self.safety_limit_exposures
        ).any():
            raise ValueError("attempted != completed + safety_limit exposures")
        if self.games_attempted != self.games_completed + self.games_safety_limit:
            raise ValueError("game outcome counts do not conserve")
        if self.wins.sum() != self.games_completed:
            raise ValueError("wins must equal completed games")

    def state_dict(self) -> dict:
        """Serializable exact state (for checkpoints)."""
        return {
            "n_strategies": self.n_strategies,
            "wins": self.wins,
            "attempted_exposures": self.attempted_exposures,
            "completed_exposures": self.completed_exposures,
            "safety_limit_exposures": self.safety_limit_exposures,
            "games_attempted": self.games_attempted,
            "games_completed": self.games_completed,
            "games_safety_limit": self.games_safety_limit,
            "metric_sums": self.metric_sums,
            "metric_sq_sums": self.metric_sq_sums,
        }

    @classmethod
    def from_state_dict(cls, state: dict) -> "TournamentAccumulator":
        acc = cls(int(state["n_strategies"]))
        acc.wins = np.asarray(state["wins"], dtype=np.int64).copy()
        acc.attempted_exposures = np.asarray(
            state["attempted_exposures"], dtype=np.int64
        ).copy()
        acc.completed_exposures = np.asarray(
            state["completed_exposures"], dtype=np.int64
        ).copy()
        acc.safety_limit_exposures = np.asarray(
            state["safety_limit_exposures"], dtype=np.int64
        ).copy()
        acc.games_attempted = int(state["games_attempted"])
        acc.games_completed = int(state["games_completed"])
        acc.games_safety_limit = int(state["games_safety_limit"])
        acc.metric_sums = np.asarray(state["metric_sums"], dtype=np.int64).copy()
        acc.metric_sq_sums = np.asarray(state["metric_sq_sums"], dtype=np.int64).copy()
        return acc
