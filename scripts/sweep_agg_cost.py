"""Decompose the per-chunk aggregation cost (the measured 92 ms at k=5).

results/chunk_overhead_k5.json showed play-to-completion at 53 ms and
play+aggregate at 145 ms: aggregation is 2/3 of a production chunk. This
sweep times play + partial aggregations to find which piece pays:

  * play      : completion only (baseline)
  * argsort   : + the (NS, S) permutation inversion
  * counts    : + wins/exposure gathers (no metrics)
  * full-perm : + the (NS, S, M) metrics gather (production)
  * full-seg  : the segment-sum aggregation variant instead
  * counts-seg: counts via permutation, metrics via segment_sum on (B, M)

Usage: python scripts/sweep_agg_cost.py [--k 5] [--ns 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--ns", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--out", default="results/agg_cost_k5.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from farkle_ii_tpu.simulation import strategies as S
    from farkle_ii_tpu.simulation import tournament as T
    from farkle_ii_tpu.utils.aot_cache import cached_compile

    k, ns = args.k, args.ns
    grid = S.build_strategy_grid()
    spec = T.TournamentSpec(root_seed=42, k=k, n_strategies=len(grid))
    p = S.pack_strategy_params(grid)
    params = (
        jnp.asarray(p.score_threshold),
        jnp.asarray(p.dice_threshold),
        jnp.asarray(p.flags),
    )
    batch = ns * spec.games_per_shuffle
    n_s = spec.n_strategies
    print(f"k={k} ns={ns} batch={batch}", flush=True)

    def play(prm, sh):
        return T.play_shuffles(spec, prm, sh, compact=True)

    def v_play(prm, sh):
        res, _ = play(prm, sh)
        return res.winning_score.sum() + res.n_rounds.sum()

    def v_argsort(prm, sh):
        res, seat_ids = play(prm, sh)
        perm = seat_ids.reshape(-1, n_s)
        inv = jnp.argsort(perm, axis=1)
        return inv.sum() + res.winning_score.sum()

    def v_counts(prm, sh):
        res, seat_ids = play(prm, sh)
        perm = seat_ids.reshape(-1, n_s)
        nsh = perm.shape[0]
        g = n_s // k
        inv = jnp.argsort(perm, axis=1)
        completed = res.completed.reshape(nsh, g)
        winner_seat = res.winner_seat.reshape(nsh, g)
        pos_game = jnp.arange(n_s, dtype=jnp.int32) // k
        pos_seat = jnp.arange(n_s, dtype=jnp.int32) % k
        completed_pos = completed[:, pos_game]
        win_pos = completed_pos & (winner_seat[:, pos_game] == pos_seat[None, :])
        comp = jnp.take_along_axis(completed_pos.astype(jnp.int32), inv, axis=1).sum(axis=0)
        wins = jnp.take_along_axis(win_pos.astype(jnp.int32), inv, axis=1).sum(axis=0)
        return comp.sum() + wins.sum()

    def v_full_perm(prm, sh):
        res, seat_ids = play(prm, sh)
        agg = T.aggregate_from_permutation(res, seat_ids, n_s, k)
        return T.pack_aggregates(agg)

    def v_full_seg(prm, sh):
        res, seat_ids = play(prm, sh)
        agg = T.aggregate(res, seat_ids, n_s)
        return T.pack_aggregates(agg)

    def v_counts_seg(prm, sh):
        # counts via permutation gathers; winner metrics via segment_sum
        # keyed on winner strategy ids over (B, M) — no (NS, S, M) gather
        res, seat_ids = play(prm, sh)
        perm = seat_ids.reshape(-1, n_s)
        nsh = perm.shape[0]
        g = n_s // k
        inv = jnp.argsort(perm, axis=1)
        completed = res.completed.reshape(nsh, g)
        winner_seat = res.winner_seat.reshape(nsh, g)
        pos_game = jnp.arange(n_s, dtype=jnp.int32) // k
        pos_seat = jnp.arange(n_s, dtype=jnp.int32) % k
        completed_pos = completed[:, pos_game]
        win_pos = completed_pos & (winner_seat[:, pos_game] == pos_seat[None, :])
        comp = jnp.take_along_axis(completed_pos.astype(jnp.int32), inv, axis=1).sum(axis=0)
        wins = jnp.take_along_axis(win_pos.astype(jnp.int32), inv, axis=1).sum(axis=0)
        metrics, _ = T.winner_metrics(res)
        masked = jnp.where(res.completed[:, None], metrics, 0)
        winner_sid = jnp.take_along_axis(
            seat_ids, jnp.clip(res.winner_seat, 0, None)[:, None], axis=1
        )[:, 0]
        winner_sid = jnp.where(res.completed, winner_sid, n_s)  # safety -> pad bin
        sums = jax.ops.segment_sum(masked, winner_sid, num_segments=n_s + 1)[:n_s]
        hi = masked // 46341
        lo = masked % 46341
        hi2 = jax.ops.segment_sum(hi * hi, winner_sid, num_segments=n_s + 1)[:n_s]
        return comp.sum() + wins.sum() + sums.sum() + hi2.sum() + lo.sum()

    variants = {
        "play": v_play,
        "argsort": v_argsort,
        "counts": v_counts,
        "full-perm": v_full_perm,
        "full-seg": v_full_seg,
        "counts-seg": v_counts_seg,
    }
    programs = {}
    t0 = time.perf_counter()
    for name, fn in variants.items():
        programs[name] = cached_compile(
            fn, params, jnp.arange(ns, dtype=jnp.uint32),
            extra_key=f"aggcost-{name}-k{k}-{ns}",
        )
    print(f"compiled in {time.perf_counter()-t0:.0f}s", flush=True)

    counter = [5000]

    def call(name):
        lo = counter[0]
        counter[0] += ns
        out = programs[name](params, jnp.arange(lo, lo + ns, dtype=jnp.uint32))
        if isinstance(out, tuple):
            for o in out:
                np.asarray(o)
        else:
            np.asarray(out)

    for name in programs:
        for _ in range(3):
            call(name)
    samples: dict[str, list[float]] = {n: [] for n in programs}
    for _ in range(args.rounds):
        for name in programs:
            t0 = time.perf_counter()
            call(name)
            samples[name].append(time.perf_counter() - t0)

    results = {}
    for name, ts in samples.items():
        med = float(np.median(ts))
        results[name] = {"median_s": round(med, 4), "games_per_sec": round(batch / med)}
        print(f"{name:10s} median {med*1e3:8.1f} ms  -> {batch/med:9.0f} games/s",
              flush=True)
    Path(args.out).write_text(json.dumps(
        {"k": k, "ns": ns, "batch": batch, "results": results}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
