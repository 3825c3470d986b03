"""Probe winner-metric reduction variants (the 78-128 ms chunk dominator).

Variants, each computing the full (S, M) metric sums + three square-limb
sums on top of play-to-completion + count gathers:

  * gather2d : eleven 2-D take_along_axis gathers (hybrid v2)
  * gather3d : the round-3 (NS, S, M) broadcast-indexed gather
  * mxu      : per-shuffle one-hot matmul on the MXU — exact because each
               (shuffle, strategy) cell holds at most one win, so every f32
               product/sum stays under 2^24
  * none     : counts only (floor)

Checksums are weighted sums (defeats algebraic simplification of the
reduction). Usage: python scripts/sweep_metrics_agg.py [--k 5] [--ns 64]
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
    ap.add_argument("--out", default="results/metrics_agg_k5.json")
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
    M = T.N_METRICS
    SPLIT = 1 << 12
    print(f"k={k} ns={ns} batch={batch}", flush=True)

    def base(prm, sh):
        res, seat_ids = T.play_shuffles(spec, prm, sh, compact=True)
        perm = seat_ids.reshape(-1, n_s)
        nsh = perm.shape[0]
        g = n_s // k
        inv = jnp.argsort(perm, axis=1)
        completed = res.completed.reshape(nsh, g)
        winner_seat = res.winner_seat.reshape(nsh, g)
        rep = lambda a: jnp.repeat(a, k, axis=1)
        pos_seat = jnp.arange(n_s, dtype=jnp.int32) % k
        completed_pos = rep(completed)
        win_pos = completed_pos & (rep(winner_seat) == pos_seat[None, :])
        comp = jnp.take_along_axis(completed_pos.astype(jnp.int32), inv, axis=1).sum(axis=0)
        wins = jnp.take_along_axis(win_pos.astype(jnp.int32), inv, axis=1).sum(axis=0)
        metrics, _ = T.winner_metrics(res)
        masked = jnp.where(res.completed[:, None], metrics, 0)
        return res, seat_ids, inv, win_pos, masked, comp, wins, nsh, g

    w_s = None  # set lazily inside variants via closure over jnp

    def checksum(arrs):
        total = jnp.float32(0)
        for a in arrs:
            wts = (jnp.arange(a.size, dtype=jnp.float32) % 97 + 1).reshape(a.shape)
            total = total + (a.astype(jnp.float32) * wts).sum()
        return total

    def v_none(prm, sh):
        *_, comp, wins, _, _ = base(prm, sh)
        return checksum([comp, wins])

    def v_gather2d(prm, sh):
        res, seat_ids, inv, win_pos, masked, comp, wins, nsh, g = base(prm, sh)
        metrics3 = masked.reshape(nsh, g, M)
        outs = [comp, wins]
        for mm in range(M):
            vals = jnp.where(win_pos, jnp.repeat(metrics3[:, :, mm], k, axis=1), 0)
            gath = jnp.take_along_axis(vals, inv, axis=1)
            hi = gath // SPLIT
            lo = gath % SPLIT
            outs += [gath.sum(0), (hi * hi).sum(0), (hi * lo).sum(0), (lo * lo).sum(0)]
        return checksum(outs)

    def v_gather3d(prm, sh):
        res, seat_ids, inv, win_pos, masked, comp, wins, nsh, g = base(prm, sh)
        pos_game = jnp.arange(n_s, dtype=jnp.int32) // k
        metrics3 = masked.reshape(nsh, g, M)
        metrics_pos = jnp.where(win_pos[:, :, None], metrics3[:, pos_game, :], 0)
        gath = jnp.take_along_axis(metrics_pos, inv[:, :, None], axis=1)
        hi = gath // SPLIT
        lo = gath % SPLIT
        return checksum([
            comp, wins, gath.sum(0), (hi * hi).sum(0), (hi * lo).sum(0),
            (lo * lo).sum(0),
        ])

    def v_mxu(prm, sh):
        res, seat_ids, inv, win_pos, masked, comp, wins, nsh, g = base(prm, sh)
        # winner strategy id per game; safety games -> out-of-range id that
        # matches no strategy row (one-hot all-zero)
        winner_sid = jnp.take_along_axis(
            seat_ids, jnp.clip(res.winner_seat, 0, None)[:, None], axis=1
        )[:, 0]
        winner_sid = jnp.where(res.completed, winner_sid, n_s)
        sid3 = winner_sid.reshape(nsh, g)
        hi = masked // SPLIT
        lo = masked % SPLIT
        vals = jnp.concatenate(
            [masked, hi * hi, hi * lo, lo * lo], axis=1
        ).astype(jnp.float32).reshape(nsh, g, 4 * M)
        onehot = (
            sid3[:, :, None] == jnp.arange(n_s, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.bfloat16)  # (NS, G, S)
        per_shuffle = jax.lax.dot_general(
            onehot, vals,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (NS, S, 4M)
        sums = per_shuffle.astype(jnp.int32).sum(axis=0)  # (S, 4M)
        return checksum([comp, wins, sums])

    variants = {
        "none": v_none, "gather2d": v_gather2d,
        "gather3d": v_gather3d, "mxu": v_mxu,
    }
    programs = {}
    t0 = time.perf_counter()
    for name, fn in variants.items():
        programs[name] = cached_compile(
            fn, params, jnp.arange(ns, dtype=jnp.uint32),
            extra_key=f"metragg-{name}-k{k}-{ns}",
        )
    print(f"compiled in {time.perf_counter()-t0:.0f}s", flush=True)

    counter = [9000]

    def call(name):
        lo = counter[0]
        counter[0] += ns
        float(np.asarray(programs[name](params, jnp.arange(lo, lo + ns, dtype=jnp.uint32))))

    for name in programs:
        for _ in range(3):
            call(name)
    samples: dict[str, list[float]] = {n2: [] for n2 in programs}
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
