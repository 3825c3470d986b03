"""Decompose a production chunk's cost at the VMEM-resident batch size.

The iter-scaling sweep showed per-iteration cost is ~0 at B=66k (the loop
carry stays on-chip) with ~35-40 ms of per-dispatch overhead. This sweep
asks what the play-to-completion machinery adds on top:

  * prod-c / prod-nc : play_and_aggregate chunk, compaction on / off
  * pipe8-c / pipe8-nc : the same, 8 dispatches issued before any fetch
    (does pipelining hide the per-dispatch overhead?)
  * fori1024 : fixed 1024 roll-steps, no while/compaction/aggregation
    (is the straggler tail free at this batch size?)
  * play-c : play_games to completion without aggregation

One process, >=3 warmups each, interleaved rounds, medians, forced fetches
(tests/FAILURE_NOTES.md discipline).

Usage: python scripts/sweep_chunk_overhead.py [--k 5] [--ns 64]
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
    ap.add_argument("--out", default="results/chunk_overhead_k5.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from farkle_ii_tpu.ops import game_kernel as gk
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
    g = spec.games_per_shuffle
    batch = ns * g
    print(f"k={k} ns={ns} batch={batch} games/chunk", flush=True)

    def agg_chunk(compact):
        def fn(prm, sh):
            return T.pack_aggregates(
                T.play_and_aggregate(spec, prm, sh, compact=compact)
            )
        return cached_compile(
            fn, params, jnp.arange(ns, dtype=jnp.uint32),
            extra_key=f"chunkov-agg-k{k}-{ns}" + ("" if compact else "-nc"),
        )

    def fori_fixed(n_iters):
        ids = np.arange(batch * k, dtype=np.int64) % len(grid)
        pp = S.pack_strategy_params([grid[i] for i in ids])
        st = tuple(jnp.asarray(pp.score_threshold[i::k]) for i in range(k))
        dt = tuple(jnp.asarray(pp.dice_threshold[i::k]) for i in range(k))
        fl = tuple(jnp.asarray(pp.flags[i::k]) for i in range(k))
        kd = np.random.default_rng(5).integers(0, 2**32, (batch, 2), dtype=np.uint32)
        k0, k1 = jnp.asarray(kd[:, 0]), jnp.asarray(kd[:, 1])
        step = gk.make_game_step(k=k)

        def run():
            s = gk.init_state(batch, k)
            s = jax.lax.fori_loop(0, n_iters, lambda i, s2: step(s2, k0, k1, st, dt, fl), s)
            return s.turn_score.sum() + s.dice_left.sum()

        return cached_compile(run, extra_key=f"chunkov-fori-k{k}-b{batch}-n{n_iters}")

    def play_only(compact):
        def fn(prm, sh):
            res, seat_ids = T.play_shuffles(spec, prm, sh, compact=compact)
            return res.winning_score.sum() + res.n_rounds.sum()
        return cached_compile(
            fn, params, jnp.arange(ns, dtype=jnp.uint32),
            extra_key=f"chunkov-play-k{k}-{ns}" + ("" if compact else "-nc"),
        )

    def rows_chunk(compact):
        def fn(prm, sh):
            agg, packed_rows = T.play_and_aggregate_with_rows(
                spec, prm, sh, compact=compact
            )
            return T.pack_aggregates(agg), packed_rows
        return cached_compile(
            fn, params, jnp.arange(ns, dtype=jnp.uint32),
            extra_key=f"chunkov-rows-k{k}-{ns}" + ("" if compact else "-nc"),
        )

    programs = {}
    t0 = time.perf_counter()
    programs["prod-c"] = agg_chunk(True)
    programs["prod-nc"] = agg_chunk(False)
    programs["fori1024"] = fori_fixed(1024)
    programs["play-c"] = play_only(True)
    programs["rows-c"] = rows_chunk(True)
    print(f"compiled in {time.perf_counter()-t0:.0f}s", flush=True)

    sh_counter = [1000]

    def call(name, fetch=True):
        fn = programs[name]
        if name == "fori1024":
            out = fn()
            if fetch:
                int(np.asarray(out))
            return out
        lo = sh_counter[0]
        sh_counter[0] += ns
        out = fn(params, jnp.arange(lo, lo + ns, dtype=jnp.uint32))
        if fetch:
            if isinstance(out, tuple):
                for o in out:
                    np.asarray(o)
            else:
                np.asarray(out)
        return out

    # warmups
    for name in programs:
        for _ in range(3):
            call(name)

    samples: dict[str, list[float]] = {n: [] for n in programs}
    samples["pipe8-c"] = []
    for _ in range(args.rounds):
        for name in programs:
            t0 = time.perf_counter()
            call(name)
            samples[name].append(time.perf_counter() - t0)
        # pipelined: issue 8 compacted chunks, then fetch all
        t0 = time.perf_counter()
        outs = [call("prod-c", fetch=False) for _ in range(8)]
        for o in outs:
            np.asarray(o)
        samples["pipe8-c"].append((time.perf_counter() - t0) / 8)

    results = {}
    for name, ts in samples.items():
        med = float(np.median(ts))
        per_game = batch / med
        results[name] = {"median_s": round(med, 4), "games_per_sec": round(per_game)}
        print(f"{name:10s} median {med*1e3:8.1f} ms  -> {per_game:9.0f} games/s",
              flush=True)

    Path(args.out).write_text(json.dumps(
        {"k": k, "ns": ns, "batch": batch, "results": results}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
