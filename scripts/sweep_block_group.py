"""Measure games/s of the block-group program vs group size m on device.

One dispatch plays m recovery blocks (m*nsb shuffles) as a single batch and
returns per-block packed aggregates. Interleaved rounds in one process
(tests/FAILURE_NOTES.md methodology), forced fetches, medians.

Usage: python scripts/sweep_block_group.py [--k 2] [--nsb 43] [--m 1,4,8,16]
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
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--nsb", type=int, default=43)
    ap.add_argument("--m", type=str, default="1,4,8,16")
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from farkle_ii_tpu.simulation import strategies as S
    from farkle_ii_tpu.simulation import tournament as T
    from farkle_ii_tpu.utils.aot_cache import cached_compile

    grid = S.build_strategy_grid()
    p = S.pack_strategy_params(grid)
    params = (
        jnp.asarray(p.score_threshold),
        jnp.asarray(p.dice_threshold),
        jnp.asarray(p.flags),
    )
    spec = T.TournamentSpec(root_seed=55, k=args.k, n_strategies=len(grid))
    ms = [int(v) for v in args.m.split(",")]

    fns = {}
    for m in ms:
        t0 = time.perf_counter()
        fns[m] = cached_compile(
            lambda prm, sh: T.play_and_aggregate_blocks(
                spec, prm, sh, compact=True, pad_multiple=4096
            ),
            params,
            jnp.zeros((m, args.nsb), dtype=jnp.uint32),
            extra_key=f"blkgrp-k{args.k}-s{len(grid)}-m{m}x{args.nsb}",
        )
        print(f"compiled m={m} in {time.perf_counter() - t0:.1f}s", flush=True)

    sh0 = 0

    def mk(m):
        nonlocal sh0
        arr = np.arange(sh0, sh0 + m * args.nsb, dtype=np.uint32)
        sh0 += m * args.nsb
        return jnp.asarray(arr.reshape(m, args.nsb))

    for m, fn in fns.items():
        for _ in range(3):
            out = np.asarray(fn(params, mk(m)))
        acc = T.TournamentAccumulator(len(grid))
        for b in range(m):
            acc.absorb(T.unpack_aggregates(out[b], len(grid)))
        acc.check_conservation()
        print(f"warmed m={m} (conservation ok)", flush=True)

    times: dict[int, list[float]] = {m: [] for m in ms}
    for r in range(args.rounds):
        for m, fn in fns.items():
            t0 = time.perf_counter()
            np.asarray(fn(params, mk(m)))
            times[m].append(time.perf_counter() - t0)
        print(f"round {r + 1}/{args.rounds} done", flush=True)

    results = {}
    gpb = args.nsb * spec.games_per_shuffle
    for m in ms:
        med = sorted(times[m])[len(times[m]) // 2]
        gps = m * gpb / med
        results[m] = {"median_s": round(med, 4), "games_per_sec": round(gps),
                      "batch_games": m * gpb}
        print(f"m={m:3d} (B={m * gpb:9,d}): median {med * 1e3:9.1f} ms  "
              f"{gps:12,.0f} games/s", flush=True)
    out_path = REPO / "results" / f"block_group_sweep_k{args.k}.json"
    out_path.write_text(json.dumps(
        {"k": args.k, "nsb": args.nsb, "results": results}, indent=2))
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
