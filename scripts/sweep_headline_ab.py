"""A/B the exact headline program: flat vs packed carry, scan depth 8/16/32.

The round-4 headline (BENCH_r04) is ``play_and_aggregate_block`` at k=5 with
8 chunks x 128 shuffles per dispatch (1.056M games/step, 786 ms steady).
``results/iter_floor_k5.json`` measured the packed carry 1.44x faster on the
marginal HBM-carry term — but only in a fori-only microbenchmark. This sweep
races the two carries on the *production block-scan program itself*, at the
headline shape and at deeper scans (16/32 chunks amortize the ~36 ms
dispatch + fetch further), interleaved in one process with forced fetches
and medians (tests/FAILURE_NOTES.md discipline).

Usage: python scripts/sweep_headline_ab.py [--k 5] [--ns 128] \
    [--depths 8,16] [--out results/headline_ab_k5.json]
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
    ap.add_argument("--ns", type=int, default=128)
    ap.add_argument("--depths", default="8,16")
    ap.add_argument("--variants", default="flat,packed")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--root-seed", type=int, default=42)
    ap.add_argument("--out", default="results/headline_ab_k5.json")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from farkle_ii_tpu.simulation import strategies as S
    from farkle_ii_tpu.simulation import tournament as T
    from farkle_ii_tpu.utils.aot_cache import cached_compile

    k, ns = args.k, args.ns
    depths = [int(d) for d in args.depths.split(",")]
    variants = args.variants.split(",")
    grid = S.build_strategy_grid()
    p = S.pack_strategy_params(grid)
    params = (
        jnp.asarray(p.score_threshold),
        jnp.asarray(p.dice_threshold),
        jnp.asarray(p.flags),
    )
    spec = T.TournamentSpec(root_seed=args.root_seed, k=k, n_strategies=len(grid))

    def make(depth: int, variant: str):
        gk_kwargs = {"packed": variant == "packed"}
        t0 = time.perf_counter()
        fn = cached_compile(
            lambda prm, sh: T.play_and_aggregate_block(
                spec, prm, sh, compact=True, game_kwargs=gk_kwargs
            ),
            params,
            jnp.arange(depth * ns, dtype=jnp.uint32).reshape(depth, ns),
            extra_key=f"hab-k{k}-{depth}x{ns}-{variant}",
        )
        print(f"compiled {depth}x{ns} {variant} in "
              f"{time.perf_counter()-t0:.0f}s", flush=True)
        return fn

    programs = {}
    for depth in depths:
        for variant in variants:
            programs[(depth, variant)] = make(depth, variant)

    games = {d: d * ns * spec.games_per_shuffle for d in depths}
    sh0 = 10_000

    def run(key):
        nonlocal sh0
        depth, _ = key
        n2 = depth * ns
        sh = jnp.arange(sh0, sh0 + n2, dtype=jnp.uint32).reshape(depth, ns)
        sh0 += n2
        t0 = time.perf_counter()
        lo, hi = programs[key](params, sh)
        total = T.unpack_block_aggregates(
            (np.asarray(lo), np.asarray(hi)), len(grid)
        )
        dt = time.perf_counter() - t0
        assert int(total.games_attempted) == games[depth]
        return dt

    for key in programs:  # warm-ups, forced fetch
        for _ in range(2):
            run(key)
    samples: dict = {key: [] for key in programs}
    for _ in range(args.rounds):
        for key in programs:
            samples[key].append(run(key))

    results = {}
    for (depth, variant), ts in samples.items():
        med = float(np.median(ts))
        rate = games[depth] / med
        results[f"{depth}x{ns}-{variant}"] = {
            "median_s": round(med, 4),
            "games_per_sec": round(rate),
            "ms_per_chunk": round(med / depth * 1e3, 1),
        }
        print(f"{depth:3d}x{ns} {variant:7s} {med*1e3:8.1f} ms "
              f"{rate:10,.0f} games/s  {med/depth*1e3:6.1f} ms/chunk",
              flush=True)
    # slope-derived device-only per-chunk cost per variant (excludes the
    # per-dispatch tunnel round trip + fetch, which are depth-independent)
    if len(depths) >= 2:
        d0, d1 = min(depths), max(depths)
        for variant in variants:
            t0m = float(np.median(samples[(d0, variant)]))
            t1m = float(np.median(samples[(d1, variant)]))
            slope = (t1m - t0m) / (d1 - d0)
            dev_rate = ns * spec.games_per_shuffle / slope if slope > 0 else None
            results[f"device-slope-{variant}"] = {
                "ms_per_chunk": round(slope * 1e3, 2),
                "device_games_per_sec": round(dev_rate) if dev_rate else None,
            }
            print(f"device slope {variant}: {slope*1e3:.1f} ms/chunk "
                  f"-> {dev_rate:,.0f} device games/s" if dev_rate else
                  f"device slope {variant}: non-positive", flush=True)
    out = Path(args.out)
    out.write_text(json.dumps(
        {"k": k, "ns": ns, "results": results}, indent=1
    ))
    print(f"written {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
