"""Interleaved A/B sweep of game-kernel execution variants on the device.

Methodology per tests/FAILURE_NOTES.md: one process, every variant warmed
>=3 times, timing rounds interleaved, medians reported, every step's result
fetched (block_until_ready is a no-op on the axon backend).

Usage: python scripts/sweep_kernel_variants.py [--k 5] [--ns 64] [--rounds 5]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from farkle_ii_tpu.ops import game_kernel as gk
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
    spec = T.TournamentSpec(root_seed=77, k=args.k, n_strategies=len(grid))
    games_per_chunk = args.ns * spec.games_per_shuffle

    variants = {
        "base_r8-64-512": dict(),
        "r4-16-128": dict(compact_ratios=(4, 16, 128)),
        "r4-64-512": dict(compact_ratios=(4, 64, 512)),
        "r2-16-256": dict(compact_ratios=(2, 16, 256)),
    }

    compiled = {}
    for name, kw in variants.items():
        t0 = time.perf_counter()
        fn = cached_compile(
            lambda prm, sh, _kw=kw: T.pack_aggregates(
                T.play_and_aggregate(spec, prm, sh, compact=True, game_kwargs=_kw)
            ),
            params,
            jnp.arange(args.ns, dtype=jnp.uint32),
            extra_key=f"sweep-k{args.k}-ns{args.ns}-{name}",
        )
        compiled[name] = fn
        print(f"compiled {name} in {time.perf_counter() - t0:.1f}s", flush=True)

    # warm-ups (forced fetches)
    sh0 = 0
    for name, fn in compiled.items():
        for i in range(3):
            out = np.asarray(
                fn(params, jnp.arange(sh0, sh0 + args.ns, dtype=jnp.uint32))
            )
            sh0 += args.ns
        acc = T.TournamentAccumulator(len(grid))
        acc.absorb(T.unpack_aggregates(out, len(grid)))
        acc.check_conservation()
        print(f"warmed {name}", flush=True)

    times: dict[str, list[float]] = {n: [] for n in variants}
    for r in range(args.rounds):
        for name, fn in compiled.items():
            t0 = time.perf_counter()
            out = fn(params, jnp.arange(sh0, sh0 + args.ns, dtype=jnp.uint32))
            np.asarray(out)  # forced fetch
            dt = time.perf_counter() - t0
            times[name].append(dt)
            sh0 += args.ns
        print(f"round {r + 1}/{args.rounds} done", flush=True)

    print()
    results = {}
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        gps = games_per_chunk / med
        results[name] = {"median_s": round(med, 4), "games_per_sec": round(gps)}
        print(f"{name:24s} median {med * 1e3:8.1f} ms  {gps:12,.0f} games/s")
    out_path = REPO / "results" / "kernel_variant_sweep.json"
    out_path.parent.mkdir(exist_ok=True)
    out_path.write_text(json.dumps(
        {"k": args.k, "ns": args.ns, "games_per_chunk": games_per_chunk,
         "results": results}, indent=2))
    print(f"\nwrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
