"""Interleaved A/B of dice-scheme x discard-impl kernel variants on device.

Round-3 measurement for VERDICT r2 #1: quantifies the one-hash dice stream
(threefry.roll_faces_1h) and the static-priority discard scan against the
round-2 configuration (two hashes + packed-rank chain), through the real
tournament path. Methodology per tests/FAILURE_NOTES.md: one process,
>=3 warm-ups per variant, interleaved rounds, medians, forced fetches.

Usage: python scripts/sweep_dice_discard.py [--k 5] [--ns 64] [--rounds 5]
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
    spec = T.TournamentSpec(root_seed=77, k=args.k, n_strategies=len(grid))
    games_per_chunk = args.ns * spec.games_per_shuffle

    variants = {
        "r2_2h_rank": dict(dice_scheme="2h", discard_impl="rank"),
        "1h_rank": dict(dice_scheme="1h", discard_impl="rank"),
        "2h_prio": dict(dice_scheme="2h", discard_impl="prio"),
        "r3_1h_prio": dict(dice_scheme="1h", discard_impl="prio"),
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
            extra_key=f"dd-k{args.k}-ns{args.ns}-{name}",
        )
        compiled[name] = fn
        print(f"compiled {name} in {time.perf_counter() - t0:.1f}s", flush=True)

    sh0 = 0
    for name, fn in compiled.items():
        for _ in range(3):
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
            times[name].append(time.perf_counter() - t0)
            sh0 += args.ns
        print(f"round {r + 1}/{args.rounds} done", flush=True)

    print()
    results = {}
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        gps = games_per_chunk / med
        results[name] = {"median_s": round(med, 4), "games_per_sec": round(gps)}
        print(f"{name:24s} median {med * 1e3:8.1f} ms  {gps:12,.0f} games/s")
    out_path = REPO / "results" / "dice_discard_sweep.json"
    out_path.write_text(json.dumps(
        {"k": args.k, "ns": args.ns, "games_per_chunk": games_per_chunk,
         "results": results}, indent=2))
    print(f"\nwrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
