"""Pipelined A/B sweep of block-scan dispatch shapes + compaction knobs.

The production dispatch (and bench.py) scans n_chunks x ns-shuffle chunks on
device and pipelines several dispatches ahead of the fetch, so the metric
that matters is *pipelined* games/s per program — serial dispatch+fetch
timing (sweep_block_group.py) under-reports by the ~28 ms round trip.

Methodology per tests/FAILURE_NOTES.md: one process, every variant warmed
>=3 times with forced fetches, timing rounds interleaved across variants,
medians reported. A variant whose warm-up faults the runtime is dropped
(shapes go known-good-first so a hard process fault preserves the
baseline's numbers in the incremental output).

Usage: python scripts/sweep_scan_shapes.py [--k 5] [--rounds 3] [--depth 4]
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
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--depth", type=int, default=4, help="pipelined dispatches per timing")
    ap.add_argument("--only", type=str, default=None, help="comma list of variant names")
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

    # (name, n_chunks, ns, pad_multiple, game_kwargs)
    variants = [
        ("base_8x64", 8, 64, None, {}),
        ("16x64", 16, 64, None, {}),
        ("8x128", 8, 128, None, {}),
        ("8x64_r4-32-256", 8, 64, None, {"compact_ratios": (4, 32, 256)}),
        ("8x64_r16-128-1024", 8, 64, None, {"compact_ratios": (16, 128, 1024)}),
        ("8x64_r4-16-64-256", 8, 64, None, {"compact_ratios": (4, 16, 64, 256)}),
        ("8x64_pad2048", 8, 64, 2048, {}),
        ("8x64_pad1024", 8, 64, 1024, {}),
        ("8x64_cce16", 8, 64, None, {"cond_check_every": 16}),
        # diagnostics (not shippable as-is; localize where the time goes)
        ("diag_nocompact", 8, 64, None, {"__compact": False}),
        ("diag_scheme2w", 8, 64, None, {"dice_scheme": "2w"}),
        ("diag_mr50", 8, 64, None, {"__max_rounds": 50}),
    ]
    if args.only:
        names = set(args.only.split(","))
        variants = [v for v in variants if v[0] in names]

    fns = {}
    shapes = {}
    for name, n_chunks, ns, pad, gkw in variants:
        games = n_chunks * ns * spec.games_per_shuffle
        shapes[name] = (n_chunks, ns, games)
        t0 = time.perf_counter()
        gkw = dict(gkw)
        compact = gkw.pop("__compact", True)
        mr = gkw.pop("__max_rounds", None)
        vspec = spec if mr is None else T.TournamentSpec(
            root_seed=77, k=args.k, n_strategies=len(grid), max_rounds=mr
        )
        try:
            fns[name] = cached_compile(
                lambda prm, sh, _g=gkw, _p=pad, _c=compact, _s=vspec: T.play_and_aggregate_block(
                    _s, prm, sh, compact=_c, pad_multiple=_p, game_kwargs=_g
                ),
                params,
                jnp.zeros((n_chunks, ns), dtype=jnp.uint32),
                extra_key=f"scanshape-{name}-k{args.k}",
            )
        except Exception as exc:  # compile-time rejection
            print(f"variant {name}: compile failed: {exc}", flush=True)
            continue
        print(f"compiled {name} in {time.perf_counter() - t0:.1f}s", flush=True)

    def run_one(name, base):
        n_chunks, ns, _ = shapes[name]
        span = n_chunks * ns
        sh = jnp.arange(base, base + span, dtype=jnp.uint32).reshape(n_chunks, ns)
        return fns[name](params, sh)

    # warm-ups (forced fetches); drop faulting variants
    for name in list(fns):
        try:
            for i in range(3):
                lo, hi = run_one(name, 10_000 + i * 4096)
                agg = T.unpack_block_aggregates(
                    (np.asarray(lo), np.asarray(hi)), len(grid)
                )
                assert int(agg.games_attempted) == shapes[name][2]
            print(f"warmed {name}", flush=True)
        except AssertionError:
            raise
        except Exception as exc:
            print(f"variant {name}: FAULTED in warm-up: {type(exc).__name__}", flush=True)
            del fns[name]

    results = {name: [] for name in fns}
    for r in range(args.rounds):
        for name in fns:
            start = time.perf_counter()
            outs = [
                run_one(name, 200_000 + (r * args.depth + d) * 8192)
                for d in range(args.depth)
            ]
            total = 0
            for lo, hi in outs:
                agg = T.unpack_block_aggregates(
                    (np.asarray(lo), np.asarray(hi)), len(grid)
                )
                total += int(agg.games_attempted)
            elapsed = time.perf_counter() - start
            results[name].append(total / elapsed)
        print(f"round {r + 1}/{args.rounds} done", flush=True)

    out = {"k": args.k, "depth": args.depth, "results": {}}
    for name, rates in results.items():
        med = float(np.median(rates)) if rates else 0.0
        out["results"][name] = {
            "games_per_dispatch": shapes[name][2],
            "median_games_per_sec": round(med, 1),
        }
        print(
            f"{name:>20}: {shapes[name][2]:>9,} games/dispatch  "
            f"{med:>12,.0f} games/s",
            flush=True,
        )
    path = REPO / "results" / f"scan_shape_sweep_k{args.k}.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
