"""Race the XLA while-loop kernel against the gridded pallas kernel per k.

Play-only comparison at ~256k games per dispatch, winners bit-compared,
interleaved timing with forced fetches and medians. Grounds the
``tpu.game_impl = "auto"`` per-k choice (results/impl_race.json).

Usage: python scripts/sweep_impl_race.py [--ks 2,3,4,5,6,8,10,12]
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
    ap.add_argument("--ks", default="2,3,4,5,6,8,10,12")
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--tile-rows", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--out", default="results/impl_race.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from farkle_ii_tpu.ops import game_kernel as gk
    from farkle_ii_tpu.ops.pallas_kernel import play_games_pallas
    from farkle_ii_tpu.simulation import strategies as S

    grid = S.build_strategy_grid()
    results: dict = {}
    for k in [int(v) for v in args.ks.split(",")]:
        b = (args.batch // (k * 128)) * 128  # lane-aligned per-k batch
        ids = np.arange(b * k, dtype=np.int64) % len(grid)
        p = S.pack_strategy_params([grid[i] for i in ids])
        st = jnp.asarray(np.asarray(p.score_threshold).reshape(b, k))
        dt = jnp.asarray(np.asarray(p.dice_threshold).reshape(b, k))
        fl = jnp.asarray(np.asarray(p.flags).reshape(b, k))
        kd_np = np.random.default_rng(7 + k).integers(
            0, 2**32, (b, 2), dtype=np.uint32
        )
        fns = {
            "xla": jax.jit(
                lambda kd, st=st, dt=dt, fl=fl: gk.play_games(
                    kd, st, dt, fl, compact=True
                )
            ),
            "pallas": jax.jit(
                lambda kd, st=st, dt=dt, fl=fl: play_games_pallas(
                    kd, st, dt, fl, tile_rows=args.tile_rows
                )
            ),
        }
        outs = {}
        ok = True
        for name, fn in fns.items():
            t0 = time.perf_counter()
            try:
                outs[name] = np.asarray(fn(jnp.asarray(kd_np)).winner_seat)
            except Exception as exc:
                print(f"k={k} {name} FAILED: {str(exc)[:140]}", flush=True)
                results[str(k)] = {"error": f"{name}: {str(exc)[:200]}"}
                ok = False
                break
            print(f"k={k} {name} compile+run {time.perf_counter()-t0:.0f}s",
                  flush=True)
        if not ok:
            continue
        assert np.array_equal(outs["xla"], outs["pallas"]), f"k={k} MISMATCH"
        for fn in fns.values():
            for i in range(2):
                np.asarray(fn(jnp.asarray(kd_np ^ np.uint32(i + 1))).winner_seat)
        samples: dict = {n: [] for n in fns}
        for rnd in range(args.rounds):
            for name, fn in fns.items():
                kd = jnp.asarray(kd_np ^ np.uint32(100 + rnd))
                t0 = time.perf_counter()
                np.asarray(fn(kd).winner_seat)
                samples[name].append(time.perf_counter() - t0)
        row = {"batch": b, "bit_identical": True}
        for name, ts in samples.items():
            med = sorted(ts)[len(ts) // 2]
            row[name] = {"median_s": round(med, 4), "games_per_sec": round(b / med)}
            print(f"k={k:2d} {name:6s} {med*1e3:8.1f} ms {b/med:10,.0f} games/s",
                  flush=True)
        results[str(k)] = row
        Path(args.out).write_text(json.dumps(
            {"tile_rows": args.tile_rows, "results": results}, indent=1
        ))
    print("done", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
