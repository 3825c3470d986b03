"""Separate dispatch overhead / per-iteration fixed cost / per-lane slope.

Times bare fixed-iteration fori_loops of the production roll-step over a
(B, N) grid in ONE process (interleaved rounds, medians, forced fetches per
tests/FAILURE_NOTES.md). With t(B, N) = dispatch + N * (c + b * B):

  * dispatch  = remote-tunnel cost per executable call (amortized by N),
  * c         = per-iteration fixed cost (loop/sync overhead),
  * b         = per-lane cost (HBM carry traffic + VPU issue).

These three numbers decide the round-4 kernel strategy: big-batch scaling
attacks b*B only if dispatch and c are small; carry packing attacks b; chunk
fusion attacks dispatch.

Usage: python scripts/sweep_iter_scaling.py [--k 5] [--out results/iter_scaling_k5.json]
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
    ap.add_argument("--batches", default="66048,264192,1056768")
    ap.add_argument("--iters", default="32,256")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from farkle_ii_tpu.ops import game_kernel as gk
    from farkle_ii_tpu.simulation import strategies as S
    from farkle_ii_tpu.utils.aot_cache import cached_compile

    k = args.k
    batches = [int(b) for b in args.batches.split(",")]
    iters_list = [int(n) for n in args.iters.split(",")]
    grid = S.build_strategy_grid()
    step = gk.make_game_step(k=k)

    def make_fn(b: int, n: int):
        ids = np.arange(b * k, dtype=np.int64) % len(grid)
        p = S.pack_strategy_params([grid[i] for i in ids])
        st = tuple(jnp.asarray(p.score_threshold[i::k]) for i in range(k))
        dt = tuple(jnp.asarray(p.dice_threshold[i::k]) for i in range(k))
        fl = tuple(jnp.asarray(p.flags[i::k]) for i in range(k))
        kd = np.random.default_rng(7).integers(0, 2**32, (b, 2), dtype=np.uint32)
        k0 = jnp.asarray(kd[:, 0])
        k1 = jnp.asarray(kd[:, 1])

        def run():
            s = gk.init_state(b, k)
            s = jax.lax.fori_loop(
                0, n, lambda i, s2: step(s2, k0, k1, st, dt, fl), s
            )
            # tiny fetched summary forces completion on the remote backend
            return s.turn_score.sum() + s.dice_left.sum()

        return cached_compile(run, extra_key=f"iter-scaling-k{k}-b{b}-n{n}")

    print(f"compiling {len(batches) * len(iters_list)} programs ...", flush=True)
    fns = {}
    for b in batches:
        for n in iters_list:
            t0 = time.perf_counter()
            fns[(b, n)] = make_fn(b, n)
            v = int(np.asarray(fns[(b, n)]()))  # warm-up + force
            print(f"  b={b} n={n} ready in {time.perf_counter()-t0:.1f}s (sum={v})", flush=True)

    # extra warmups
    for fn in fns.values():
        for _ in range(2):
            int(np.asarray(fn()))

    samples: dict[tuple[int, int], list[float]] = {key: [] for key in fns}
    for _ in range(args.rounds):
        for key, fn in fns.items():
            t0 = time.perf_counter()
            int(np.asarray(fn()))
            samples[key].append(time.perf_counter() - t0)

    results = {}
    for (b, n), ts in samples.items():
        med = float(np.median(ts))
        results[f"{b}x{n}"] = {"b": b, "n": n, "median_s": round(med, 5)}
        print(f"b={b:8d} n={n:5d}  median {med*1e3:9.2f} ms", flush=True)

    # affine decomposition per B: t(N) = d + N * s(B)
    print("\nper-iteration cost by B (slope over N):")
    deco = {}
    for b in batches:
        n0, n1 = min(iters_list), max(iters_list)
        t0 = results[f"{b}x{n0}"]["median_s"]
        t1 = results[f"{b}x{n1}"]["median_s"]
        s = (t1 - t0) / (n1 - n0)
        d = t0 - n0 * s
        deco[str(b)] = {"per_iter_us": round(s * 1e6, 2), "dispatch_ms": round(d * 1e3, 2)}
        print(f"  b={b:8d}: per-iter {s*1e6:8.2f} us  dispatch {d*1e3:7.2f} ms"
              f"  ns/lane-iter {s/b*1e9:6.3f}", flush=True)

    out = {"k": k, "results": results, "decomposition": deco,
           "platform": jax.devices()[0].platform}
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
