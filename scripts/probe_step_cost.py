"""Measure raw roll-step cost vs batch size on the real device.

Times a fixed-length fori_loop of the production roll-step (no while cond,
no compaction) at several batch sizes in one process, interleaved. The
scaling curve separates the candidate limiters: flat-with-B = dispatch or
loop-latency bound; linear-with-B = throughput bound (VPU issue or HBM);
the absolute per-op rate vs the ~4 Tops/s VPU envelope gives utilization.

Usage: python scripts/probe_step_cost.py [--k 2] [--iters 256]
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
    ap.add_argument("--iters", type=int, default=256)
    ap.add_argument("--batches", type=str, default="8192,32768,131072,262144")
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from farkle_ii_tpu.ops import game_kernel as gk
    from farkle_ii_tpu.ops import rng
    from farkle_ii_tpu.simulation import strategies as S
    from farkle_ii_tpu.utils.aot_cache import cached_compile

    k = args.k
    grid = S.build_strategy_grid()
    batches = [int(b) for b in args.batches.split(",")]

    step = gk.make_game_step(k=k)

    def make_fn(b: int):
        ids = np.arange(b * k, dtype=np.int64) % len(grid)
        p = S.pack_strategy_params([grid[i] for i in ids])
        st = tuple(jnp.asarray(p.score_threshold[i::k]) for i in range(k))
        dt = tuple(jnp.asarray(p.dice_threshold[i::k]) for i in range(k))
        fl = tuple(jnp.asarray(p.flags[i::k]) for i in range(k))
        base = rng.purpose_base_key(rng.RandomPurpose.TOURNAMENT_PLAYER,
                                    root_seed=3, k=k, shuffle_index=0)
        kd = gk.game_key_data_for_games(base, jnp.arange(b))
        k0, k1 = jnp.asarray(kd[:, 0]), jnp.asarray(kd[:, 1])

        def run(k0, k1):
            state = gk.init_state(b, k)
            state = jax.lax.fori_loop(
                0, args.iters, lambda i, s: step(s, k0, k1, st, dt, fl), state
            )
            # cheap scalar forcing fetch of the full dependency chain
            return state.step.sum() + sum(x.sum() for x in state.scores)

        fn = cached_compile(run, k0, k1,
                            extra_key=f"stepcost-k{k}-b{b}-i{args.iters}")
        return fn, (k0, k1)

    fns = {}
    for b in batches:
        t0 = time.perf_counter()
        fns[b] = make_fn(b)
        print(f"compiled B={b} in {time.perf_counter() - t0:.1f}s", flush=True)

    for b, (fn, kd) in fns.items():
        for _ in range(3):
            int(np.asarray(fn(kd[0], kd[1])))
        print(f"warmed B={b}", flush=True)

    times: dict[int, list[float]] = {b: [] for b in batches}
    for _ in range(args.rounds):
        for b, (fn, kd) in fns.items():
            t0 = time.perf_counter()
            int(np.asarray(fn(kd[0], kd[1])))
            times[b].append(time.perf_counter() - t0)

    out = {}
    for b in batches:
        med = sorted(times[b])[len(times[b]) // 2]
        per_iter = med / args.iters
        per_lane = per_iter / b * 1e9
        out[b] = {"median_s": round(med, 5), "us_per_iter": round(per_iter * 1e6, 2),
                  "ns_per_game_iter": round(per_lane, 3)}
        print(f"B={b:7d}: {per_iter * 1e6:9.1f} us/iter  "
              f"{per_lane:8.3f} ns/(game*iter)", flush=True)
    path = REPO / "results" / f"step_cost_k{k}.json"
    path.write_text(json.dumps({"k": k, "iters": args.iters, "results": out}, indent=2))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
