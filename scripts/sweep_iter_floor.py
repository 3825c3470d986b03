"""Find the per-iteration floor: kernel-launch count vs batch size.

fori-only roll-step loops (no while/compaction/aggregation) at several
batch sizes for the flat and packed carries. A flat ~12.7 us/iteration
regardless of B (even B=129) means the body pays per-iteration kernel
launches (the ~84-array flat carry exceeds XLA fusion width); the packed
carry (~48 arrays) tests that hypothesis directly.

Usage: python scripts/sweep_iter_floor.py [--k 5]
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
    ap.add_argument("--iters", type=int, default=1024)
    ap.add_argument("--batches", default="1024,8256,66048")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--out", default="results/iter_floor_k5.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from farkle_ii_tpu.ops import game_kernel as gk
    from farkle_ii_tpu.simulation import strategies as S
    from farkle_ii_tpu.utils.aot_cache import cached_compile

    k, n_iters = args.k, args.iters
    grid = S.build_strategy_grid()
    batches = [int(b) for b in args.batches.split(",")]

    def make(b, packed):
        ids = np.arange(b * k, dtype=np.int64) % len(grid)
        p = S.pack_strategy_params([grid[i] for i in ids])
        st2 = np.asarray(p.score_threshold).reshape(b, k)
        dt2 = np.asarray(p.dice_threshold).reshape(b, k)
        fl2 = np.asarray(p.flags).reshape(b, k)
        kd = np.random.default_rng(3).integers(0, 2**32, (b, 2), dtype=np.uint32)
        k0, k1 = jnp.asarray(kd[:, 0]), jnp.asarray(kd[:, 1])
        if packed:
            step = gk.make_game_step_packed(k=k)
            pp = tuple(
                gk.pack_params_word(
                    jnp.asarray(st2[:, i]), jnp.asarray(dt2[:, i]),
                    jnp.asarray(fl2[:, i]),
                )
                for i in range(k)
            )

            def run():
                s = gk.pack_state(gk.init_state(b, k), k)
                s = jax.lax.fori_loop(
                    0, n_iters, lambda i, s2: step(s2, k0, k1, pp), s
                )
                return s.turn_score.sum() + s.ctrl.sum()
        else:
            step = gk.make_game_step(k=k)
            st = tuple(jnp.asarray(st2[:, i]) for i in range(k))
            dt = tuple(jnp.asarray(dt2[:, i]) for i in range(k))
            fl = tuple(jnp.asarray(fl2[:, i]) for i in range(k))

            def run():
                s = gk.init_state(b, k)
                s = jax.lax.fori_loop(
                    0, n_iters, lambda i, s2: step(s2, k0, k1, st, dt, fl), s
                )
                return s.turn_score.sum() + s.dice_left.sum()

        return cached_compile(
            run, extra_key=f"iterfloor-k{k}-b{b}-n{n_iters}-{'p' if packed else 'f'}"
        )

    programs = {}
    t0 = time.perf_counter()
    for b in batches:
        for packed in (False, True):
            programs[(b, packed)] = make(b, packed)
    print(f"compiled in {time.perf_counter()-t0:.0f}s", flush=True)

    for fn in programs.values():
        for _ in range(3):
            int(np.asarray(fn()))
    samples = {key: [] for key in programs}
    for _ in range(args.rounds):
        for key, fn in programs.items():
            t0 = time.perf_counter()
            int(np.asarray(fn()))
            samples[key].append(time.perf_counter() - t0)

    results = {}
    for (b, packed), ts in samples.items():
        med = float(np.median(ts))
        us = med / n_iters * 1e6
        results[f"{b}-{'packed' if packed else 'flat'}"] = {
            "median_s": round(med, 4), "us_per_iter": round(us, 2),
        }
        print(f"b={b:6d} {'packed' if packed else 'flat  '}  {med*1e3:8.1f} ms"
              f"  {us:7.2f} us/iter", flush=True)
    Path(args.out).write_text(json.dumps({"k": k, "results": results}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
