"""Decompose roll-step cost on the device: full step vs. isolated pieces.

Times fixed-iteration fori_loops (no while cond, no compaction) of:
  * the full production roll-step,
  * threefry-only (two hashes, as the step draws them),
  * threefry one-hash + mixed-radix dice extraction (candidate scheme),
  * scoring-only (counts + score_counts_flat on synthetic faces),
  * smart-discard-only.

Methodology per tests/FAILURE_NOTES.md: one process, >=3 warmups per
variant, interleaved rounds, medians, every result fetched.

Usage: python scripts/profile_step_cost.py [--b 262144] [--k 5] [--iters 256]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--b", type=int, default=262144)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--iters", type=int, default=256)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()
    B, K, N = args.b, args.k, args.iters

    import jax
    import jax.numpy as jnp
    import numpy as np

    from farkle_ii_tpu.ops import game_kernel as gk
    from farkle_ii_tpu.ops.threefry import threefry2x32, roll_dice_words

    key = jax.random.key(0)
    kd = jax.random.bits(jax.random.key(1), (B, 2), jnp.uint32)
    st = jnp.full((B, K), 300, jnp.int32)
    dt = jnp.full((B, K), 2, jnp.int32)
    fl = jnp.full((B, K), gk.FLAG_SMART_FIVE | gk.FLAG_CONSIDER_SCORE, jnp.int32)

    step = gk.make_game_step(k=K)
    ops = (
        kd[:, 0],
        kd[:, 1],
        tuple(st[:, i] for i in range(K)),
        tuple(dt[:, i] for i in range(K)),
        tuple(fl[:, i] for i in range(K)),
    )

    def full_step(_):
        s = gk.init_state(B, K)
        s = jax.lax.fori_loop(0, N, lambda i, s2: step(s2, *ops), s)
        return s.turn_score.sum() + s.round_num.sum()

    def hash2_only(_):
        def body(i, carry):
            a, b = carry
            w0, w1 = threefry2x32(kd[:, 0], kd[:, 1], a, jnp.uint32(0))
            w2, w3 = threefry2x32(kd[:, 0], kd[:, 1], a, jnp.uint32(1))
            return (a + w0 + w2, b ^ w1 ^ w3)

        a, b = jax.lax.fori_loop(
            0, N, body, (jnp.zeros(B, jnp.uint32), jnp.zeros(B, jnp.uint32))
        )
        return (a ^ b).sum()

    def hash1_mixedradix(_):
        def body(i, carry):
            a, acc = carry
            w0, w1 = threefry2x32(kd[:, 0], kd[:, 1], a, jnp.uint32(0))
            total = jnp.zeros(B, jnp.int32)
            for w in (w0, w1):
                u = w
                for j in range(3):
                    face = (u % jnp.uint32(6)).astype(jnp.int32)
                    u = u // jnp.uint32(6)
                    total = total + (jnp.int32(1) << (face * 4))
            return (a + w0, acc ^ total)

        a, acc = jax.lax.fori_loop(
            0, N, body, (jnp.zeros(B, jnp.uint32), jnp.zeros(B, jnp.int32))
        )
        return acc.sum() + a.sum()

    def score_only(_):
        from farkle_ii_tpu.ops.scoring import score_counts_flat

        def body(i, carry):
            seed, acc = carry
            # synthetic faces from a cheap mix (cost excluded from interpretation)
            roll_n = jnp.full(B, 6, jnp.int32)
            accw = jnp.zeros(B, jnp.int32)
            for d in range(6):
                face = ((seed >> (5 * d)) % jnp.uint32(6)).astype(jnp.int32)
                accw = accw + (jnp.int32(1) << (face * 4))
            counts = [(accw >> (4 * f)) & 15 for f in range(6)]
            s, u, sf, so = score_counts_flat(counts, roll_n)
            return (seed + jnp.uint32(2654435761), acc + s + u + sf + so)

        seed0 = kd[:, 0]
        seed, acc = jax.lax.fori_loop(0, N, body, (seed0, jnp.zeros(B, jnp.int32)))
        return acc.sum()

    def discard_only(_):
        def body(i, carry):
            seed, acc = carry
            raw_score = (seed % jnp.uint32(3000)).astype(jnp.int32)
            raw_used = ((seed >> 8) % jnp.uint32(7)).astype(jnp.int32)
            sfives = ((seed >> 12) % jnp.uint32(3)).astype(jnp.int32)
            sones = ((seed >> 14) % jnp.uint32(3)).astype(jnp.int32)
            d5, d1 = gk._smart_discards_flat(
                raw_score=raw_score, raw_used=raw_used, sfives=sfives,
                sones=sones, roll_n=jnp.full(B, 6, jnp.int32),
                turn_score=(seed % jnp.uint32(1000)).astype(jnp.int32),
                score_threshold=st[:, 0], dice_threshold=dt[:, 0],
                flags=fl[:, 0],
            )
            return (seed + jnp.uint32(2654435761), acc + d5 + d1)

        seed, acc = jax.lax.fori_loop(
            0, N, body, (kd[:, 0], jnp.zeros(B, jnp.int32))
        )
        return acc.sum()

    variants = {
        "full_step": full_step,
        "hash2_only": hash2_only,
        "hash1_mixedradix": hash1_mixedradix,
        "score_only": score_only,
        "discard_only": discard_only,
    }
    compiled = {}
    for name, fn in variants.items():
        t0 = time.perf_counter()
        compiled[name] = jax.jit(fn).lower(0).compile()
        print(f"compiled {name} in {time.perf_counter() - t0:.1f}s", flush=True)

    for name, fn in compiled.items():
        for _ in range(3):
            np.asarray(fn(0))
        print(f"warmed {name}", flush=True)

    times: dict[str, list[float]] = {n: [] for n in variants}
    for r in range(args.rounds):
        for name, fn in compiled.items():
            t0 = time.perf_counter()
            np.asarray(fn(0))
            times[name].append(time.perf_counter() - t0)
        print(f"round {r + 1}/{args.rounds}", flush=True)

    print(f"\nB={B} K={K} iters={N}")
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        ns_per_lane_step = med / (B * N) * 1e9
        print(f"{name:20s} median {med * 1e3:8.1f} ms   {ns_per_lane_step:8.3f} ns/lane-step")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
