"""Decompose delivered games/s into per-step speed x lane efficiency.

For a production-shaped dispatch, measures per compaction phase:
  * roll-steps executed (the kernel's own step counter),
  * lane-steps paid (phase batch size x steps),
  * wall time,
and compares the useful work (sum of all seats' n_rolls) against lane-steps
paid. Efficiency = useful / paid is the masked-lane waste diagnostic;
ns/lane-step is the raw VPU-bound speed diagnostic.

Usage: python scripts/measure_kernel_efficiency.py [--k 5] [--ns 43] [--rounds 3]
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
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--ns", type=int, default=43)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--compact-ratios", default="8,64,512")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from farkle_ii_tpu.ops import game_kernel as gk
    from farkle_ii_tpu.ops import rng
    from farkle_ii_tpu.simulation import strategies as S
    from farkle_ii_tpu.simulation import tournament as T

    k = args.k
    grid = S.build_strategy_grid()
    spec = T.TournamentSpec(root_seed=55, k=k, n_strategies=len(grid))
    ratios = tuple(int(v) for v in args.compact_ratios.split(","))

    # Build the per-game inputs the tournament path would build for ns shuffles
    # (mirrors tournament.play_shuffles:184-205)
    _p = S.pack_strategy_params(grid)
    _params = (
        jnp.asarray(_p.score_threshold),
        jnp.asarray(_p.dice_threshold),
        jnp.asarray(_p.flags),
    )

    @jax.jit
    def _inputs(sh):
        st_tab, dt_tab, fl_tab = _params
        seat_ids = T.shuffle_seat_ids(spec, sh)
        ns_, g, k_ = seat_ids.shape
        flat_ids = seat_ids.reshape(ns_ * g, k_)
        shuffle_per_game = jnp.repeat(jnp.asarray(sh, dtype=jnp.uint32), g)
        game_idx = jnp.tile(jnp.arange(g, dtype=jnp.uint32), ns_)
        game_keys = rng.vector_coordinate_keys(
            rng.RandomPurpose.TOURNAMENT_PLAYER,
            root_seed=spec.root_seed, k=spec.k,
            shuffle_index=shuffle_per_game, game_index=game_idx,
        )
        return (
            jax.random.key_data(game_keys),
            st_tab[flat_ids], dt_tab[flat_ids], fl_tab[flat_ids],
        )

    def build_inputs(shuffle_lo: int):
        sh = jnp.arange(shuffle_lo, shuffle_lo + args.ns, dtype=jnp.uint32)
        return _inputs(sh)

    # Instrumented play: per-phase (batch, steps, seconds)
    _phase_cache: dict[int, object] = {}

    def instrumented(kd, st, dt, fl):
        batch = st.shape[0]
        step = gk.make_game_step(k=k)
        pad_multiple = 4096
        padded = -(-batch // pad_multiple) * pad_multiple
        pad = padded - batch

        def pad_rows(arr):
            return jnp.pad(arr, [(0, pad)] + [(0, 0)] * (arr.ndim - 1)) if pad else arr

        kd_, st_, dt_, fl_ = map(pad_rows, (kd, st, dt, fl))
        state = gk.init_state(padded, k)
        if pad:
            state = state._replace(done=state.done.at[batch:].set(True))

        from farkle_ii_tpu.utils.aot_cache import cached_compile

        def ops_of(kd2, st2, dt2, fl2):
            return (
                kd2[:, 0], kd2[:, 1],
                tuple(st2[:, i] for i in range(k)),
                tuple(dt2[:, i] for i in range(k)),
                tuple(fl2[:, i] for i in range(k)),
            )

        def run_phase_fn(state, kd2, st2, dt2, fl2, floor):
            ops = ops_of(kd2, st2, dt2, fl2)

            def cond(s):
                return ((~s.done).sum() > floor) & (s.step < 10_000_000)

            def body(s):
                return jax.lax.fori_loop(0, 8, lambda i, s2: step(s2, *ops), s)

            return jax.lax.while_loop(cond, body, state)

        def run_phase(state, kd2, st2, dt2, fl2, floor):
            b = kd2.shape[0]
            if b not in _phase_cache:
                _phase_cache[b] = cached_compile(
                    run_phase_fn, state, kd2, st2, dt2, fl2,
                    jnp.zeros((), jnp.int32),
                    extra_key=f"eff-phase-k{k}-b{b}",
                )
            return _phase_cache[b](
                state, kd2, st2, dt2, fl2, jnp.asarray(floor, jnp.int32)
            )

        phases = []
        lane_steps = 0
        prev_step = 0
        t_all0 = time.perf_counter()
        cur = (kd_, st_, dt_, fl_)
        for ratio in ratios + (None,):
            floor = 0 if ratio is None else padded // ratio
            t0 = time.perf_counter()
            state = run_phase(state, *cur, floor)
            steps = int(np.asarray(state.step))  # forced fetch
            dt_s = time.perf_counter() - t0
            b = state.done.shape[0]
            phases.append((b, steps - prev_step, dt_s))
            lane_steps += b * (steps - prev_step)
            prev_step = steps
            if ratio is not None:
                cap = padded // ratio
                take = gk._take_indices(state.done, cap, "partition")
                state = gk._gather_state(state, take)
                cur = tuple(a[take] for a in cur)
        total_s = time.perf_counter() - t_all0
        res = gk.finalize(state, k=k)
        # useful work = all seats' rolls of the original (unpadded) games —
        # padded lanes never roll; compact phases re-play nothing
        # (state is carried), so n_rolls of the final state is the total.
        useful = int(np.asarray(res.n_rolls).sum())
        return phases, lane_steps, useful, total_s

    # production baseline timing (same inputs through the real path)
    from farkle_ii_tpu.utils.aot_cache import cached_compile

    p = S.pack_strategy_params(grid)
    params = (
        jnp.asarray(p.score_threshold),
        jnp.asarray(p.dice_threshold),
        jnp.asarray(p.flags),
    )
    prod = cached_compile(
        lambda prm, sh: T.pack_aggregates(
            T.play_and_aggregate(spec, prm, sh, compact=True)
        ),
        params,
        jnp.arange(args.ns, dtype=jnp.uint32),
        extra_key=f"eff-k{k}-ns{args.ns}",
    )
    games = args.ns * spec.games_per_shuffle

    for _ in range(2):  # warm both paths
        np.asarray(prod(params, jnp.arange(args.ns, dtype=jnp.uint32)))
    instrumented(*build_inputs(10_000))

    print(f"k={k} ns={args.ns} games/dispatch={games}")
    for r in range(args.rounds):
        t0 = time.perf_counter()
        np.asarray(prod(params, jnp.arange(100 + r * args.ns, 100 + (r + 1) * args.ns, dtype=jnp.uint32)))
        prod_s = time.perf_counter() - t0
        phases, lane_steps, useful, inst_s = instrumented(*build_inputs(50_000 + r * args.ns))
        eff = useful / lane_steps
        print(f"round {r}: production {prod_s*1e3:8.1f} ms ({games/prod_s:,.0f} games/s) | "
              f"instrumented {inst_s*1e3:8.1f} ms")
        print(f"  rolls/game avg {useful/games:8.1f}  lane-steps {lane_steps/1e6:8.1f}M  "
              f"useful {useful/1e6:8.1f}M  efficiency {eff:6.1%}  "
              f"{inst_s/lane_steps*1e9:6.3f} ns/lane-step")
        for i, (b, steps, secs) in enumerate(phases):
            print(f"  phase {i}: B={b:7d} steps={steps:6d} {secs*1e3:8.1f} ms "
                  f"({secs/max(1,b*steps)*1e9:6.3f} ns/lane-step)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
