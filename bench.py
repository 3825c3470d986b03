"""Headline benchmark: simulated tournament games/sec on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference CPU framework sustains ~4,366.6
games/sec end-to-end on a 16-worker desktop for the full mega-config
tournament. This benchmark plays the same workload shape — the default
5,160-strategy grid, contiguously seated per on-device shuffle permutation,
full rule set (smart discards, hot dice, final round, safety limits) — and
reports steady-state completed-game throughput on the attached accelerator
through the production block-scan dispatch path.

Measurement notes (tests/FAILURE_NOTES.md): ``block_until_ready`` is a no-op
on remote backends, so every step's result is fetched; the first executable
timed in a fresh process runs 2-4x slower than steady state, so three
warm-up dispatches precede timing.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from farkle_ii_tpu.simulation import strategies as S
from farkle_ii_tpu.simulation import tournament as T

BASELINE_GAMES_PER_SEC = 4366.6


def main() -> None:
    platform = jax.devices()[0].platform
    grid = S.build_strategy_grid()  # default 5,160-strategy grid
    params_np = S.pack_strategy_params(grid)
    params = (
        jnp.asarray(params_np.score_threshold),
        jnp.asarray(params_np.dice_threshold),
        jnp.asarray(params_np.flags),
    )
    k = 5
    spec = T.TournamentSpec(root_seed=42, k=k, n_strategies=len(grid))

    on_accel = platform != "cpu"
    # candidate (n_chunks, shuffles_per_chunk) block shapes, largest first;
    # some batch shapes have faulted the TPU runtime (FAILURE_NOTES), so the
    # ladder falls back rather than producing no number. A hard libtpu fault
    # kills the whole process, so bigger rungs are attempted ONLY when the
    # probed envelope recorded that chunk shape fault-free for k=5 (the
    # chunk and block-scan programs share the game-kernel batch geometry).
    ladder = [(8, 64), (8, 16), (4, 16)] if on_accel else [(2, 2)]
    envelope = None
    if on_accel:
        from farkle_ii_tpu.utils.fault_envelope import load_fault_envelope

        envelope = load_fault_envelope("results/fault_envelope.json")
        if envelope is not None:
            probed_bigger = [
                (8, ns)
                for ns in (128, 96)
                if envelope.is_probed_ok(k, ns, True)
            ]
            ladder = probed_bigger + ladder

    from farkle_ii_tpu.utils.aot_cache import cached_compile

    def build_block(n_chunks: int, ns: int, compact: bool):
        sh0 = jnp.arange(n_chunks * ns, dtype=jnp.uint32).reshape(n_chunks, ns)
        compiled = cached_compile(
            lambda prm, sh: T.play_and_aggregate_block(spec, prm, sh, compact=compact),
            params, sh0,
            extra_key=f"bench-block-k{k}-{n_chunks}x{ns}" + ("" if compact else "-nc"),
        )
        return compiled

    step = None
    used_shape: tuple[int, int, bool] | None = None
    used_family = "blockscan"

    # the round-4 production dispatch is the compact-fetch block group
    # (per-block counts + group metric limbs); when the envelope probed it,
    # the headline measures that exact program at its fastest probed shape
    if envelope is not None:
        from farkle_ii_tpu.simulation.runner import resolve_game_impl

        # the headline candidate runs the production per-k kernel choice
        # (pallas from k >= 5 on production-size batches)
        head_impl = resolve_game_impl("auto", k)
        head_gkw = (
            {"impl": "pallas", "pallas_tile_rows": 16}
            if head_impl == "pallas" else None
        )
        for nsb in (128, 64):
            probed = envelope.best_block_group(
                k, nsb=nsb, compact=True, max_m=67, floor_speed=None
            )
            if not probed:
                continue
            m_blocks, family = probed
            if not family.startswith("c"):
                continue
            fam = family[1:]
            try:
                compiled = cached_compile(
                    lambda prm, sh: T.play_blocks_compact(
                        spec, prm, sh, family=fam, compact=True,
                        pad_multiple=4096, game_kwargs=head_gkw,
                    ),
                    params,
                    jnp.zeros((m_blocks, nsb), dtype=jnp.uint32),
                    extra_key=f"cblk{fam}-k{k}-s{len(grid)}-m{m_blocks}x{nsb}"
                    f"-t10000-r200-p4096-{head_impl}",
                )
                games_per_step = m_blocks * nsb * spec.games_per_shuffle

                def dispatch(i, _c=compiled, _m=m_blocks, _nsb=nsb):
                    n2 = _m * _nsb
                    sh = jnp.arange(
                        n2 * i, n2 * (i + 1), dtype=jnp.uint32
                    ).reshape(_m, _nsb)
                    return _c(params, sh)

                def fetch(out, _g=games_per_step):
                    counts, mlo, mhi = out
                    total = int(np.asarray(counts)[:, -3].sum())
                    np.asarray(mlo)
                    np.asarray(mhi)
                    assert total == _g, (total, _g)
                    return total

                def run(i):
                    return fetch(dispatch(i))

                for i in range(3):
                    run(i)
                compact_pipeline = (dispatch, fetch)
                step = run
                used_shape = (m_blocks, nsb, True)
                used_family = f"compact-{fam}"
                break
            except Exception:
                continue

    # the compact candidate races the block-scan ladder's first survivor;
    # the faster of the two becomes the headline (never regress the metric
    # by construction)
    compact_candidate = (step, used_shape, used_family)
    compact_pipeline = None if step is None else compact_pipeline
    step = None
    pipeline = None
    for (n_chunks, ns), compact in (
        [(s, True) for s in ladder] + [(s, False) for s in ladder]
    ):
        try:
            candidate = build_block(n_chunks, ns, compact)
            games_per_step = n_chunks * ns * spec.games_per_shuffle

            def dispatch(i, _c=candidate, _nc=n_chunks, _ns=ns):
                n2 = _nc * _ns
                sh = jnp.arange(
                    n2 * i, n2 * (i + 1), dtype=jnp.uint32
                ).reshape(_nc, _ns)
                return _c(params, sh)

            def fetch(out, _g=games_per_step):
                lo, hi = out
                total = T.unpack_block_aggregates(
                    (np.asarray(lo), np.asarray(hi)), len(grid)
                )
                assert int(total.games_attempted) == _g
                return _g

            def run(i):
                return fetch(dispatch(i))

            # warm-up (forced fetches)
            for i in range(3 if on_accel else 1):
                run(i)
            step = run
            pipeline = (dispatch, fetch)
            used_shape = (n_chunks, ns, compact)
            used_family = "blockscan"
            break
        except AssertionError:
            raise
        except Exception:
            continue
    if step is None and compact_candidate[0] is None:
        raise RuntimeError("no benchmark shape survived the fault ladder")

    def timed_rate(pipe, n_steps, base):
        # round-3 convention: all dispatches issued before any fetch (the
        # runner pipelines blocks the same way), every result then fetched
        # and verified
        d, f = pipe
        start = time.perf_counter()
        outs = [d(base + i) for i in range(n_steps)]
        games = sum(f(o) for o in outs)
        return games, time.perf_counter() - start

    if step is not None and compact_candidate[0] is not None:
        g1, t1 = timed_rate(pipeline, 3, 30)
        g2, t2 = timed_rate(compact_pipeline, 3, 40)
        if g2 / t2 > g1 / t1:
            pipeline = compact_pipeline
            _, used_shape, used_family = compact_candidate
    elif step is None:
        pipeline = compact_pipeline
        _, used_shape, used_family = compact_candidate

    n_steps = 8 if on_accel else 2
    total_games, elapsed = timed_rate(pipeline, n_steps, 10)

    games_per_sec = total_games / elapsed

    # Secondary per-k sweep (VERDICT r3 #9): the k >= 8 falloff is the
    # kernel's biggest weakness, so the headline JSON carries per-k rates.
    # Only envelope-probed-OK shapes run — an unprobed shape can hard-fault
    # libtpu and kill the process, losing even the headline number.
    per_k: dict[str, dict] = {}
    if on_accel and envelope is not None:
        for kk in (2, 3, 4, 5, 6, 8, 10, 12):
            try:
                per_k[str(kk)] = _rate_for_k(kk, grid, params, envelope)
            except Exception as exc:  # never lose the headline to a sweep
                per_k[str(kk)] = {"error": str(exc)[:120]}

    print(
        json.dumps(
            {
                "metric": "tournament_games_per_sec",
                "value": round(games_per_sec, 1),
                "unit": "games/s",
                "vs_baseline": round(games_per_sec / BASELINE_GAMES_PER_SEC, 2),
                # which fault-ladder rung produced the number (VERDICT r2 #7):
                # cross-round comparisons must be same-shape to mean anything
                "dispatch_shape": {
                    "k": k,
                    "family": used_family,
                    "n_chunks": used_shape[0],
                    "shuffles_per_chunk": used_shape[1],
                    "compact": used_shape[2],
                    "games_per_step": used_shape[0] * used_shape[1] * spec.games_per_shuffle,
                },
                "per_k_games_per_sec": per_k,
                # tunnel-independent kernel rate at the headline k, from the
                # per-k scan-depth slope (excludes the 33-40 ms dispatch and
                # the ~23 MB/s fetch — VERDICT r4 #4)
                "device_games_per_sec": (per_k.get(str(k)) or {}).get(
                    "device_games_per_sec"
                ),
            }
        )
    )


def _rate_for_k(k: int, grid, params, envelope) -> dict:
    """Steady-state games/s for one player count at its best probed shape.

    Uses the production per-k kernel impl (runner.resolve_game_impl:
    pallas from k >= 6). Also reports ``device_games_per_sec`` derived
    from the scan-depth slope — timing scans of N and 2N chunks and taking
    (t(2N) - t(N)) / N as the pure device per-chunk cost excludes the
    tunnel's 33-40 ms dispatch and the fetch, so kernel progress is
    visible round over round even when the tunnel noise exceeds it
    (round-4 verdict: <20% kernel effects were invisible in wall rates).
    """
    from farkle_ii_tpu.simulation.runner import resolve_game_impl
    from farkle_ii_tpu.utils.aot_cache import cached_compile

    shape = envelope.best_shape(k, cap=128)
    if shape is None:
        return {"error": "no probed-ok shape"}
    ns, compact = shape
    impl = resolve_game_impl("auto", k)
    gkw = (
        {"impl": "pallas", "pallas_tile_rows": 16} if impl == "pallas" else None
    )
    spec = T.TournamentSpec(root_seed=42, k=k, n_strategies=len(grid))
    # scan enough chunks per dispatch that per-dispatch overhead amortizes
    # (the inner chunk keeps the probed-safe (k, ns) batch geometry)
    n_chunks = max(1, -(-262_144 // (ns * spec.games_per_shuffle)))

    def build(depth: int):
        return cached_compile(
            lambda prm, sh: T.play_and_aggregate_block(
                spec, prm, sh, compact=compact, game_kwargs=gkw
            ),
            params, jnp.arange(depth * ns, dtype=jnp.uint32).reshape(depth, ns),
            extra_key=f"bench-perk-k{k}-{depth}x{ns}-{impl}"
            + ("" if compact else "-nc"),
        )

    def make_runner(depth: int):
        compiled = build(depth)
        games = depth * ns * spec.games_per_shuffle

        def dispatch(i):
            n = depth * ns
            sh = jnp.arange(n * i, n * (i + 1), dtype=jnp.uint32).reshape(
                depth, ns
            )
            return compiled(params, sh)

        def fetch(out):
            lo, hi = out
            agg = T.unpack_block_aggregates(
                (np.asarray(lo), np.asarray(hi)), len(grid)
            )
            assert int(agg.games_attempted) == games
            return agg

        return dispatch, fetch, games

    d1, f1, games1 = make_runner(n_chunks)
    d2, f2, games2 = make_runner(2 * n_chunks)
    for i in range(3):  # forced-fetch warm-ups
        f1(d1(i))
    f2(d2(0))
    f2(d2(1))

    def timed(dis, fet, n_steps, base):
        start = time.perf_counter()
        outs = [dis(base + i) for i in range(n_steps)]
        for o in outs:
            fet(o)
        return (time.perf_counter() - start) / n_steps

    t1 = timed(d1, f1, 4, 10)
    t2 = timed(d2, f2, 2, 20)
    rate = games1 / t1
    slope = (t2 - t1) / n_chunks  # seconds per chunk, device-only
    chunk_games = ns * spec.games_per_shuffle
    device_rate = chunk_games / slope if slope > 0 else None
    out = {
        "games_per_sec": round(rate, 1),
        "device_games_per_sec": round(device_rate, 1) if device_rate else None,
        "impl": impl,
        "n_chunks": n_chunks,
        "shuffles_per_chunk": ns,
        "compact": compact,
    }
    # race the production compact-group program too (the dispatch unit the
    # mega run actually uses — m=67 scan groups probed fastest at every k);
    # the per-k number is the faster of the two families
    group = envelope.best_block_group(k, nsb=64, compact=True, max_m=67)
    if group is not None and group[1].startswith("c"):
        m_blocks, family = group
        fam = family[1:]
        try:
            compiled = cached_compile(
                lambda prm, sh: T.play_blocks_compact(
                    spec, prm, sh, family=fam, compact=True,
                    pad_multiple=4096, game_kwargs=gkw,
                ),
                params, jnp.zeros((m_blocks, 64), dtype=jnp.uint32),
                extra_key=f"bench-cgrp-k{k}-m{m_blocks}x64-{impl}",
            )
            ggames = m_blocks * 64 * spec.games_per_shuffle

            def gdispatch(i):
                n2 = m_blocks * 64
                sh = jnp.arange(n2 * i, n2 * (i + 1), dtype=jnp.uint32)
                return compiled(params, sh.reshape(m_blocks, 64))

            def gfetch(o):
                counts, mlo, mhi = o
                total = int(np.asarray(counts)[:, -3].sum())
                np.asarray(mlo)
                np.asarray(mhi)
                assert total == ggames
                return total

            for i in range(2):
                gfetch(gdispatch(i))
            start = time.perf_counter()
            outs = [gdispatch(10 + i) for i in range(2)]
            for o in outs:
                gfetch(o)
            grate = 2 * ggames / (time.perf_counter() - start)
            out["group_games_per_sec"] = round(grate, 1)
            out["group_shape"] = {"m": m_blocks, "nsb": 64, "family": family}
            if grate > rate:
                out["games_per_sec"] = round(grate, 1)
        except Exception as exc:  # never lose the per-k number to the race
            out["group_error"] = str(exc)[:120]
    return out


if __name__ == "__main__":
    main()
