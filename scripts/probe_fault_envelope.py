"""Probe the TPU-runtime fault envelope over (k, chunk, compaction) shapes.

Round-1 production was pinned to 16-shuffle chunks by unexplained hard
libtpu faults at some batch shapes (tests/FAILURE_NOTES.md: k=3 B=73,960
crashes, B=27,520 works, bench's B=198,144 works). This harness maps the
envelope *empirically*: every candidate shape runs the production chunk
program in a fresh subprocess (a hard fault kills only the probe), the
result is conservation-checked, and the survey is published as a JSON
artifact that configs/runners consume instead of folklore constants.

Usage:
    python scripts/probe_fault_envelope.py --k 2,3,5 --ns 16,43,64 \
        --out results/fault_envelope.json [--nocompact-too] [--timeout 900]

Each probe prints one JSON line; the parent aggregates.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

_PROBE_SNIPPET = r"""
import sys, json
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
import numpy as np
from farkle_ii_tpu.simulation import strategies as S
from farkle_ii_tpu.simulation import tournament as T
from farkle_ii_tpu.simulation import runner as R

k, ns, compact = {k}, {ns}, {compact}
root_seed = {root_seed}
grid = S.build_strategy_grid()
p = S.pack_strategy_params(grid)
params = (jnp.asarray(p.score_threshold), jnp.asarray(p.dice_threshold),
          jnp.asarray(p.flags))
spec = T.TournamentSpec(root_seed=root_seed, k=k, n_strategies=len(grid))
# the production chunk compile (same AOT cache key the runner uses, so a
# probe sweep also pre-warms the production executable cache); faults happen
# at execution, never at compile, so the cache does not mask them. The
# game-kernel impl matches production's per-k auto choice (pallas from
# PALLAS_MIN_K) — the fault boundary tracks the program.
gkw = None
if R.resolve_game_impl("auto", k) == "pallas":
    gkw = {{"impl": "pallas", "pallas_tile_rows": 16}}
step = R._compile_step(spec, params, ns, True, with_rows=False,
                       compact=compact, pad_multiple=4096, game_kwargs=gkw)
out = step(params, jnp.arange(ns, dtype=jnp.uint32))
acc = T.TournamentAccumulator(len(grid))
acc.absorb(T.unpack_aggregates(np.asarray(out), len(grid)))
acc.check_conservation()
assert acc.games_attempted == ns * spec.games_per_shuffle
# steady-state timing: the first timed executable per process runs 2-4x
# slow (tests/FAILURE_NOTES.md), so warm >=3 then take the median of 5
# forced-fetch runs. Shapes rank within their own probe process only.
import time
sh0 = ns
for _ in range(2):
    np.asarray(step(params, jnp.arange(sh0, sh0 + ns, dtype=jnp.uint32)))
    sh0 += ns
timings = []
for _ in range(5):
    t0 = time.perf_counter()
    np.asarray(step(params, jnp.arange(sh0, sh0 + ns, dtype=jnp.uint32)))
    timings.append(time.perf_counter() - t0)
    sh0 += ns
med = sorted(timings)[2]
print(json.dumps({{"ok": True, "games": acc.games_attempted,
                   "steady_s": round(med, 4),
                   "games_per_sec": round(acc.games_attempted / med)}}))
"""


_BLOCK_GROUP_SNIPPET = r"""
import sys, json, time
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
import numpy as np
from farkle_ii_tpu.simulation import strategies as S
from farkle_ii_tpu.simulation import tournament as T
from farkle_ii_tpu.utils.aot_cache import cached_compile

k, m, nsb, compact = {k}, {m}, {nsb}, {compact}
family = {family!r}
root_seed = {root_seed}
grid = S.build_strategy_grid()
p = S.pack_strategy_params(grid)
params = (jnp.asarray(p.score_threshold), jnp.asarray(p.dice_threshold),
          jnp.asarray(p.flags))
spec = T.TournamentSpec(root_seed=root_seed, k=k, n_strategies=len(grid))
# "cscan"/"cflat" probe the round-4 compact-fetch group program (per-block
# counts + group metric limbs — the production single-host path); bare
# "scan"/"flat" keep probing the full (m, packed) fetch families
compact_fetch = family.startswith("c")
# production per-k kernel impl (runner.resolve_game_impl "auto")
from farkle_ii_tpu.simulation.runner import resolve_game_impl
gkw = None
if resolve_game_impl("auto", k) == "pallas":
    gkw = {{"impl": "pallas", "pallas_tile_rows": 16}}
if compact_fetch:
    fam = family[1:]
    fn = cached_compile(
        lambda prm, sh: T.play_blocks_compact(
            spec, prm, sh, family=fam, compact=compact, pad_multiple=4096,
            game_kwargs=gkw,
        ),
        params, jnp.zeros((m, nsb), dtype=jnp.uint32),
        # exact production cache key (runner.compact_group_step_for)
        extra_key=f"cblk{{fam}}-k{{spec.k}}-s{{spec.n_strategies}}-m{{m}}x{{nsb}}"
        f"-t{{spec.target_score}}-r{{spec.max_rounds}}-p4096"
        + ("" if compact else "-nocompact"),
    )
else:
    play = (T.play_and_aggregate_blocks_scanned if family == "scan"
            else T.play_and_aggregate_blocks)
    fn = cached_compile(
        lambda prm, sh: play(spec, prm, sh, compact=compact, pad_multiple=4096,
                             game_kwargs=gkw),
        params, jnp.zeros((m, nsb), dtype=jnp.uint32),
        # exact production cache key (runner.group_step_for): the probe sweep
        # then pre-warms the executables the mega run will load
        extra_key=f"blk{{family}}-k{{spec.k}}-s{{spec.n_strategies}}-m{{m}}x{{nsb}}"
        f"-t{{spec.target_score}}-r{{spec.max_rounds}}-p4096"
        + ("" if compact else "-nocompact"),
    )
sh0 = 0
def mk():
    global sh0
    a = np.arange(sh0, sh0 + m * nsb, dtype=np.uint32)
    sh0 += m * nsb
    return jnp.asarray(a.reshape(m, nsb))

def fetch():
    out = fn(params, mk())
    if compact_fetch:
        counts, mlo, mhi = out
        return np.asarray(counts), np.asarray(mlo), np.asarray(mhi)
    return (np.asarray(out),)

first = fetch()
acc = T.TournamentAccumulator(len(grid))
if compact_fetch:
    counts, mlo, mhi = first
    for b in range(m):
        acc.merge(T.unpack_block_counts(counts[b], nsb, spec.games_per_shuffle, len(grid)))
    sums, sq = T.group_metrics_from_limbs(mlo, mhi, len(grid))
    acc.add_metric_totals(sums, sq)
else:
    for b in range(m):
        acc.absorb(T.unpack_aggregates(first[0][b], len(grid)))
acc.check_conservation()
assert acc.games_attempted == m * nsb * spec.games_per_shuffle
for _ in range(2):
    fetch()
timings = []
for _ in range(5):
    t0 = time.perf_counter()
    fetch()
    timings.append(time.perf_counter() - t0)
med = sorted(timings)[2]
print(json.dumps({{"ok": True, "games": acc.games_attempted,
                   "steady_s": round(med, 4),
                   "games_per_sec": round(acc.games_attempted / med)}}))
"""


_ROWS_GROUP_SNIPPET = r"""
import sys, json, time
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
import numpy as np
from farkle_ii_tpu.simulation import strategies as S
from farkle_ii_tpu.simulation import tournament as T
from farkle_ii_tpu.utils.aot_cache import cached_compile

k, m, nsb = {k}, {m}, {nsb}
root_seed = {root_seed}
grid = S.build_strategy_grid()
p = S.pack_strategy_params(grid)
params = (jnp.asarray(p.score_threshold), jnp.asarray(p.dice_threshold),
          jnp.asarray(p.flags))
spec = T.TournamentSpec(root_seed=root_seed, k=k, n_strategies=len(grid))
# the exact production rows-group program + cache key
# (runner.group_step_for with with_rows=True, bit-packed row format)
fn = cached_compile(
    lambda prm, sh: T.play_and_aggregate_blocks_with_rows(
        spec, prm, sh, compact=True, pad_multiple=4096, row_format="bits"
    ),
    params, jnp.zeros((m, nsb), dtype=jnp.uint32),
    extra_key=f"blkgrp-k{{spec.k}}-s{{spec.n_strategies}}"
    f"-m{{m}}x{{nsb}}-t{{spec.target_score}}-r{{spec.max_rounds}}"
    f"-p4096-rows2bits",
)
sh0 = 0
def fetch():
    global sh0
    a = np.arange(sh0, sh0 + m * nsb, dtype=np.uint32)
    sh0 += m * nsb
    aggs, rows, overflow = fn(params, jnp.asarray(a.reshape(m, nsb)))
    return np.asarray(aggs), np.asarray(rows), bool(np.asarray(overflow))

aggs, rows, overflow = fetch()
assert not overflow
acc = T.TournamentAccumulator(len(grid))
for b in range(m):
    acc.absorb(T.unpack_aggregates(aggs[b], len(grid)))
acc.check_conservation()
assert acc.games_attempted == m * nsb * spec.games_per_shuffle
for _ in range(2):
    fetch()
timings = []
for _ in range(5):
    t0 = time.perf_counter()
    fetch()
    timings.append(time.perf_counter() - t0)
med = sorted(timings)[2]
print(json.dumps({{"ok": True, "games": acc.games_attempted,
                   "steady_s": round(med, 4),
                   "games_per_sec": round(acc.games_attempted / med)}}))
"""


_H2H_PROBE_SNIPPET = r"""
import sys, json
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
import numpy as np
from farkle_ii_tpu.ops import game_kernel as gk, rng
from farkle_ii_tpu.simulation import strategies as S

batch = {batch}
grid = S.build_strategy_grid()
ids = np.arange(batch * 2, dtype=np.int64) % len(grid)
p = S.pack_strategy_params([grid[i] for i in ids])
st = jnp.asarray(p.score_threshold).reshape(batch, 2)
dt = jnp.asarray(p.dice_threshold).reshape(batch, 2)
fl = jnp.asarray(p.flags).reshape(batch, 2)
base = rng.purpose_base_key(rng.RandomPurpose.H2H_PLAYER, root_seed=9, k=2)
kd = gk.game_key_data_for_games(base, jnp.arange(batch))
step = jax.jit(gk.play_games)
out = step(kd, st, dt, fl)
comp = int(np.asarray(out.completed).sum())
safety = int(np.asarray(~out.completed).sum())
assert comp + safety == batch
# steady-state timing (same warm-then-median discipline as the chunk probe)
import time
g0 = batch
for _ in range(2):
    kd = gk.game_key_data_for_games(base, jnp.arange(g0, g0 + batch))
    np.asarray(step(kd, st, dt, fl).completed)
    g0 += batch
timings = []
for _ in range(5):
    kd = gk.game_key_data_for_games(base, jnp.arange(g0, g0 + batch))
    t0 = time.perf_counter()
    np.asarray(step(kd, st, dt, fl).completed)
    timings.append(time.perf_counter() - t0)
    g0 += batch
med = sorted(timings)[2]
print(json.dumps({{"ok": True, "games": batch, "steady_s": round(med, 4),
                   "games_per_sec": round(batch / med)}}))
"""


_H2H_WINDOW_PROBE_SNIPPET = r"""
import sys, json, time
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
import numpy as np
from farkle_ii_tpu.analysis.h2h_schedule import _h2h_window_step
from farkle_ii_tpu.simulation import strategies as S

nb, window, root = {nb}, {window}, {root_seed}
grid = S.build_strategy_grid()
ids = np.arange(nb * 2, dtype=np.int64) % len(grid)
p = S.pack_strategy_params([grid[i] for i in ids])
st = np.asarray(p.score_threshold).reshape(nb, 2)
dt = np.asarray(p.dice_threshold).reshape(nb, 2)
fl = np.asarray(p.flags).reshape(nb, 2)
pair_g = jnp.arange(nb, dtype=jnp.uint32)
order_g = jnp.zeros(nb, dtype=jnp.uint32)
prior = jnp.zeros(nb, dtype=jnp.int32)
# n_required beyond the window: every attempt counts (worst-case work)
n_req = jnp.full((nb,), 2 * window, dtype=jnp.int32)
step = _h2h_window_step(nb, window, root, use_aot=True)

def run(lo):
    attempts = jnp.arange(lo, lo + window, dtype=jnp.uint32)
    out = step(pair_g, order_g, attempts,
               jnp.asarray(st[:, 0]), jnp.asarray(dt[:, 0]), jnp.asarray(fl[:, 0]),
               jnp.asarray(st[:, 1]), jnp.asarray(dt[:, 1]), jnp.asarray(fl[:, 1]),
               prior, n_req)
    return np.asarray(out)

out = run(0)
assert out.shape == (nb, 4)
assert int(out[:, 0].sum()) == nb * window  # every attempt counted
for i in range(2):
    run((i + 1) * window)
timings = []
for i in range(5):
    t0 = time.perf_counter()
    run((3 + i) * window)
    timings.append(time.perf_counter() - t0)
med = sorted(timings)[2]
games = nb * window
print(json.dumps({{"ok": True, "games": games, "steady_s": round(med, 4),
                   "games_per_sec": round(games / med)}}))
"""


def probe_one_h2h_window(
    repo: Path, nb: int, window: int, timeout: float, root_seed: int = 9
) -> dict:
    """Probe one fused H2H attempt-window shape — the *production* H2H
    program family ((blocks, window) + stop-at-target scan), which the flat
    play_games probes do not transfer to (tests/FAILURE_NOTES.md: the
    1M-game flat-probed cap compiled a window program that crashed the
    backend). Runs in a subprocess so a compile/runtime fault cannot kill
    the sweep; with the production root seed the probe pre-warms the exact
    AOT executables execution will load."""
    code = _H2H_WINDOW_PROBE_SNIPPET.format(
        repo=str(repo), nb=nb, window=window, root_seed=root_seed
    )
    start = time.perf_counter()
    extra: dict = {}
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout,
        )
        rc = proc.returncode
        tail = (proc.stdout + proc.stderr)[-2000:]
        ok = rc == 0 and '"ok": true' in proc.stdout.lower()
        if ok:
            try:
                extra = json.loads(proc.stdout.strip().splitlines()[-1])
            except (json.JSONDecodeError, IndexError):
                pass
    except subprocess.TimeoutExpired as exc:
        rc, ok = -9, False
        tail = f"timeout after {timeout}s: " + str(exc)[-500:]
    return {
        "nb": nb,
        "window": window,
        "ok": ok,
        "rc": rc,
        "seconds": round(time.perf_counter() - start, 1),
        "steady_s": extra.get("steady_s"),
        "games_per_sec": extra.get("games_per_sec"),
        "tail": None if ok else tail,
    }


def probe_one_rows_group(
    repo: Path, k: int, m: int, nsb: int, timeout: float, root_seed: int = 1234,
) -> dict:
    """Probe one row-export block-group shape (bit-packed rows program).

    The rows program is a distinct family from the aggregate-only groups
    (extra row packing + a much larger fetch), so its fault/speed envelope
    is probed separately; grounds the runner's rows-group dispatch."""
    code = _ROWS_GROUP_SNIPPET.format(
        repo=str(repo), k=k, m=m, nsb=nsb, root_seed=root_seed
    )
    start = time.perf_counter()
    extra: dict = {}
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout,
        )
        rc = proc.returncode
        tail = (proc.stdout + proc.stderr)[-2000:]
        ok = rc == 0 and '"ok": true' in proc.stdout.lower()
        if ok:
            try:
                extra = json.loads(proc.stdout.strip().splitlines()[-1])
            except (json.JSONDecodeError, IndexError):
                pass
    except subprocess.TimeoutExpired as exc:
        rc, ok = -9, False
        tail = f"timeout after {timeout}s: " + str(exc)[-500:]
    return {
        "k": k, "m": m, "nsb": nsb,
        "ok": ok, "rc": rc,
        "seconds": round(time.perf_counter() - start, 1),
        "steady_s": extra.get("steady_s"),
        "games_per_sec": extra.get("games_per_sec"),
        "tail": None if ok else tail,
    }


def probe_one_h2h(repo: Path, batch: int, timeout: float) -> dict:
    """Probe one 2-seat H2H dispatch batch shape (a distinct program family
    from the tournament chunks, so the tournament envelope does not
    transfer; grounds ``tpu.h2h_games_per_dispatch``)."""
    code = _H2H_PROBE_SNIPPET.format(repo=str(repo), batch=batch)
    start = time.perf_counter()
    extra: dict = {}
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout,
        )
        rc = proc.returncode
        tail = (proc.stdout + proc.stderr)[-2000:]
        ok = rc == 0 and '"ok": true' in proc.stdout.lower()
        if ok:
            try:
                extra = json.loads(proc.stdout.strip().splitlines()[-1])
            except (json.JSONDecodeError, IndexError):
                pass
    except subprocess.TimeoutExpired as exc:
        rc, ok = -9, False
        tail = f"timeout after {timeout}s: " + str(exc)[-500:]
    return {
        "h2h_batch": batch,
        "ok": ok,
        "rc": rc,
        "seconds": round(time.perf_counter() - start, 1),
        "steady_s": extra.get("steady_s"),
        "games_per_sec": extra.get("games_per_sec"),
        "tail": None if ok else tail,
    }


def probe_one_block_group(
    repo: Path, k: int, m: int, nsb: int, compact: bool, timeout: float,
    root_seed: int = 1234, family: str = "scan",
) -> dict:
    """Probe one block-group shape (one dispatch = m whole recovery blocks).

    ``family``: "scan" = lax.scan of per-block batches; "flat" = one flat
    m*nsb-shuffle batch. The faster family is k-dependent (measured: scan
    wins at k=2, flat at k=5), so both are probed and recorded.
    """
    code = _BLOCK_GROUP_SNIPPET.format(
        repo=str(repo), k=k, m=m, nsb=nsb, compact=compact,
        root_seed=root_seed, family=family,
    )
    start = time.perf_counter()
    extra: dict = {}
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout,
        )
        rc = proc.returncode
        tail = (proc.stdout + proc.stderr)[-2000:]
        ok = rc == 0 and '"ok": true' in proc.stdout.lower()
        if ok:
            try:
                extra = json.loads(proc.stdout.strip().splitlines()[-1])
            except (json.JSONDecodeError, IndexError):
                pass
    except subprocess.TimeoutExpired as exc:
        rc, ok = -9, False
        tail = f"timeout after {timeout}s: " + str(exc)[-500:]
    return {
        "k": k, "m": m, "nsb": nsb, "compact": compact, "family": family,
        "ok": ok, "rc": rc,
        "seconds": round(time.perf_counter() - start, 1),
        "steady_s": extra.get("steady_s"),
        "games_per_sec": extra.get("games_per_sec"),
        "tail": None if ok else tail,
    }


def probe_one(
    repo: Path, k: int, ns: int, compact: bool, timeout: float,
    root_seed: int = 1234,
) -> dict:
    code = _PROBE_SNIPPET.format(
        repo=str(repo), k=k, ns=ns, compact=compact, root_seed=root_seed
    )
    start = time.perf_counter()
    extra: dict = {}
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout,
        )
        rc = proc.returncode
        tail = (proc.stdout + proc.stderr)[-2000:]
        ok = rc == 0 and '"ok": true' in proc.stdout.lower()
        if ok:
            try:
                extra = json.loads(proc.stdout.strip().splitlines()[-1])
            except (json.JSONDecodeError, IndexError):
                pass
    except subprocess.TimeoutExpired as exc:
        rc, ok = -9, False
        tail = f"timeout after {timeout}s: " + str(exc)[-500:]
    return {
        "k": k,
        "ns": ns,
        "compact": compact,
        "ok": ok,
        "rc": rc,
        "seconds": round(time.perf_counter() - start, 1),
        "steady_s": extra.get("steady_s"),
        "games_per_sec": extra.get("games_per_sec"),
        "tail": None if ok else tail,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--k", default="2,3,4,5,6,8,10,12")
    ap.add_argument("--ns", default="",
                    help="comma-separated single-chunk shuffle counts")
    ap.add_argument("--nocompact-too", action="store_true")
    ap.add_argument(
        "--nocompact-only", action="store_true",
        help="probe only compaction-off shapes (the fault boundary is "
        "compaction-path specific; off-variants may be safe where the "
        "compacted shape hard-faults)",
    )
    ap.add_argument(
        "--h2h-batches", default="",
        help="comma-separated 2-seat H2H dispatch batch sizes to probe too",
    )
    ap.add_argument(
        "--h2h-windows", default="",
        help="comma-separated NBxWINDOW shapes of the fused attempt-window "
        "program to probe (e.g. 32x2048,128x2048); probed ascending so a "
        "compile-crash boundary stops the sweep before poking the backend "
        "with still-bigger programs",
    )
    ap.add_argument(
        "--block-groups", default="",
        help="comma-separated m values for the block-group program "
        "(one dispatch = m whole recovery blocks of --nsb shuffles)",
    )
    ap.add_argument("--nsb", type=int, default=43,
                    help="shuffles per recovery block for --block-groups")
    ap.add_argument(
        "--rows-groups", default="",
        help="comma-separated m values for the row-export group program "
        "(bit-packed rows; a distinct program family from the aggregate "
        "groups) at --rows-nsb shuffles per block",
    )
    ap.add_argument("--rows-nsb", type=int, default=43,
                    help="shuffles per block for --rows-groups")
    ap.add_argument("--rows-k", default="5",
                    help="player counts for --rows-groups probes")
    ap.add_argument("--group-families", default="scan,flat",
                    help="block-group program families to probe "
                    "(scan = lax.scan of per-block batches, flat = one "
                    "flat m*nsb batch; the faster one is k-dependent)")
    ap.add_argument(
        "--root-seed", type=int, default=1234,
        help="tournament root seed for chunk/block-group probes; pass the "
        "production seed so probe compiles pre-warm its AOT cache entries",
    )
    ap.add_argument("--timeout", type=float, default=1200.0)
    ap.add_argument("--out", default="results/fault_envelope.json")
    ap.add_argument(
        "--no-merge", action="store_true",
        help="overwrite instead of merging with an existing artifact",
    )
    args = ap.parse_args()

    repo = Path(__file__).resolve().parent.parent
    ks = [int(v) for v in args.k.split(",")]
    nss = [int(v) for v in args.ns.split(",") if v]
    if args.nocompact_only:
        compacts = [False]
    elif args.nocompact_too:
        compacts = [True, False]
    else:
        compacts = [True]

    probes: list = []
    block_group_probes: list = []
    h2h_probes: list = []
    h2h_window_probes: list = []
    rows_group_probes: list = []

    # flush (merge + write) after EVERY probe: sweeps are long and may be
    # killed between probes — completed probes must never be lost
    def flush() -> None:
        _write_envelope(
            repo, Path(args.out), probes, block_group_probes, h2h_probes,
            h2h_window_probes, rows_group_probes, merge=not args.no_merge,
        )

    for k in ks:
        for ns in nss:
            for compact in compacts:
                result = probe_one(
                    repo, k, ns, compact, args.timeout,
                    root_seed=args.root_seed,
                )
                probes.append(result)
                print(json.dumps(result), flush=True)
                flush()

    families = [f for f in args.group_families.split(",") if f]
    for k in ks:
        for m in [int(v) for v in args.block_groups.split(",") if v]:
            for compact in compacts:
                for family in families:
                    result = probe_one_block_group(
                        repo, k, m, args.nsb, compact, args.timeout,
                        root_seed=args.root_seed, family=family,
                    )
                    block_group_probes.append(result)
                    print(json.dumps(result), flush=True)
                    flush()

    for k in [int(v) for v in args.rows_k.split(",") if v]:
        for m in [int(v) for v in args.rows_groups.split(",") if v]:
            result = probe_one_rows_group(
                repo, k, m, args.rows_nsb, args.timeout,
                root_seed=args.root_seed,
            )
            rows_group_probes.append(result)
            print(json.dumps(result), flush=True)
            flush()

    for batch in [int(v) for v in args.h2h_batches.split(",") if v]:
        result = probe_one_h2h(repo, batch, args.timeout)
        h2h_probes.append(result)
        print(json.dumps(result), flush=True)
        flush()

    window_shapes = sorted(
        (
            (int(nb), int(w))
            for nb, w in (
                v.lower().split("x") for v in args.h2h_windows.split(",") if v
            )
        ),
        key=lambda s: s[0] * s[1],
    )
    for nb, window in window_shapes:
        result = probe_one_h2h_window(
            repo, nb, window, args.timeout, root_seed=args.root_seed
        )
        h2h_window_probes.append(result)
        print(json.dumps(result), flush=True)
        flush()
        if not result["ok"]:
            # a window-program fault can wedge the remote backend for a long
            # time (FAILURE_NOTES): never escalate past the first failure
            print("window probe failed; stopping the ascending window sweep",
                  flush=True)
            break

    flush()
    print("sweep complete")
    return 0


def _write_envelope(
    repo: Path,
    out: Path,
    probes: list,
    block_group_probes: list,
    h2h_probes: list,
    h2h_window_probes: list = (),
    rows_group_probes: list = (),
    *,
    merge: bool,
) -> None:
    import jax

    # the envelope is specific to (device, jax build, kernel code): record
    # the code identity so a stale artifact is recognizable
    sys.path.insert(0, str(repo))
    from farkle_ii_tpu.utils.authenticated_contract import resolve_code_identity

    if merge and out.exists():
        # merge: a new probe of the same shape replaces the old result, so
        # separate sweep invocations accumulate into one artifact
        try:
            old = json.loads(out.read_text())
        except (json.JSONDecodeError, OSError):
            old = {}

        def merged(old_list, new_list, key_fields):
            new_keys = {tuple(p[f] for f in key_fields) for p in new_list}
            kept = [
                p for p in old_list
                if tuple(p.get(f) for f in key_fields) not in new_keys
            ]
            return kept + new_list

        probes = merged(old.get("probes", []), probes, ("k", "ns", "compact"))
        block_group_probes = merged(
            old.get("block_group_probes", []), block_group_probes,
            ("k", "m", "nsb", "compact", "family"),
        )
        h2h_probes = merged(old.get("h2h_probes", []), h2h_probes, ("h2h_batch",))
        h2h_window_probes = merged(
            old.get("h2h_window_probes", []), list(h2h_window_probes),
            ("nb", "window"),
        )
        rows_group_probes = merged(
            old.get("rows_group_probes", []), list(rows_group_probes),
            ("k", "m", "nsb"),
        )

    payload = {
        "envelope_version": 1,
        "platform": jax.devices()[0].platform,
        "device_kind": getattr(jax.devices()[0], "device_kind", "?"),
        "jax_version": jax.__version__,
        "code_identity": resolve_code_identity(repo).to_dict(),
        "n_strategies": 5160,
        "probes": probes,
        "ok_shapes": sorted(
            [[p["k"], p["ns"], p["compact"]] for p in probes if p["ok"]]
        ),
        "block_group_probes": block_group_probes,
        "h2h_probes": h2h_probes,
        "h2h_ok_batches": sorted(p["h2h_batch"] for p in h2h_probes if p["ok"]),
        "h2h_window_probes": list(h2h_window_probes),
        "h2h_window_ok": sorted(
            [p["nb"], p["window"]] for p in h2h_window_probes if p["ok"]
        ),
        "rows_group_probes": list(rows_group_probes),
    }
    out.parent.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix(".tmp")
    tmp.write_text(json.dumps(payload, indent=2))
    tmp.replace(out)
    n_ok = sum(p["ok"] for p in probes) + sum(p["ok"] for p in block_group_probes)
    n_all = len(probes) + len(block_group_probes)
    print(f"envelope written to {out} ({n_ok}/{n_all} ok)", flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
