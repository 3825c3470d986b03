"""Dump the HLO of a (k, ns, compact) tournament chunk program.

Companion to scripts/probe_fault_envelope.py: when a batch shape hard-faults
the TPU runtime, this captures the *exact program* (optimized HLO when the
backend can compile it, else StableHLO) for that shape so the fault can be
reported/bisected offline without re-crashing a worker. Lowering and
compilation never execute the program, so dumping a faulting shape is safe.

Usage:
    python scripts/dump_fault_hlo.py --k 3 --ns 43 --out results/fault_repro/
    python scripts/dump_fault_hlo.py --k 3 --ns 43 --nocompact --stablehlo-only
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--k", type=int, required=True)
    ap.add_argument("--ns", type=int, required=True)
    ap.add_argument("--nocompact", action="store_true")
    ap.add_argument("--stablehlo-only", action="store_true",
                    help="skip backend compilation (no TPU round-trips)")
    ap.add_argument("--out", default="results/fault_repro")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from farkle_ii_tpu.simulation import strategies as S
    from farkle_ii_tpu.simulation import tournament as T

    grid = S.build_strategy_grid()
    p = S.pack_strategy_params(grid)
    params = (
        jnp.asarray(p.score_threshold),
        jnp.asarray(p.dice_threshold),
        jnp.asarray(p.flags),
    )
    spec = T.TournamentSpec(root_seed=1234, k=args.k, n_strategies=len(grid))
    compact = not args.nocompact

    fn = jax.jit(
        lambda prm, sh: T.pack_aggregates(
            T.play_and_aggregate(spec, prm, sh, compact=compact)
        )
    )
    lowered = fn.lower(params, jnp.arange(args.ns, dtype=jnp.uint32))

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    tag = f"k{args.k}_ns{args.ns}" + ("" if compact else "_nocompact")

    shlo = out_dir / f"chunk_{tag}.stablehlo.txt"
    shlo.write_text(lowered.as_text())
    print(f"wrote {shlo}")

    if not args.stablehlo_only:
        compiled = lowered.compile()
        hlo = out_dir / f"chunk_{tag}.optimized_hlo.txt"
        hlo.write_text("\n".join(m.to_string() for m in compiled.runtime_executable().hlo_modules()))
        print(f"wrote {hlo}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
