"""Command-line interface: ``farkle-tpu run | time | watch | analyze | two-seed-pipeline``.

Command-surface parity with the reference CLI
(``/root/reference/src/farkle/cli/main.py:48,305``): global ``--config`` /
``--set`` / ``--log-level``, the same subcommands, and per-command log files.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time as time_mod
from pathlib import Path

from farkle_ii_tpu.config import (
    AppConfig,
    apply_dot_overrides,
    assign_config_sha,
    load_app_config,
)

logger = logging.getLogger("farkle_ii_tpu")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="farkle-tpu",
        description="TPU-native Farkle Monte-Carlo tournament and analysis framework",
    )
    parser.add_argument("--config", type=Path, default=None, help="YAML config file")
    parser.add_argument(
        "--set",
        dest="overrides",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="dotted config override, e.g. --set sim.seed=7",
    )
    parser.add_argument("--log-level", default="INFO")

    sub = parser.add_subparsers(dest="command", required=True)

    run_p = sub.add_parser("run", help="run the tournament simulation")
    run_p.add_argument("--force", action="store_true", help="discard resume state")
    run_p.add_argument("--metrics", action="store_true", help="write expanded metrics")
    run_p.add_argument("--row-dir", default=None, help="enable per-game row export")

    time_p = sub.add_parser("time", help="measure simulation throughput")
    time_p.add_argument("--n-games", type=int, default=8192)
    time_p.add_argument("--k", type=int, default=5)

    watch_p = sub.add_parser("watch", help="replay one game roll by roll")
    watch_p.add_argument("--seed", type=int, default=0)
    watch_p.add_argument("--k", type=int, default=2)

    analyze_p = sub.add_parser("analyze", help="run analysis stages")
    analyze_p.add_argument(
        "step",
        choices=["ingest", "curate", "combine", "metrics", "preprocess", "pipeline", "analytics"],
    )
    analyze_p.add_argument("--force", action="store_true")

    pair_p = sub.add_parser("two-seed-pipeline", help="full two-seed workflow")
    pair_p.add_argument("--force", action="store_true")
    pair_p.add_argument("--seed-a", type=int, default=None)
    pair_p.add_argument("--seed-b", type=int, default=None)

    return parser


def _load_config(args: argparse.Namespace) -> AppConfig:
    cfg = load_app_config(args.config)
    if args.overrides:
        cfg = apply_dot_overrides(cfg, args.overrides)
    return assign_config_sha(cfg)


def cmd_run(cfg: AppConfig, args: argparse.Namespace) -> int:
    from farkle_ii_tpu.simulation.runner import run_simulation

    if args.metrics:
        cfg.sim.expanded_metrics = True
    if args.row_dir:
        cfg.sim.row_dir = args.row_dir
    out = run_simulation(cfg, force=args.force, progress=lambda m: logger.info("%s", m))
    for n, res in out["results"].items():
        logger.info(
            "k=%d: %s games at %.0f games/s (resumed %d/%d batches)",
            n,
            f"{res.accumulator.games_attempted:,}",
            res.games_per_second,
            len(res.resumed_batches),
            res.plan.batch_count,
        )
    return 0


def cmd_time(cfg: AppConfig, args: argparse.Namespace) -> int:
    from farkle_ii_tpu.simulation.time_farkle import measure_sim_times

    measure_sim_times(cfg, n_games=args.n_games, k=args.k)
    return 0


def cmd_watch(cfg: AppConfig, args: argparse.Namespace) -> int:
    from farkle_ii_tpu.simulation.watch_game import watch_game

    watch_game(seed=args.seed, k=args.k)
    return 0


def cmd_analyze(cfg: AppConfig, args: argparse.Namespace) -> int:
    from farkle_ii_tpu.analysis import run_step

    run_step(cfg, args.step, force=args.force)
    return 0


def cmd_two_seed(cfg: AppConfig, args: argparse.Namespace) -> int:
    from farkle_ii_tpu.orchestration.two_seed_pipeline import run_pipeline

    seeds = None
    if args.seed_a is not None and args.seed_b is not None:
        seeds = (args.seed_a, args.seed_b)
    run_pipeline(cfg, seeds=seeds, force=args.force)
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=getattr(logging, str(args.log_level).upper(), logging.INFO),
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )
    start = time_mod.perf_counter()
    cfg = _load_config(args)
    handler = {
        "run": cmd_run,
        "time": cmd_time,
        "watch": cmd_watch,
        "analyze": cmd_analyze,
        "two-seed-pipeline": cmd_two_seed,
    }[args.command]
    code = handler(cfg, args)
    logger.info("%s finished in %.1fs", args.command, time_mod.perf_counter() - start)
    return code


if __name__ == "__main__":
    sys.exit(main())
