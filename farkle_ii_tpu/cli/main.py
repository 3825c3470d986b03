"""Command-line interface: ``farkle-tpu run | time | watch | analyze | two-seed-pipeline``.

Command-surface parity with the reference CLI
(``/root/reference/src/farkle/cli/main.py:48,305``): global ``--config`` /
``--set`` / ``--log-level``, the same subcommands with the analyze-stage
game-stats / RNG / rare-event flags (``:103-231``), ``--seed-pair``
(``:253``), per-command log files (``:291``), and per-command expected
seed-list lengths (``:312,333-343``).
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
    expected_seed_list_length,
    load_app_config,
)

logger = logging.getLogger("farkle_ii_tpu")


def _add_analysis_flags(p: argparse.ArgumentParser) -> None:
    """Game-stats / RNG / rare-event knobs shared by metrics-bearing steps."""
    p.add_argument(
        "--compute-game-stats", action="store_true",
        help="also compute game-length statistics from curated rows",
    )
    p.add_argument(
        "--rng-diagnostics", action="store_true",
        help="also compute RNG autocorrelation diagnostics",
    )
    p.add_argument(
        "--rng-lags", type=int, nargs="+", default=None,
        help="positive lags (default: 1) for RNG diagnostics",
    )
    p.add_argument(
        "--margin-thresholds", type=int, nargs="+", default=None,
        help="victory-margin thresholds used for close-game summaries",
    )
    p.add_argument(
        "--rare-event-target", type=int, default=None,
        help="target score for multi-player reach flags (default: 10000)",
    )
    p.add_argument(
        "--rare-event-margin-quantile", type=float, default=None,
        help="quantile to derive the rare-event margin threshold (e.g. 0.001)",
    )
    p.add_argument(
        "--rare-event-target-rate", type=float, default=None,
        help="target rate for multi-target rare events (e.g. 1e-4)",
    )


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
    watch_p.add_argument(
        "--strategy",
        action="append",
        default=None,
        metavar="SPEC",
        help="explicit per-seat strategy (id or canonical string, e.g. "
        "'Strat(300,2)[SD][FO FS][OR][H-]'); repeat per seat, cycled if fewer",
    )

    analyze_p = sub.add_parser("analyze", help="run analysis stages")
    analyze_sub = analyze_p.add_subparsers(dest="step", required=True)
    for step in ("ingest", "curate", "combine"):
        step_p = analyze_sub.add_parser(step)
        step_p.add_argument("--force", action="store_true")
    for step in ("metrics", "preprocess", "pipeline"):
        step_p = analyze_sub.add_parser(step)
        step_p.add_argument("--force", action="store_true")
        _add_analysis_flags(step_p)
    analytics_p = analyze_sub.add_parser(
        "analytics", help="canonical root analytics + single-root H2H tail"
    )
    analytics_p.add_argument("--force", action="store_true")

    pair_p = sub.add_parser("two-seed-pipeline", help="full two-seed workflow")
    pair_p.add_argument("--force", action="store_true")
    pair_p.add_argument("--seed-a", type=int, default=None)
    pair_p.add_argument("--seed-b", type=int, default=None)
    pair_p.add_argument(
        "--seed-pair", type=int, nargs=2, default=None, metavar=("A", "B"),
        help="both root seeds at once (alternative to --seed-a/--seed-b)",
    )

    return parser


def _apply_analysis_flags(cfg: AppConfig, args: argparse.Namespace) -> None:
    if getattr(args, "compute_game_stats", False):
        cfg.analysis.outputs["compute_game_stats"] = True
    if getattr(args, "rng_diagnostics", False):
        cfg.analysis.run_rng_diagnostics = True
    if getattr(args, "rng_lags", None):
        if any(lag < 1 for lag in args.rng_lags):
            raise SystemExit("--rng-lags must be positive")
        cfg.analysis.rng_lags = list(args.rng_lags)
    if getattr(args, "margin_thresholds", None):
        cfg.analysis.margin_thresholds = list(args.margin_thresholds)
    if getattr(args, "rare_event_target", None) is not None:
        cfg.analysis.rare_event_target = int(args.rare_event_target)
    if getattr(args, "rare_event_margin_quantile", None) is not None:
        cfg.analysis.rare_event_margin_quantile = float(args.rare_event_margin_quantile)
    if getattr(args, "rare_event_target_rate", None) is not None:
        cfg.analysis.rare_event_target_rate = float(args.rare_event_target_rate)


def _resolve_seed_pair(args: argparse.Namespace) -> tuple[int, int] | None:
    if args.seed_pair is not None:
        if args.seed_a is not None or args.seed_b is not None:
            raise SystemExit("--seed-pair and --seed-a/--seed-b are mutually exclusive")
        return (int(args.seed_pair[0]), int(args.seed_pair[1]))
    if args.seed_a is not None and args.seed_b is not None:
        return (int(args.seed_a), int(args.seed_b))
    if args.seed_a is not None or args.seed_b is not None:
        raise SystemExit("--seed-a and --seed-b must be given together")
    return None


def _enforce_seed_list_length(cfg: AppConfig, command: str) -> None:
    """Per-command expected root-list length (reference config.py:125-136)."""
    expected = expected_seed_list_length(command)
    if expected is None:
        return
    seeds = cfg.sim.seed_list or [cfg.sim.seed]
    if len(seeds) != expected:
        raise SystemExit(
            f"command {command!r} requires exactly {expected} root seed(s) in "
            f"sim.seed_list; got {seeds}"
        )


def _resolve_log_file(cfg: AppConfig, args: argparse.Namespace) -> Path | None:
    """Per-command log destination (reference cli/main.py:291)."""
    command = args.command
    if command == "two-seed-pipeline":
        from farkle_ii_tpu.orchestration import seed_utils

        seeds = _resolve_seed_pair(args) or tuple(
            int(s) for s in (cfg.sim.seed_list or [])[:2]
        )
        if len(seeds) == 2:
            return seed_utils.pair_dir(cfg, seeds[0], seeds[1]) / "log.txt"
        return None
    if command in {"run", "analyze"}:
        return cfg.results_root / "log.txt"
    return None


def _attach_log_file(path: Path | None) -> None:
    if path is None:
        return
    path.parent.mkdir(parents=True, exist_ok=True)
    handler = logging.FileHandler(path, encoding="utf-8")
    handler.setFormatter(
        logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
    )
    logging.getLogger().addHandler(handler)


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

    watch_game(seed=args.seed, k=args.k, strategy_specs=args.strategy)
    return 0


def cmd_analyze(cfg: AppConfig, args: argparse.Namespace) -> int:
    from farkle_ii_tpu.analysis import run_step

    _apply_analysis_flags(cfg, args)
    run_step(cfg, args.step, force=args.force)
    return 0


def cmd_two_seed(cfg: AppConfig, args: argparse.Namespace) -> int:
    from farkle_ii_tpu.orchestration.two_seed_pipeline import run_pipeline

    run_pipeline(cfg, seeds=_resolve_seed_pair(args), force=args.force)
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=getattr(logging, str(args.log_level).upper(), logging.INFO),
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )
    start = time_mod.perf_counter()
    # multi-host bootstrap: no-op unless a jax.distributed coordinator is
    # configured in the environment (parallel/distributed.py)
    from farkle_ii_tpu.parallel.distributed import initialize_from_env

    initialize_from_env()
    cfg = _load_config(args)
    if args.command == "two-seed-pipeline":
        pair = _resolve_seed_pair(args)
        if pair is not None:
            cfg.sim.seed_list = [pair[0], pair[1]]
            cfg.sim.seed = pair[0]
            cfg = assign_config_sha(cfg)
    _enforce_seed_list_length(cfg, args.command)
    _attach_log_file(_resolve_log_file(cfg, args))
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
