"""Analysis pipeline package: stage plans, registry, runner, stages.

Mirrors the reference analysis layer (``/root/reference/src/farkle/analysis/``):
ingest -> curate -> combine -> metrics -> game_stats -> [rng] -> trueskill ->
hgb -> screening, plus the H2H tail (candidate_freeze -> h2h_power ->
h2h_execute -> h2h_inference -> dominance -> agreement -> reporting).
Stages land incrementally; ``run_step`` dispatches the ones that exist.
"""

from __future__ import annotations

from typing import Any


def run_step(cfg: Any, step: str, *, force: bool = False) -> None:
    """Dispatch one ``farkle-tpu analyze <step>`` command."""
    if step == "ingest":
        from farkle_ii_tpu.analysis import ingest

        ingest.run(cfg, force=force)
    elif step == "curate":
        from farkle_ii_tpu.analysis import curate

        curate.run(cfg, force=force)
    elif step == "combine":
        from farkle_ii_tpu.analysis import combine

        combine.run(cfg, force=force)
    elif step == "metrics":
        from farkle_ii_tpu.analysis import metrics

        metrics.run(cfg, force=force)
        if cfg.analysis.outputs.get("compute_game_stats"):
            from farkle_ii_tpu.analysis import game_stats

            game_stats.run(cfg, force=force)
    elif step == "preprocess":
        for sub in ("ingest", "curate", "combine", "metrics"):
            run_step(cfg, sub, force=force)
    elif step in ("pipeline", "analytics"):
        from farkle_ii_tpu.analysis.stage_runner import run_all

        run_all(cfg, force=force)
    else:
        raise ValueError(f"unknown analyze step: {step!r}")
