"""Metrics stage wrapper: batch sufficient statistics + canonical estimators.

Reference parity: ``/root/reference/src/farkle/analysis/metrics.py:44`` —
wires per-k all-player batch metrics, canonical performance, and seat
analysis under one stamp.
"""

from __future__ import annotations

import logging

from farkle_ii_tpu.config import AppConfig

logger = logging.getLogger(__name__)


def run(cfg: AppConfig, *, force: bool = False) -> None:
    from farkle_ii_tpu.analysis import all_player_metrics, checks, performance, seat_analysis

    for k in cfg.sim.n_players_list:
        checks.check_pre_metrics(cfg, int(k))
        all_player_metrics.run_for_k(cfg, int(k), force=force)
    performance.build_canonical_performance(cfg, force=force)
    seat_analysis.build_canonical_seat_analysis(cfg, force=force)
