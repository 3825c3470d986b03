"""Scheduled progress logging with rates and ETA.

Reference parity (``/root/reference/src/farkle/utils/progress.py``):
``ProgressLogConfig`` holds phase-dependent emission intervals and
``ScheduledProgressLogger`` emits rate/ETA lines on that schedule without
flooding logs on fast loops.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class ProgressLogConfig:
    frequent_interval_seconds: float = 5.0
    info_phase_seconds: float = 60.0
    ongoing_interval_seconds: float = 30.0


class ScheduledProgressLogger:
    """Emit progress lines on a schedule: frequent early, sparser later."""

    def __init__(
        self,
        total_units: int | None,
        *,
        unit: str = "items",
        config: ProgressLogConfig | None = None,
        log: logging.Logger | None = None,
    ) -> None:
        self.total_units = total_units
        self.unit = unit
        self.config = config or ProgressLogConfig()
        self.log = log or logger
        self.start = time.monotonic()
        self._last_emit = self.start
        self.done_units = 0

    def update(self, done_units: int, *, force: bool = False) -> None:
        """Record progress; emit a line if the schedule says so."""
        self.done_units = done_units
        now = time.monotonic()
        elapsed = now - self.start
        interval = (
            self.config.frequent_interval_seconds
            if elapsed < self.config.info_phase_seconds
            else self.config.ongoing_interval_seconds
        )
        if not force and now - self._last_emit < interval:
            return
        self._last_emit = now
        rate = done_units / elapsed if elapsed > 0 else 0.0
        if self.total_units:
            remaining = max(self.total_units - done_units, 0)
            eta = remaining / rate if rate > 0 else float("inf")
            self.log.info(
                "progress: %s/%s %s (%.1f/s, ETA %.0fs)",
                f"{done_units:,}", f"{self.total_units:,}", self.unit, rate, eta,
            )
        else:
            self.log.info(
                "progress: %s %s (%.1f/s)", f"{done_units:,}", self.unit, rate
            )

    def finish(self) -> None:
        self.update(self.done_units, force=True)
