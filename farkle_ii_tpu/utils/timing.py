"""Timing helpers (reference utils/timing.py parity)."""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def time_block(label: str, *, log: logging.Logger | None = None) -> Iterator[None]:
    """Log the wall-clock duration of a code block."""
    start = time.perf_counter()
    try:
        yield
    finally:
        (log or logger).info("%s took %.3fs", label, time.perf_counter() - start)
