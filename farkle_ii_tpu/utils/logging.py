"""Structured logging configuration (reference utils/logging.py parity)."""

from __future__ import annotations

import logging
from pathlib import Path


def configure_logging(
    level: int | str = logging.INFO, *, log_file: str | Path | None = None
) -> None:
    """Configure the root logger with console (and optional file) handlers."""
    if isinstance(level, str):
        level = getattr(logging, level.upper(), logging.INFO)
    root = logging.getLogger()
    root.setLevel(level)
    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
    if not any(isinstance(h, logging.StreamHandler) for h in root.handlers):
        console = logging.StreamHandler()
        console.setFormatter(fmt)
        root.addHandler(console)
    if log_file is not None:
        path = Path(log_file)
        path.parent.mkdir(parents=True, exist_ok=True)
        handler = logging.FileHandler(path)
        handler.setFormatter(fmt)
        root.addHandler(handler)
