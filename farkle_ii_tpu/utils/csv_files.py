"""Queue-fed CSV writer thread (reference utils/csv_files.py parity)."""

from __future__ import annotations

import csv
import queue
import threading
from pathlib import Path
from typing import Any, Mapping

_SENTINEL = object()


class CsvWriterThread:
    """Background thread appending dict rows pushed through a queue."""

    def __init__(self, path: str | Path, fieldnames: list[str], *, maxsize: int = 1024):
        self.path = Path(path)
        self.fieldnames = list(fieldnames)
        self.queue: queue.Queue = queue.Queue(maxsize=maxsize)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        new = not self.path.exists() or self.path.stat().st_size == 0
        with open(self.path, "a", newline="", encoding="utf-8") as f:
            writer = csv.DictWriter(f, fieldnames=self.fieldnames)
            if new:
                writer.writeheader()
            while True:
                item = self.queue.get()
                if item is _SENTINEL:
                    return
                writer.writerow(item)

    def write(self, row: Mapping[str, Any]) -> None:
        self.queue.put(dict(row))

    def close(self) -> None:
        self.queue.put(_SENTINEL)
        self._thread.join()
