"""CSV append sinks (reference utils/sinks.py parity)."""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Any, Iterable, Mapping


class CsvSink:
    """Append dict rows to a CSV file, writing the header once."""

    def __init__(self, path: str | Path, fieldnames: list[str]) -> None:
        self.path = Path(path)
        self.fieldnames = list(fieldnames)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._new = not self.path.exists() or self.path.stat().st_size == 0

    def write_rows(self, rows: Iterable[Mapping[str, Any]]) -> int:
        count = 0
        with open(self.path, "a", newline="", encoding="utf-8") as f:
            writer = csv.DictWriter(f, fieldnames=self.fieldnames)
            if self._new:
                writer.writeheader()
                self._new = False
            for row in rows:
                writer.writerow(row)
                count += 1
        return count


def write_counter_csv(path: str | Path, counter: Mapping[Any, int], *,
                      key_name: str = "key", count_name: str = "count") -> None:
    """Write a counter mapping as a two-column CSV, sorted by key."""
    sink = CsvSink(path, [key_name, count_name])
    sink.write_rows(
        {key_name: k, count_name: v} for k, v in sorted(counter.items())
    )
