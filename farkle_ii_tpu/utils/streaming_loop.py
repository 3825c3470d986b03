"""Producer/consumer streaming shard writer (reference utils/streaming_loop.py).

``run_streaming_shard`` writes a parquet shard atomically from an iterator of
record batches, then appends its manifest line — the publish-then-log order
that makes manifests valid redo logs. ``producer_thread``/``writer_thread``
over a ``BoundedQueue`` support pipelined device-to-disk export without
unbounded memory growth.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Any, Callable, Iterable, Iterator, Mapping

import pyarrow as pa
import pyarrow.parquet as pq

from farkle_ii_tpu.utils.artifacts import make_sidecar
from farkle_ii_tpu.utils.manifest import append_manifest_line
from farkle_ii_tpu.utils.writer import atomic_path

_SENTINEL = object()


class BoundedQueue:
    """Tiny wrapper that makes the producer/consumer contract explicit."""

    def __init__(self, maxsize: int = 8) -> None:
        self._queue: queue.Queue = queue.Queue(maxsize=maxsize)

    def put(self, item: Any) -> None:
        self._queue.put(item)

    def get(self) -> Any:
        return self._queue.get()

    def close(self) -> None:
        self._queue.put(_SENTINEL)

    def __iter__(self) -> Iterator[Any]:
        while True:
            item = self._queue.get()
            if item is _SENTINEL:
                return
            yield item


def producer_thread(fn: Callable[[BoundedQueue], None], q: BoundedQueue) -> threading.Thread:
    """Run ``fn(q)`` in a daemon thread, closing the queue when it returns."""

    def work() -> None:
        try:
            fn(q)
        finally:
            q.close()

    thread = threading.Thread(target=work, daemon=True)
    thread.start()
    return thread


def run_streaming_shard(
    *,
    out_path: str | Path,
    manifest_path: str | Path,
    schema: pa.Schema,
    batch_iter: Iterable[pa.Table],
    row_group_size: int = 64_000,
    compression: str = "zstd",
    manifest_extra: Mapping[str, Any] | None = None,
    producer: str = "streaming",
) -> int:
    """Stream batches into one shard atomically; append the manifest line."""
    out_path = Path(out_path)
    rows = 0
    with atomic_path(out_path) as tmp:
        with pq.ParquetWriter(tmp, schema, compression=compression) as writer:
            for table in batch_iter:
                table = table.cast(schema)
                writer.write_table(table, row_group_size=row_group_size)
                rows += table.num_rows
    make_sidecar(out_path, producer=producer, metadata={"n_rows": rows})
    append_manifest_line(
        manifest_path,
        {"kind": "shard", "name": out_path.name, "n_rows": rows, **dict(manifest_extra or {})},
    )
    return rows
