"""Host-side parallel mapping and native-thread budget control.

Reference parity (``utils/parallel.py:158 process_map``, ``:88-155`` thread
budgets): analysis stages fan out across player counts with a bounded
process pool; ``n_jobs=1`` runs serially in-process (but still exercises the
same code path, which keeps worker logic unit-testable). Device occupancy is
XLA's job — these budgets only govern host-side NumPy/Arrow threading.
"""

from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor
from typing import Callable, Iterable, Sequence, TypeVar

T = TypeVar("T")
R = TypeVar("R")

_NATIVE_THREAD_ENV = (
    "OMP_NUM_THREADS",
    "MKL_NUM_THREADS",
    "OPENBLAS_NUM_THREADS",
    "NUMEXPR_NUM_THREADS",
)


def apply_native_thread_limits(n_threads: int) -> dict[str, str | None]:
    """Cap native BLAS/OMP threads; returns prior values for restoration."""
    if n_threads < 1:
        raise ValueError("n_threads must be positive")
    previous: dict[str, str | None] = {}
    for name in _NATIVE_THREAD_ENV:
        previous[name] = os.environ.get(name)
        os.environ[name] = str(n_threads)
    return previous


def restore_native_thread_limits(previous: dict[str, str | None]) -> None:
    for name, value in previous.items():
        if value is None:
            os.environ.pop(name, None)
        else:
            os.environ[name] = value


def process_map(
    fn: Callable[[T], R],
    items: Sequence[T] | Iterable[T],
    *,
    n_jobs: int | None = None,
    initializer: Callable[[], None] | None = None,
) -> list[R]:
    """Map ``fn`` over ``items`` with an optional process pool.

    ``n_jobs in (None, 0, 1)`` runs serially in-process but still calls the
    initializer, so worker-state code paths stay testable without a pool
    (reference ``utils/parallel.py:172-179`` behavior).
    """
    items = list(items)
    if not items:
        return []
    if n_jobs is None or n_jobs <= 1:
        if initializer is not None:
            initializer()
        return [fn(item) for item in items]
    with ProcessPoolExecutor(
        max_workers=min(n_jobs, len(items)), initializer=initializer
    ) as pool:
        return list(pool.map(fn, items))
