"""Host-side parallel mapping and native-thread budget control.

Reference parity (``utils/parallel.py:158 process_map``, ``:88-155`` thread
budgets): analysis stages fan out across player counts with a bounded
process pool; ``n_jobs=1`` runs serially in-process (but still exercises the
same code path, which keeps worker logic unit-testable). Device occupancy is
XLA's job — these budgets only govern host-side NumPy/Arrow threading.
"""

from __future__ import annotations

import contextlib
import multiprocessing as mp
import os
import threading
from concurrent.futures import ProcessPoolExecutor
from dataclasses import dataclass
from typing import Callable, Iterable, Iterator, Sequence, TypeVar

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
    mp_start_method: str | None = None,
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
        max_workers=min(n_jobs, len(items)),
        initializer=initializer,
        mp_context=resolve_mp_context(mp_start_method),
    ) as pool:
        return list(pool.map(fn, items))


def resolve_mp_context(method: str | None) -> mp.context.BaseContext:
    """Resolve an explicit multiprocessing start method, or the platform
    default (reference ``utils/parallel.py:48``). Invalid names raise with
    the valid choices listed."""
    if method is None:
        return mp.get_context()
    valid = mp.get_all_start_methods()
    if method not in valid:
        raise ValueError(f"mp start method {method!r} not in {valid}")
    return mp.get_context(method)


# ── stage parallel policy & nesting governance ─────────────────────────────
#
# Stages nest (a per-k pool inside a per-root pool inside the pipeline): the
# inner stage must not multiply the outer stage's workers. A thread-local
# nesting depth makes inner stages resolve to serial execution with native
# threads capped at 1 (reference utils/parallel.py:39 ParallelNestingContext,
# :88-155 resolve_stage_parallel_policy/apply_native_thread_limits).

_nesting = threading.local()


def _nesting_depth() -> int:
    return getattr(_nesting, "depth", 0)


@dataclass(frozen=True)
class StageParallelPolicy:
    """Resolved worker and native-thread budget for one stage invocation."""

    stage: str
    workers: int
    native_threads: int
    nested: bool


def resolve_stage_parallel_policy(
    stage: str, *, n_jobs: int | None, item_count: int | None = None
) -> StageParallelPolicy:
    """Budget a stage: nested stages run serially with 1 native thread;
    top-level stages get ``n_jobs`` workers (capped at the item count) and an
    even share of the host CPUs for native threads."""
    nested = _nesting_depth() > 0
    workers = 1 if nested else max(1, int(n_jobs or 1))
    if item_count is not None:
        workers = min(workers, max(1, item_count))
    cpus = os.cpu_count() or 1
    native = 1 if nested or workers > 1 else max(1, cpus // max(1, workers))
    return StageParallelPolicy(
        stage=stage, workers=workers, native_threads=native, nested=nested
    )


@contextlib.contextmanager
def stage_parallel_context(policy: StageParallelPolicy) -> Iterator[StageParallelPolicy]:
    """Enter a stage's parallel region: bumps the nesting depth and applies
    its native-thread caps, restoring both on exit."""
    previous = apply_native_thread_limits(policy.native_threads)
    _nesting.depth = _nesting_depth() + 1
    try:
        yield policy
    finally:
        _nesting.depth = _nesting_depth() - 1
        restore_native_thread_limits(previous)
