"""Multi-host execution: `jax.distributed` bootstrap + block partitioning.

The reference's only distribution mechanism is a single-node process pool
over a shared filesystem (``/root/reference/src/farkle/utils/parallel.py:158``).
The TPU-native multi-host analogue keeps the same two planes:

* **compute plane**: each host owns a disjoint, deterministic subset of the
  workload plan's batch blocks (``batch_id % host_count == host_index``) and
  plays them on its local devices (optionally mesh-sharded across its chips
  over ICI);
* **data plane**: the existing per-block exact-aggregate artifacts on the
  shared filesystem. Block aggregates are associative integer sums, so the
  finalizing host absorbs every peer's published blocks in any order and
  produces bit-identical totals — cross-host traffic rides the artifact
  plane (DCN / shared FS), never the step loop.

Host identity resolves from ``FARKLE_HOST_INDEX``/``FARKLE_HOST_COUNT`` env
overrides (tests, external launchers) or the `jax.distributed` runtime.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def initialize_from_env() -> bool:
    """Initialize `jax.distributed` when a coordinator is configured.

    Reads the standard JAX coordination env (``JAX_COORDINATOR_ADDRESS`` or
    ``COORDINATOR_ADDRESS``); a no-op (returns False) otherwise, so
    single-host runs never pay the import.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not addr:
        return False
    import jax

    jax.distributed.initialize()
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local devices",
        jax.process_index(), jax.process_count(), jax.local_device_count(),
    )
    return True


def host_partition() -> tuple[int, int]:
    """``(host_index, host_count)`` for deterministic block ownership."""
    count = os.environ.get("FARKLE_HOST_COUNT")
    if count:
        return int(os.environ.get("FARKLE_HOST_INDEX", "0")), int(count)
    import jax

    try:
        return jax.process_index(), jax.process_count()
    except Exception:  # uninitialized runtime
        return 0, 1


def owns_block(batch_id: int, host_index: int, host_count: int) -> bool:
    return batch_id % host_count == host_index
