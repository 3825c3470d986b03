"""Probed TPU-runtime fault envelope consumed by runners.

``scripts/probe_fault_envelope.py`` maps which (k, shuffles-per-chunk,
compaction) batch shapes execute without hard TPU-runtime faults and
publishes the survey as a JSON artifact. Runners consume that artifact via
``cfg.tpu.fault_envelope_path`` to size device chunks from measurements
instead of folklore constants (the round-1 review's exact ask).

No reference equivalent: the reference's process-pool workers
(``/root/reference/src/farkle/utils/parallel.py:158``) have no analogous
device-shape constraint.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass
from pathlib import Path

logger = logging.getLogger(__name__)

ENVELOPE_VERSION = 1


@dataclass(frozen=True)
class FaultEnvelope:
    """Set of probed-fault-free (k, ns, compact) device chunk shapes."""

    ok_shapes: frozenset[tuple[int, int, bool]]
    n_strategies: int | None
    platform: str | None
    device_kind: str | None

    def is_probed_ok(self, k: int, ns: int, compact: bool) -> bool:
        return (int(k), int(ns), bool(compact)) in self.ok_shapes

    def max_safe_ns(self, k: int, *, compact: bool, cap: int) -> int | None:
        """Largest probed-fault-free chunk size for ``k`` not exceeding ``cap``.

        Returns None when no shape for this (k, compact) was probed at all —
        the caller falls back to its configured chunk size.
        """
        candidates = [
            ns
            for (kk, ns, cc) in self.ok_shapes
            if kk == int(k) and cc == bool(compact) and ns <= int(cap)
        ]
        return max(candidates) if candidates else None


def load_fault_envelope(
    path: str | Path | None, *, n_strategies: int | None = None
) -> FaultEnvelope | None:
    """Load a probed envelope artifact; None when unset, absent, or unusable.

    When ``n_strategies`` is given and the artifact was probed with a
    different grid size, the envelope is ignored: chunk batch shapes are
    ``ns * n_strategies / k`` games, so the probe does not transfer.
    """
    if not path:
        return None
    p = Path(path)
    if not p.exists():
        logger.warning("fault envelope %s not found; ignoring", p)
        return None
    try:
        data = json.loads(p.read_text())
        shapes = frozenset(
            (int(k), int(ns), bool(c)) for k, ns, c in data["ok_shapes"]
        )
        probed_strategies = data.get("n_strategies")
    except (json.JSONDecodeError, KeyError, TypeError, ValueError) as exc:
        logger.warning("fault envelope %s unusable (%s); ignoring", p, exc)
        return None
    if (
        n_strategies is not None
        and probed_strategies is not None
        and int(probed_strategies) != int(n_strategies)
    ):
        logger.warning(
            "fault envelope %s probed at %s strategies but the run uses %s; "
            "ignoring (batch shapes do not transfer)",
            p, probed_strategies, n_strategies,
        )
        return None
    return FaultEnvelope(
        ok_shapes=shapes,
        n_strategies=probed_strategies,
        platform=data.get("platform"),
        device_kind=data.get("device_kind"),
    )
