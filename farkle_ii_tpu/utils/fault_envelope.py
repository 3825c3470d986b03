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
    # (k, ns, compact) -> measured steady-state games/s (None when the probe
    # predates speed recording)
    shape_speed: dict[tuple[int, int, bool], float] = None  # type: ignore[assignment]
    # (k, m_blocks, nsb, compact, family) -> games/s for the block-group
    # programs (one dispatch plays m whole recovery blocks). family is
    # "scan" (lax.scan of per-block batches) or "flat" (one m*nsb batch);
    # the faster one is k-dependent, so both are probed and recorded.
    block_groups: dict[tuple[int, int, int, bool, str], float] = None  # type: ignore[assignment]
    # probed 2-seat H2H dispatch batches: batch -> games/s (None speed when
    # the probe predates speed recording), plus the fault-free set
    h2h_speeds: dict[int, float] = None  # type: ignore[assignment]
    h2h_ok: frozenset[int] = frozenset()
    # probed fused attempt-window shapes (the production H2H program
    # family): (nb_blocks, window) -> games/s; flat h2h probes do NOT
    # transfer to this family (tests/FAILURE_NOTES.md)
    h2h_windows: dict[tuple[int, int], float] = None  # type: ignore[assignment]
    # probed row-export block groups (play_and_aggregate_blocks_with_rows,
    # bit-packed rows): (k, m, nsb) -> games/s. A distinct program family
    # from the aggregate-only groups — the fault boundary tracks the
    # program, so aggregate probes do not transfer to the rows path.
    rows_groups: dict[tuple[int, int, int], float] = None  # type: ignore[assignment]

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

    def best_ns(self, k: int, *, compact: bool, cap: int) -> int | None:
        """Fastest probed-fault-free chunk size (falls back to the largest).

        Round-2 review finding: probe timings used to include compile, so
        the runner could only pick the *largest* safe shape; with
        steady-state speeds recorded, pick the measured-fastest one.
        """
        timed = [
            (speed, ns)
            for (kk, ns, cc), speed in (self.shape_speed or {}).items()
            if kk == int(k) and cc == bool(compact) and ns <= int(cap)
            and speed is not None
        ]
        if timed:
            return max(timed)[1]
        return self.max_safe_ns(k, compact=compact, cap=cap)

    def chunk_speed(self, k: int, *, ns: int, compact: bool) -> float | None:
        """Measured steady-state games/s of one probed chunk shape."""
        return (self.shape_speed or {}).get((int(k), int(ns), bool(compact)))

    def best_shape(self, k: int, *, cap: int) -> tuple[int, bool] | None:
        """Fastest probed (ns, compact) chunk shape for ``k`` under ``cap``.

        Considers BOTH compaction variants: the fault boundary lives in the
        compaction path, so where a compacted shape hard-faults (round-3
        kernel at k=4/5, ns=43) the compaction-off variant of a larger
        chunk can out-run the largest safe compacted one. Falls back to the
        compacted ``best_ns`` choice when nothing is speed-probed.
        """
        timed = [
            (speed, ns, cc)
            for (kk, ns, cc), speed in (self.shape_speed or {}).items()
            if kk == int(k) and ns <= int(cap) and speed is not None
        ]
        if timed:
            speed, ns, cc = max(timed)
            return ns, cc
        ns = self.best_ns(k, compact=True, cap=cap)
        return (ns, True) if ns is not None else None

    def best_block_group(
        self,
        k: int,
        *,
        nsb: int,
        compact: bool,
        max_m: int,
        floor_speed: float | None = None,
    ) -> tuple[int, str] | None:
        """Fastest probed-safe block-group (m, family) for ``(k, nsb)``.

        Only probes with the exact per-block shuffle count transfer (the
        program batch covers m*nsb shuffles). Returns None when nothing
        matches — or when the best group probe is no faster than
        ``floor_speed`` (the per-block dispatch alternative the runner
        would otherwise use). The winning program family is k-dependent
        (measured on v5e: scan wins at k=2, flat at k=5), so the choice is
        taken over both.
        """
        timed = [
            (speed, m, fam)
            for (kk, m, bb, cc, fam), speed in (self.block_groups or {}).items()
            if kk == int(k) and bb == int(nsb) and cc == bool(compact)
            and m <= int(max_m)
        ]
        if not timed:
            return None
        speed, m, fam = max(timed)
        # deserialize-aware tie-break: the flat families inline the whole
        # m*nsb batch into the executable, and their AOT blobs measured up
        # to ~12 s slower to deserialize per cell than the scan families
        # (round-5 mega warm log) — a cost the probed steady-state games/s
        # never sees. Within 15% probed speed, prefer the scan program.
        if fam.endswith("flat"):
            scan_best = [
                (s, mm, ff) for (s, mm, ff) in timed if ff.endswith("scan")
            ]
            if scan_best:
                s2, m2, f2 = max(scan_best)
                if s2 >= 0.85 * speed:
                    speed, m, fam = s2, m2, f2
        if floor_speed is not None and speed <= floor_speed:
            return None
        return m, fam

    def best_rows_group(self, k: int, *, nsb: int, max_m: int) -> int | None:
        """Fastest probed-safe rows-group size m for ``(k, nsb)``.

        None when the rows program was never probed at this block shape —
        the runner then keeps its per-chunk row dispatch.
        """
        timed = [
            (speed, m)
            for (kk, m, bb), speed in (self.rows_groups or {}).items()
            if kk == int(k) and bb == int(nsb) and m <= int(max_m)
        ]
        if not timed:
            return None
        return max(timed)[1]

    def best_h2h_batch(self, *, cap: int | None = None) -> int | None:
        """Fastest probed-fault-free 2-seat H2H dispatch batch.

        Falls back to the largest fault-free batch when no probe recorded a
        steady-state speed; None when H2H shapes were never probed (the
        caller keeps its configured/default dispatch cap).
        """
        ok = [b for b in self.h2h_ok if cap is None or b <= int(cap)]
        if not ok:
            return None
        timed = [
            (speed, b)
            for b, speed in (self.h2h_speeds or {}).items()
            if b in ok and speed is not None
        ]
        if timed:
            return max(timed)[1]
        return max(ok)

    def best_h2h_window(self) -> tuple[int, int, float] | None:
        """Fastest probed-ok fused attempt-window shape.

        Returns ``(nb_blocks, window, games_per_sec)`` — the exact program
        family h2h execution compiles, so (unlike the flat h2h probes) the
        result bounds production dispatch without an extra safety cap.
        """
        timed = [
            (speed, nb, window)
            for (nb, window), speed in (self.h2h_windows or {}).items()
            if speed is not None
        ]
        if not timed:
            return None
        speed, nb, window = max(timed)
        return nb, window, speed


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
        shape_speed = {
            (int(pr["k"]), int(pr["ns"]), bool(pr["compact"])): float(
                pr["games_per_sec"]
            )
            for pr in data.get("probes", [])
            if pr.get("ok") and pr.get("games_per_sec")
        }
        block_groups = {
            (
                int(pr["k"]), int(pr["m"]), int(pr["nsb"]),
                bool(pr["compact"]),
                # records written before the family field are scan probes
                str(pr.get("family") or "scan"),
            ): float(pr["games_per_sec"])
            for pr in data.get("block_group_probes", [])
            if pr.get("ok") and pr.get("games_per_sec")
        }
        h2h_ok = frozenset(
            int(pr["h2h_batch"])
            for pr in data.get("h2h_probes", [])
            if pr.get("ok")
        )
        h2h_speeds = {
            int(pr["h2h_batch"]): float(pr["games_per_sec"])
            for pr in data.get("h2h_probes", [])
            if pr.get("ok") and pr.get("games_per_sec")
        }
        h2h_windows = {
            (int(pr["nb"]), int(pr["window"])): float(pr["games_per_sec"])
            for pr in data.get("h2h_window_probes", [])
            if pr.get("ok") and pr.get("games_per_sec")
        }
        rows_groups = {
            (int(pr["k"]), int(pr["m"]), int(pr["nsb"])): float(
                pr["games_per_sec"]
            )
            for pr in data.get("rows_group_probes", [])
            if pr.get("ok") and pr.get("games_per_sec")
        }
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
        shape_speed=shape_speed,
        block_groups=block_groups,
        h2h_speeds=h2h_speeds,
        h2h_ok=h2h_ok,
        h2h_windows=h2h_windows,
        rows_groups=rows_groups,
    )
