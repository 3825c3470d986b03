"""Render the probed per-k kernel table (markdown) from the envelope artifact.

Usage: python scripts/envelope_table.py [results/fault_envelope.json]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "results/fault_envelope.json"
    data = json.loads(open(path).read())

    by_k: dict[int, dict[int, dict]] = defaultdict(dict)
    for p in data.get("probes", []):
        if p.get("compact") is True:
            by_k[p["k"]][p["ns"]] = p

    nss = sorted({ns for shapes in by_k.values() for ns in shapes})
    header = "| k | " + " | ".join(f"ns={ns}" for ns in nss) + " | best |"
    sep = "|---" * (len(nss) + 2) + "|"
    print(header)
    print(sep)
    for k in sorted(by_k):
        cells = []
        best = (0.0, None)
        for ns in nss:
            p = by_k[k].get(ns)
            if p is None:
                cells.append("—")
            elif not p["ok"]:
                cells.append("FAULT")
            elif p.get("games_per_sec"):
                gps = p["games_per_sec"]
                cells.append(f"{gps / 1e3:,.0f}k")
                if gps > best[0]:
                    best = (gps, ns)
            else:
                cells.append("ok")
        b = f"{best[0] / 1e3:,.0f}k @ ns={best[1]}" if best[1] else "—"
        print(f"| {k} | " + " | ".join(cells) + f" | {b} |")

    groups = [p for p in data.get("block_group_probes", []) if p.get("ok")]
    if groups:
        print()
        print("| k | m×nsb | family | games/s |")
        print("|---|---|---|---|")
        for p in sorted(
            groups, key=lambda p: (p["k"], p["m"], p.get("family") or "scan")
        ):
            gps = p.get("games_per_sec")
            print(
                f"| {p['k']} | {p['m']}×{p['nsb']} | "
                f"{p.get('family') or 'scan'} | "
                + (f"{gps / 1e3:,.0f}k" if gps else "ok")
                + " |"
            )

    h2h = [p for p in data.get("h2h_probes", []) if p.get("ok")]
    if h2h:
        print()
        print("| H2H batch | games/s |")
        print("|---|---|")
        for p in sorted(h2h, key=lambda p: p["h2h_batch"]):
            gps = p.get("games_per_sec")
            print(
                f"| {p['h2h_batch']:,} | "
                + (f"{gps / 1e3:,.0f}k" if gps else "ok")
                + " |"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
