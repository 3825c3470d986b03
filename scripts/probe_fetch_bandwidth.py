"""Measure device->host fetch bandwidth on the attached backend.

The row-export path is fetch-bound (~264 B/game packed rows); this probe
times single-array fetches vs parallel threaded slice fetches at several
sizes to find the tunnel's real data rate and whether parallelism helps.

Usage: python scripts/probe_fetch_bandwidth.py
"""

from __future__ import annotations

import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    results = {}

    # jax Arrays cache their host copy after the first transfer, so every
    # timed fetch must hit a FRESH device array (a distinct computation).
    mk = jax.jit(
        lambda n, salt: jnp.arange(n, dtype=jnp.int32).reshape(-1, 64) + salt,
        static_argnums=(0,),
    )

    for mb in (1, 4, 16, 64):
        n = mb * 1024 * 1024 // 4
        int(np.asarray(mk(n, 0)[0, 0]))  # compile both programs
        rows = n // 64

        def fresh(salt):
            return mk(n, salt)

        # single fetch of a fresh array each round
        ts = []
        for r in range(3):
            arr = fresh(100 + r)
            t0 = time.perf_counter()
            np.asarray(arr)
            ts.append(time.perf_counter() - t0)
        single = sorted(ts)[1]

        # parallel slice fetches (4 threads over row ranges of a fresh array)
        ts = []
        with ThreadPoolExecutor(4) as pool:
            for r in range(3):
                arr = fresh(200 + r)
                slices = [
                    arr[i * rows // 4:(i + 1) * rows // 4] for i in range(4)
                ]
                t0 = time.perf_counter()
                list(pool.map(np.asarray, slices))
                ts.append(time.perf_counter() - t0)
        par4 = sorted(ts)[1]

        results[f"{mb}MB"] = {
            "single_s": round(single, 3),
            "single_MBps": round(mb / single, 1),
            "par4_s": round(par4, 3),
            "par4_MBps": round(mb / par4, 1),
        }
        print(f"{mb:3d} MB: single {mb/single:8.1f} MB/s   par4 {mb/par4:8.1f} MB/s",
              flush=True)

    out = {"platform": jax.devices()[0].platform, "results": results}
    Path("results/fetch_bandwidth.json").write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
