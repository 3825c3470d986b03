#!/usr/bin/env python
"""Release gate runner (reference scripts/check_structure_release.py parity).

Usage: python scripts/check_structure_release.py [--config CONFIG]
Exit 0 when every gate passes.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=Path, default=None)
    args = parser.parse_args()

    from farkle_ii_tpu.analysis.release_audit import run_release_audits
    from farkle_ii_tpu.config import load_app_config

    cfg = load_app_config(args.config)
    try:
        run_release_audits(cfg, config_dir=Path(__file__).resolve().parent.parent / "configs")
    except RuntimeError as exc:
        print(exc)
        return 1
    print("release audits passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
