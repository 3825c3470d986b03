#!/usr/bin/env python
"""Terminology linter: ban ambiguous statistical wording in deliverables.

Reference parity (``/root/reference/scripts/check_terminology.py`` +
``docs/terminology.md``): user-facing modules may not use the ambiguous
"significant/significance" family without qualification (statistical claims
must name the procedure — "Holm-significant", "practically dominant") and
may not claim "proved"/"proof" for Monte-Carlo evidence. Exit code 0 = clean.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

PACKAGE = Path(__file__).resolve().parent.parent / "farkle_ii_tpu"

# modules that render user-facing claims
CHECKED = [
    PACKAGE / "analysis" / "structure_reporting.py",
    PACKAGE / "analysis" / "structure_agreement.py",
    PACKAGE / "analysis" / "screening.py",
]

BANNED = [
    (re.compile(r"(?<![\w-])significan(t|ce)", re.IGNORECASE),
     "unqualified 'significant': name the procedure (e.g. Holm-adjusted)"),
    (re.compile(r"(?<![\w-])prove[sdn]?(?![\w-])", re.IGNORECASE),
     "'prove' overstates Monte-Carlo evidence"),
]

ALLOWED_CONTEXT = re.compile(r"holm|statistical(ly)?[ _-]", re.IGNORECASE)


def main() -> int:
    problems = []
    for path in CHECKED:
        for lineno, line in enumerate(path.read_text().splitlines(), start=1):
            for pattern, reason in BANNED:
                match = pattern.search(line)
                if not match:
                    continue
                prefix = line[max(0, match.start() - 24) : match.start()]
                if ALLOWED_CONTEXT.search(prefix):
                    continue
                problems.append(
                    f"{path.relative_to(PACKAGE.parent)}:{lineno}: {reason}"
                )
    for p in problems:
        print(p)
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
