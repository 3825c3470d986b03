#!/usr/bin/env python
"""Generate the human-auditable scoring truth tables under ``data/``.

Reference parity: the reference ships hand-maintained scoring CSVs
(``data/Farkle_scoring_patterns.csv`` etc.). Here the tables are *generated*
from the rules oracle so they can never drift from the implementation; they
serve as review artifacts and as fixtures for external validation.
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from farkle_ii_tpu.rules import oracle  # noqa: E402

DATA_DIR = Path(__file__).resolve().parent.parent / "data"


def counts_to_example_roll(counts) -> str:
    faces = []
    for face, count in enumerate(counts, start=1):
        faces.extend([str(face)] * count)
    return "".join(faces)


def main() -> int:
    DATA_DIR.mkdir(exist_ok=True)
    out = DATA_DIR / "scoring_patterns.csv"
    with open(out, "w", newline="", encoding="utf-8") as f:
        writer = csv.writer(f)
        writer.writerow(
            ["Example_Roll", "Number_of_Dice", "Score", "Used_Dice",
             "Reroll_Dice", "Single_Fives", "Single_Ones"]
        )
        for key in oracle.all_count_keys():
            score, used, sf, so = oracle.score_counts(key)
            n = sum(key)
            writer.writerow(
                [counts_to_example_roll(key), n, score, used, n - used, sf, so]
            )
    print(f"wrote {out} ({len(oracle.all_count_keys())} patterns)")

    summary = DATA_DIR / "farkle_probabilities.csv"
    import itertools

    with open(summary, "w", newline="", encoding="utf-8") as f:
        writer = csv.writer(f)
        writer.writerow(["Number_of_Dice", "Total_Outcomes", "Farkle_Outcomes",
                         "Farkle_Probability"])
        for d in range(1, 7):
            total = 6**d
            farkles = sum(
                1
                for roll in itertools.product(range(1, 7), repeat=d)
                if oracle.score_faces(roll)[0] == 0
            )
            writer.writerow([d, total, farkles, f"{farkles / total:.6f}"])
    print(f"wrote {summary}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
