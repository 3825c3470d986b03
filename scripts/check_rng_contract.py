#!/usr/bin/env python
"""AST linter enforcing the coordinate-RNG contract in production code.

Reference parity (``/root/reference/scripts/check_rng_contract.py``): forbids

* importing/using the stdlib ``random`` module,
* ``numpy.random.default_rng`` / bare ``np.random.<dist>`` calls,
* Python ``hash()`` (PYTHONHASHSEED-dependent),
* ``jax.random.PRNGKey`` (ad-hoc roots outside the coordinate scheme)

anywhere under ``farkle_ii_tpu/`` except the designated RNG modules. Every
random stream must be derived from semantic coordinates (ops/rng.py).
Exit code 0 = clean.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

PACKAGE = Path(__file__).resolve().parent.parent / "farkle_ii_tpu"

# modules allowed to touch raw generator constructors
ALLOWED = {
    PACKAGE / "ops" / "rng.py",
    PACKAGE / "ops" / "threefry.py",
}


class Violation(Exception):
    pass


def check_file(path: Path) -> list[str]:
    tree = ast.parse(path.read_text(encoding="utf-8"))
    problems: list[str] = []

    def record(node: ast.AST, message: str) -> None:
        problems.append(f"{path.relative_to(PACKAGE.parent)}:{node.lineno}: {message}")

    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name == "random":
                    record(node, "stdlib random module is forbidden")
        elif isinstance(node, ast.ImportFrom):
            if node.module == "random":
                record(node, "stdlib random module is forbidden")
        elif isinstance(node, ast.Call):
            func = node.func
            dotted = ""
            while isinstance(func, ast.Attribute):
                dotted = f".{func.attr}{dotted}"
                func = func.value
            if isinstance(func, ast.Name):
                dotted = func.id + dotted
            if dotted.endswith("default_rng") and path not in ALLOWED:
                record(node, "np.random.default_rng is forbidden in production code")
            if dotted.endswith("random.PRNGKey") and path not in ALLOWED:
                record(node, "ad-hoc jax PRNGKey roots are forbidden")
            if isinstance(node.func, ast.Name) and node.func.id == "hash":
                record(node, "builtin hash() is PYTHONHASHSEED-dependent")
    return problems


def main() -> int:
    problems: list[str] = []
    for path in sorted(PACKAGE.rglob("*.py")):
        problems.extend(check_file(path))
    for p in problems:
        print(p)
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
