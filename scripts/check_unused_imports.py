"""AST lint: no unused imports in production code.

The environment has no installable lint toolchain, so this stands in for
ruff's F401 over ``farkle_ii_tpu/`` (the reference runs ruff in `make ci`).
``from __future__`` imports and explicit re-export files are exempt.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def unused_imports(path: Path) -> list[str]:
    tree = ast.parse(path.read_text())
    imported: dict[str, int] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                imported[(a.asname or a.name).split(".")[0]] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name != "*":
                    imported[a.asname or a.name] = node.lineno
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Constant) and isinstance(node.value, str):
            used.add(node.value)  # __all__ entries and doctest mentions
    return [
        f"{path.relative_to(ROOT)}:{line}: unused import {name!r}"
        for name, line in sorted(imported.items(), key=lambda kv: kv[1])
        if name not in used
    ]


def main() -> int:
    problems: list[str] = []
    for f in sorted((ROOT / "farkle_ii_tpu").rglob("*.py")):
        problems += unused_imports(f)
    if problems:
        print("\n".join(problems))
        return 1
    print("no unused imports")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
