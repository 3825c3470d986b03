"""Line-coverage gate on stdlib ``sys.monitoring`` (PEP 669, Python 3.12).

The reference enforces a 90% coverage gate through coverage.py
(``/root/reference/pyproject.toml`` [tool.coverage.report], ``Makefile
COV_THRESHOLD=90``). This image has no coverage tooling, so the gate is
implemented directly on the interpreter's monitoring API: every LINE event
in a ``farkle_ii_tpu`` source file records the line once and then returns
``DISABLE`` for that exact code location, so steady-state overhead is near
zero (each line traps exactly once per code object).

Activation: set ``FARKLE_COV_THRESHOLD`` (e.g. ``85``) in the environment;
the plugin is loaded unconditionally from ``conftest.py`` but does nothing
without the variable. On session finish it writes ``results/coverage.json``
at the repo root and fails the run (exit status 1 via a pytest error) if
total line coverage is below the threshold.

The denominator is the set of executable lines obtained by compiling each
package source and walking ``co_lines()`` of every nested code object —
the same universe CPython reports to monitoring, so numerator and
denominator can never disagree about what counts as a line.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import pytest

_PACKAGE_DIR = Path(__file__).resolve().parent.parent / "farkle_ii_tpu"
_TOOL_ID = sys.monitoring.COVERAGE_ID

_EXCLUDED_PARTS = ("__pycache__",)


def _executable_lines(path: Path) -> set[int]:
    """All line numbers CPython can emit LINE events for in this file."""
    try:
        code = compile(path.read_text(encoding="utf-8"), str(path), "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [code]
    while stack:
        co = stack.pop()
        lines.update(ln for _, _, ln in co.co_lines() if ln is not None)
        stack.extend(c for c in co.co_consts if hasattr(c, "co_lines"))
    return lines


class _CoverageGate:
    def __init__(self, threshold: float) -> None:
        self.threshold = threshold
        self.hits: dict[str, set[int]] = {}
        self._prefix = str(_PACKAGE_DIR) + os.sep

    def start(self) -> None:
        sys.monitoring.use_tool_id(_TOOL_ID, "farkle-covgate")
        sys.monitoring.set_events(_TOOL_ID, sys.monitoring.events.LINE)
        sys.monitoring.register_callback(
            _TOOL_ID, sys.monitoring.events.LINE, self._on_line
        )

    def _on_line(self, code, line_number):
        filename = code.co_filename
        if filename.startswith(self._prefix):
            self.hits.setdefault(filename, set()).add(line_number)
        return sys.monitoring.DISABLE

    def stop_and_report(self) -> dict:
        sys.monitoring.register_callback(_TOOL_ID, sys.monitoring.events.LINE, None)
        sys.monitoring.set_events(_TOOL_ID, 0)
        sys.monitoring.free_tool_id(_TOOL_ID)

        per_file = {}
        total_lines = 0
        total_hit = 0
        for path in sorted(_PACKAGE_DIR.rglob("*.py")):
            if any(part in _EXCLUDED_PARTS for part in path.parts):
                continue
            universe = _executable_lines(path)
            if not universe:
                continue
            hit = self.hits.get(str(path), set()) & universe
            total_lines += len(universe)
            total_hit += len(hit)
            entry = {
                "lines": len(universe),
                "covered": len(hit),
                "pct": round(100.0 * len(hit) / len(universe), 1),
                "missing": sorted(universe - hit)[:80],
            }
            if os.environ.get("FARKLE_COV_DUMP"):
                entry["covered_lines"] = sorted(hit)
            per_file[str(path.relative_to(_PACKAGE_DIR))] = entry
        pct = 100.0 * total_hit / total_lines if total_lines else 0.0
        return {
            "threshold": self.threshold,
            "total_pct": round(pct, 2),
            "total_lines": total_lines,
            "covered_lines": total_hit,
            "files": per_file,
        }


def pytest_configure(config):
    raw = os.environ.get("FARKLE_COV_THRESHOLD", "")
    if not raw:
        return
    gate = _CoverageGate(float(raw))
    gate.start()
    config._farkle_covgate = gate


def pytest_sessionfinish(session, exitstatus):
    gate = getattr(session.config, "_farkle_covgate", None)
    if gate is None:
        return
    report = gate.stop_and_report()
    out = Path(
        os.environ.get("FARKLE_COV_OUT")
        or Path(__file__).resolve().parent.parent / "results" / "coverage.json"
    )
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    pct = report["total_pct"]
    sys.stderr.write(
        f"\n[covgate] farkle_ii_tpu line coverage: {pct:.2f}% "
        f"({report['covered_lines']}/{report['total_lines']} lines; "
        f"threshold {gate.threshold}%) -> {out}\n"
    )
    if pct < gate.threshold:
        session.exitstatus = pytest.ExitCode.TESTS_FAILED
        sys.stderr.write(
            f"[covgate] FAIL: coverage {pct:.2f}% is below the "
            f"{gate.threshold}% threshold\n"
        )
