"""Read-only release gates.

Reference parity (``/root/reference/src/farkle/analysis/release_audit.py``):
1. every runnable config preset must load through the strict validator;
2. retired entry points must be absent from the package;
3. every published parquet in a results tree must carry a valid sidecar.
"""

from __future__ import annotations

import importlib
import logging
from pathlib import Path

from farkle_ii_tpu.config import AppConfig, load_app_config
from farkle_ii_tpu.utils.artifacts import ArtifactValidationError, validate_sidecar

logger = logging.getLogger(__name__)

RETIRED_ENTRY_POINTS: tuple[tuple[str, str], ...] = (
    ("farkle_ii_tpu.simulation.run_tournament", "main"),
    ("farkle_ii_tpu.analysis.run_trueskill", "main"),
)


def audit_runnable_configs(config_dir: Path | str = "configs") -> list[str]:
    """Load every preset and validate the production statistical contract.

    ``blank_config.yaml`` is a scaffold, not a runnable production preset, so
    it must load but is exempt from the locked contract (reference
    release_audit.py:32 audits an explicit runnable set).
    """
    failures = []
    for path in sorted(Path(config_dir).glob("*.yaml")):
        try:
            cfg = load_app_config(path)
            if path.name != "blank_config.yaml":
                cfg.validate_statistical_contract(require_two_roots=False)
        except Exception as exc:  # noqa: BLE001 - collected for the report
            failures.append(f"{path.name}: {type(exc).__name__}: {exc}")
    return failures


def audit_retired_entry_points() -> list[str]:
    """Retired module-level CLIs must not exist."""
    failures = []
    for module_name, attr in RETIRED_ENTRY_POINTS:
        try:
            module = importlib.import_module(module_name)
        except ImportError:
            continue
        if hasattr(module, attr):
            failures.append(f"retired entry point present: {module_name}.{attr}")
    return failures


def audit_sidecar_completeness(results_root: Path) -> list[str]:
    """Every published parquet must validate against its sidecar."""
    failures = []
    for path in sorted(Path(results_root).rglob("*.parquet")):
        try:
            validate_sidecar(path)
        except ArtifactValidationError as exc:
            failures.append(f"{path}: {exc}")
    return failures


def run_release_audits(cfg: AppConfig, *, config_dir: Path | str = "configs") -> dict:
    """Run all gates; raise if any fails."""
    failures = {
        "configs": audit_runnable_configs(config_dir),
        "entry_points": audit_retired_entry_points(),
        "sidecars": (
            audit_sidecar_completeness(cfg.results_root)
            if cfg.results_root.exists()
            else []
        ),
    }
    total = sum(len(v) for v in failures.values())
    if total:
        raise RuntimeError(f"release audits failed ({total} findings): {failures}")
    return failures
