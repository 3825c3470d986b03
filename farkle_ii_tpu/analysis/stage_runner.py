"""Generic stage-plan executor with manifest events and failure summary.

Reference parity (``/root/reference/src/farkle/analysis/stage_runner.py``):
runs an ordered stage plan; per stage it emits manifest start/end events,
invokes the action, and records errors; ``continue_on_error`` collects a
failure summary instead of aborting at the first broken stage. Stage actions
are themselves idempotent under their completion stamps, so re-running a plan
only replays stale or missing work.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field

from farkle_ii_tpu.analysis.stage_registry import (
    H2H_TAIL_STAGES,
    ROOT_STAGES,
    StageDefinition,
    validate_plan,
)
from farkle_ii_tpu.config import AppConfig
from farkle_ii_tpu.utils import manifest as mf

logger = logging.getLogger(__name__)


class StageExecutionError(RuntimeError):
    """One or more stages failed."""


class StageValidationError(RuntimeError):
    """A stage returned successfully but did not publish valid outputs.

    Reference parity: required-output existence checks + post-action
    completion-stamp re-resolution (stage_runner.py:151-179) — without this
    a stage that silently publishes nothing would pass and downstream
    stages would read stale or missing artifacts.
    """


def _validate_stage_completion(cfg: AppConfig, stage: StageDefinition) -> None:
    from farkle_ii_tpu.config import compute_stage_config_sha
    from farkle_ii_tpu.utils.stage_completion import StageState, resolve_stage_state

    coords = stage.stamps(cfg)
    if not coords:
        return
    sha = compute_stage_config_sha(cfg, stage.sha_scope or stage.key)
    ok_states = {StageState.COMPLETE_VALID}
    bad: list[str] = []
    for stamp_dir, name in coords:
        state = resolve_stage_state(
            stamp_dir, name, config_sha=sha, freshness_key=cfg.freshness_key()
        )
        if state not in ok_states:
            bad.append(f"{name} in {stamp_dir} resolved {state}")
    if bad:
        raise StageValidationError(
            f"stage {stage.key!r} ran without error but its completion "
            f"stamps did not re-resolve valid: {'; '.join(bad)}"
        )


@dataclass
class StageRunResult:
    ran: list[str] = field(default_factory=list)
    skipped: list[str] = field(default_factory=list)
    failures: dict[str, str] = field(default_factory=dict)
    durations: dict[str, float] = field(default_factory=dict)


class StageRunner:
    def __init__(
        self,
        cfg: AppConfig,
        stages: tuple[StageDefinition, ...],
        *,
        continue_on_error: bool = False,
    ) -> None:
        validate_plan(stages)
        self.cfg = cfg
        self.stages = stages
        self.continue_on_error = continue_on_error

    def run(self, *, force: bool = False) -> StageRunResult:
        result = StageRunResult()
        run_id = mf.new_run_id()
        manifest = self.cfg.manifest_path()
        sha = self.cfg.config_sha or ""
        mf.append_manifest_event(
            manifest, "analysis_run_start", run_id=run_id, config_sha=sha,
            stages=[s.key for s in self.stages],
        )
        aborted_after: str | None = None
        for stage in self.stages:
            if stage.disabled(self.cfg):
                result.skipped.append(stage.key)
                continue
            failed_deps = [d for d in stage.depends_on if d in result.failures]
            if failed_deps:
                result.failures[stage.key] = f"dependency failed: {failed_deps}"
                continue
            mf.append_manifest_event(
                manifest, "stage_start", run_id=run_id, config_sha=sha, stage=stage.key
            )
            start = time.perf_counter()
            try:
                stage.run(self.cfg, force=force)
                _validate_stage_completion(self.cfg, stage)
            except Exception as exc:  # noqa: BLE001 - summarized and re-raised
                result.failures[stage.key] = f"{type(exc).__name__}: {exc}"
                mf.append_manifest_event(
                    manifest, "stage_end", run_id=run_id, config_sha=sha,
                    stage=stage.key, status="error", error=str(exc),
                )
                logger.exception("stage %s failed", stage.key)
                if not self.continue_on_error:
                    aborted_after = stage.key
                    break
                continue
            duration = time.perf_counter() - start
            result.ran.append(stage.key)
            result.durations[stage.key] = duration
            mf.append_manifest_event(
                manifest, "stage_end", run_id=run_id, config_sha=sha,
                stage=stage.key, status="ok", duration_seconds=duration,
            )
        mf.append_manifest_event(
            manifest, "analysis_run_end", run_id=run_id, config_sha=sha,
            status="error" if result.failures else "ok",
            failures=result.failures,
        )
        if result.failures:
            summary = "; ".join(f"{k}: {v}" for k, v in result.failures.items())
            raise StageExecutionError(
                f"analysis stages failed (aborted after {aborted_after}): {summary}"
                if aborted_after
                else f"analysis stages failed: {summary}"
            )
        return result


def build_root_stage_plan() -> tuple[StageDefinition, ...]:
    return ROOT_STAGES


def build_single_root_h2h_tail_plan() -> tuple[StageDefinition, ...]:
    return ROOT_STAGES + H2H_TAIL_STAGES


def run_all(cfg: AppConfig, *, force: bool = False) -> StageRunResult:
    """Full single-root pipeline: root stages + H2H tail."""
    return StageRunner(cfg, build_single_root_h2h_tail_plan()).run(force=force)
