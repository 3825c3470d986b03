"""StageRunner post-action completion validation (reference stage_runner.py:151-179)."""

from pathlib import Path

import pytest

from farkle_ii_tpu import config as C
from farkle_ii_tpu.analysis.stage_registry import StageDefinition
from farkle_ii_tpu.analysis.stage_runner import (
    StageExecutionError,
    StageRunner,
)
from farkle_ii_tpu.config import STAGE_CACHE_SCOPES, compute_stage_config_sha
from farkle_ii_tpu.utils.stage_completion import write_stage_done


@pytest.fixture()
def cfg(tmp_path):
    cfg = C.AppConfig()
    cfg.data_dir = str(tmp_path)
    return C.assign_config_sha(cfg)


def _stage(key, run, stamps):
    return StageDefinition(key=key, group="test", run=run, stamps=stamps)


def test_stage_publishing_nothing_fails_loudly(cfg, tmp_path, monkeypatch):
    monkeypatch.setitem(STAGE_CACHE_SCOPES, "phantom", ("sim",))
    stage_dir = Path(cfg.results_root) / "phantom"

    phantom = _stage(
        "phantom", lambda c, force=False: None,  # "succeeds", writes nothing
        lambda c: [(stage_dir, "phantom")],
    )
    with pytest.raises(StageExecutionError, match="did not re-resolve valid"):
        StageRunner(cfg, (phantom,)).run()


def test_stage_with_valid_stamp_passes(cfg, monkeypatch):
    monkeypatch.setitem(STAGE_CACHE_SCOPES, "real", ("sim",))
    stage_dir = Path(cfg.results_root) / "real"
    out = stage_dir / "out.json"

    def run(c, force=False):
        stage_dir.mkdir(parents=True, exist_ok=True)
        out.write_text("{}")
        write_stage_done(
            stage_dir, "real", outputs=[out],
            config_sha=compute_stage_config_sha(c, "real"),
            freshness_key=c.freshness_key(),
        )

    real = _stage("real", run, lambda c: [(stage_dir, "real")])
    result = StageRunner(cfg, (real,)).run()
    assert result.ran == ["real"]


def test_tampered_output_fails_validation(cfg, monkeypatch):
    monkeypatch.setitem(STAGE_CACHE_SCOPES, "tamper", ("sim",))
    stage_dir = Path(cfg.results_root) / "tamper"
    out = stage_dir / "out.json"

    def run(c, force=False):
        stage_dir.mkdir(parents=True, exist_ok=True)
        out.write_text("{}")
        write_stage_done(
            stage_dir, "tamper", outputs=[out],
            config_sha=compute_stage_config_sha(c, "tamper"),
            freshness_key=c.freshness_key(),
        )
        out.write_text('{"tampered": true}')  # drift after stamping

    tamper = _stage("tamper", run, lambda c: [(stage_dir, "tamper")])
    with pytest.raises(StageExecutionError, match="did not re-resolve valid"):
        StageRunner(cfg, (tamper,)).run()
