"""Installed-CLI smoke test (reference tests/integration/test_installed_cli.py).

The in-process CLI tests (tests/integration/test_runner.py) exercise
``cli.main()`` directly; this suite drives the OUT-of-process entry points a
user actually types: ``python -m farkle_ii_tpu`` always, and the
``farkle-tpu`` console script when the package is pip-installed in the
environment.
"""

import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[2]

_CPU_PRELUDE = (
    "import os, sys;"
    f"sys.path.insert(0, {str(REPO)!r});"
    "os.environ['JAX_PLATFORMS']='cpu';"
    "import jax; jax.config.update('jax_platforms','cpu');"
    "from farkle_ii_tpu.cli.main import main; sys.exit(main())"
)


def _run_cli(args, cwd, timeout=600):
    # force the CPU platform in-process: the env var alone does not stop
    # the axon TPU plugin from grabbing the client (tests/conftest.py)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable, "-c", _CPU_PRELUDE] + args,
        capture_output=True, text=True, timeout=timeout, cwd=cwd, env=env,
    )


def test_module_entry_help(tmp_path):
    proc = _run_cli(["--help"], tmp_path, timeout=120)
    assert proc.returncode == 0, proc.stderr
    assert "run" in proc.stdout and "analyze" in proc.stdout


@pytest.mark.slow
def test_module_entry_fast_config_run(tmp_path):
    """A real out-of-process `run` with the shipped fast preset produces the
    checkpoint artifacts and a content-authenticated done stamp."""
    cfg = REPO / "configs" / "fast_config.yaml"
    proc = _run_cli(
        ["--config", str(cfg), "--set", "data_dir=run_out",
         "--set", "sim.seed_list=[32]", "--set", "tpu.aot_cache=false", "run"],
        tmp_path,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    results = list((tmp_path / "run_out").glob("results_seed_*"))
    assert results, list((tmp_path / "run_out").iterdir())
    root = results[0]
    assert (root / "simulation.done.json").exists()
    ckpts = list(root.rglob("*p_checkpoint.parquet"))
    assert ckpts, list(root.rglob("*"))


def test_console_script_if_installed(tmp_path):
    """When the console script is on PATH (pip install), it must answer
    --help; otherwise the module entry above is the contract."""
    exe = shutil.which("farkle-tpu")
    if exe is None:
        pytest.skip("package not pip-installed; module entry covered above")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [exe, "--help"], capture_output=True, text=True, timeout=120,
        cwd=tmp_path, env=env,
    )
    assert proc.returncode == 0, proc.stderr
    assert "analyze" in proc.stdout
