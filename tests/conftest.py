"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors the reference's approach of exercising multi-process code paths
serially in-process (reference tests run `process_map` with n_jobs=1); here we
exercise multi-chip sharding logic on virtual CPU devices
(`--xla_force_host_platform_device_count=8`) so tests never occupy the real
TPU. Note: this environment registers an `axon` TPU backend from
sitecustomize and pins `JAX_PLATFORMS=axon`, so the env var alone is not
enough — we must override the jax config after import, before any backend
initialization.
"""

import os

import pytest

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

# optional sys.monitoring line-coverage gate (FARKLE_COV_THRESHOLD=NN)
pytest_plugins = ["tests.covgate_plugin"]


def pytest_addoption(parser):
    parser.addoption(
        "--update-goldens", action="store_true", default=False,
        help="rewrite golden files from current outputs instead of comparing",
    )


@pytest.fixture()
def golden(request):
    """Golden-file comparator (reference tests/helpers/golden_utils.py analogue).

    Usage: ``golden("name", payload_dict)`` — compares against
    tests/data/golden/<name>.json, or rewrites it under --update-goldens.
    """
    import json
    from pathlib import Path

    update = request.config.getoption("--update-goldens")
    root = Path(__file__).parent / "data" / "golden"

    def check(name: str, payload):
        path = root / f"{name}.json"
        text = json.dumps(payload, indent=2, sort_keys=True)
        if update or not path.exists():
            path.parent.mkdir(parents=True, exist_ok=True)
            path.write_text(text)
            if update:
                return
            raise AssertionError(
                f"golden {name} did not exist; wrote it — rerun to compare"
            )
        expected = json.loads(path.read_text())
        assert payload == expected, f"golden {name} mismatch (see {path})"

    return check
