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

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
