"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors the reference's approach of exercising multi-process code paths
serially in-process (reference tests run `process_map` with n_jobs=1); here we
exercise multi-chip sharding logic on virtual CPU devices
(`--xla_force_host_platform_device_count=8`) so tests never need real TPUs.
Must run before the first `import jax` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
