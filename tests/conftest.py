"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Per the build plan, multi-chip sharding is validated on a virtual CPU mesh
(`--xla_force_host_platform_device_count=8`); the real TPU chip is reserved
for `bench.py` / `__graft_entry__.py`.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
