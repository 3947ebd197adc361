"""Test configuration: force an 8-device virtual CPU mesh.

The session environment pre-sets JAX_PLATFORMS=axon (the real TPU chip) and
pre-imports jax at interpreter startup, so mutating os.environ here is too
late for the platform choice — use jax.config instead (the backend is not
initialized until first use). XLA_FLAGS is still read at backend init, so
the virtual device count can be injected via the environment.

Tests run on the virtual CPU mesh; the real TPU chip is reserved for
`bench.py` / `__graft_entry__.py`.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# the suite is COMPILE-bound (hundreds of distinct XLA:CPU programs);
# the persistent compilation cache makes warm re-runs several times
# faster and is semantically inert (identical executables for identical
# programs — the suite's bit-identity assertions are unaffected).
# Opt out with JAX_TEST_NO_COMPILATION_CACHE=1 to time cold compiles.
if not os.environ.get("JAX_TEST_NO_COMPILATION_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jaxcomp-tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    The suite compiles hundreds of distinct XLA:CPU programs in one
    process; past a certain accumulated JIT-code volume the XLA CPU
    backend segfaults inside ``backend_compile_and_load`` on an
    otherwise-fine program (reproduced deterministically at the same
    test on two full-suite runs, while the identical test passes in
    isolation and in any half-suite subset). Executables are never
    shared across modules here (each file builds its own wrappers), so
    clearing per module only costs recompiles of the handful of shared
    design-chain programs and keeps the live-code volume far from the
    crash edge."""
    yield
    jax.clear_caches()
