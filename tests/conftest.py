"""Test configuration: force a virtual 8-device CPU mesh before jax imports.

Multi-chip sharding paths are validated on a virtual CPU mesh (SURVEY §4):
real TPU hardware in CI is a single chip, so tests must not depend on it.
"""

import os

# Force, don't setdefault: the CI environment pre-sets JAX_PLATFORMS to the
# real TPU backend, but the unit suite must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The env var alone is NOT enough: this image's sitecustomize registers an
# experimental TPU PJRT plugin at interpreter start and its register() call
# does jax.config.update("jax_platforms", "axon,cpu"), which takes precedence
# over JAX_PLATFORMS. Without the explicit config update below, the "CPU"
# suite silently compiles over the TPU tunnel (slow, single-device).
jax.config.update("jax_platforms", "cpu")

# Shared persistent compilation cache: the fast tier is compile-bound on
# small CI boxes, and parallel xdist workers otherwise compile many
# IDENTICAL programs (same kernels/shapes split across workers). The cache
# dedupes across workers within one cold run and makes re-runs much faster.
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_test_cache",
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # older jax without the knobs: compile as before
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (excluded from the fast tier)"
    )


@pytest.fixture()
def rng(request):
    # Function-scoped with a per-test seed derived from the test id: every
    # test draws the same data regardless of which other tests ran before it
    # (a session-scoped stream made test inputs order-dependent — VERDICT r2).
    import zlib

    return np.random.default_rng(zlib.adler32(request.node.nodeid.encode()))
