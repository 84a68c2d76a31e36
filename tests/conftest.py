"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

TPU hardware is not assumed in CI; sharding tests use
xla_force_host_platform_device_count=8 per the framework's testing
strategy (reference has no tests at all — see SURVEY.md §4).
"""
import os
import sys

# force CPU for unit tests (the ambient environment pins JAX_PLATFORMS=axon,
# the tunneled TPU; parity tests need f64 which TPU lacks)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# hard-disable the persistent compile cache: pipeline entry points
# (sweep/cli) enable it internally, and XLA:CPU cache entries are
# machine-feature-pinned AOT code whose load can SIGILL/segfault
# (observed as intermittent suite crashes in backend_compile_and_load)
os.environ["ACINOSET_JAX_CACHE"] = ""

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The ambient sitecustomize registers the tunneled TPU backend and force-sets
# jax_platforms="axon,cpu"; pin unit tests to CPU (they need f64 parity).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/data"


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables_between_modules():
    """Free JAX's compiled-executable caches after every test module.

    A full-suite run compiles 100+ large unrolled programs into one
    process; the accumulated XLA:CPU JIT code eventually segfaults the
    compiler on the next big SPMD program (observed deterministically at
    tests/test_parallel.py once the suite grew past ~95 tests, while the
    same tests pass in isolation or any half-suite grouping). Dropping
    executable references per module bounds the accumulation; modules
    still share jit caches internally, so only cross-module reuse
    recompiles.
    """
    yield
    import jax

    jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def fisheye_cam(rng):
    """A realistic GoPro-like fisheye camera."""
    K = np.array([[690.0, 0.0, 1340.0], [0.0, 689.0, 773.0], [0.0, 0.0, 1.0]])
    D = np.array([0.0431, 0.0063, -0.0072, 0.0015])
    rvec = np.array([0.1, -0.8, 0.15])
    import cv2

    R = cv2.Rodrigues(rvec)[0]
    t = np.array([[0.5], [-0.2], [3.0]])
    return K, D, R, t
