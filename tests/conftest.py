"""Test harness config.

Tests run on CPU with 8 virtual devices (the standard JAX fake-backend trick,
SURVEY.md SS5.5) so the multi-chip sharding paths get real coverage without a
v5e-8 slice, and so results are deterministic across hosts.  TPU-hardware
numbers are produced by bench.py, not pytest.

IMPORTANT: env vars must be set before jax initializes a backend, hence the
module-level os.environ mutation here (conftest imports before any test).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon/TPU: tests are CPU-only
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon boot hook (sitecustomize) force-sets jax_platforms="axon,cpu" via
# jax.config at interpreter start, overriding the env var -- undo it before
# any backend initializes so tests really run on the 8-device CPU backend.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from tpuao.params import GoldenAOParams, GoldenCameraParams  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy shape/param fuzz sweeps and full-resolution golden "
        "regressions, excluded from the default smoke tier (run with "
        "--slow or -m 'slow or not slow')")


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="run the full suite including @pytest.mark.slow tests")


def pytest_collection_modifyitems(config, items):
    """Default run = smoke tier (<~3 min on the 1-CPU bench host);
    ``--slow`` (or an explicit ``-m`` expression) runs everything
    (VERDICT r3 item 5: the full suite had grown past 20 min and every
    round paid it)."""
    if config.getoption("--slow") or config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --slow to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _bound_compiled_program_memory(request):
    """Clear compiled-program caches between modules in ``--slow`` runs.

    One pytest process compiling the full fuzz tier accumulates every
    executable ever built (JAX global caches + tpuao's memoized
    builders): measured >7 GB RSS by test ~300, after which XLA's CPU
    backend segfaults inside backend_compile_and_load (r5 — passes in
    isolation and in every <100-test subset; pure accumulation).
    Per-module clearing bounds the working set; cross-module recompiles
    are cheap on CPU.  Smoke runs skip it — they stay small enough.
    """
    yield
    if request.config.getoption("--slow"):
        from tpuao.utils.caches import clear_program_caches

        clear_program_caches()


@pytest.fixture
def camera():
    return GoldenCameraParams(depth_mode="linear")


@pytest.fixture
def hw_camera():
    return GoldenCameraParams(depth_mode="hardware", reversed_z=True)


@pytest.fixture
def params():
    return GoldenAOParams()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
