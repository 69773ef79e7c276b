"""Test configuration.

Tests run on CPU with 8 virtual devices (the 'fake backend' tier the
reference never needed — SURVEY.md §4) so the multi-chip sharding path is
exercised without TPU hardware, and in float64 for reference parity.
"""
import os

# Must run before any jax *backend initialization* (a TPU plugin may already
# be registered by the interpreter's sitecustomize and JAX_PLATFORMS may point
# at it): force the CPU platform and 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (long convergence/mesh cases); the "
             "default lane skips them to stay under ~2 minutes")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running convergence/mesh test; excluded "
        "from the default lane, run with --runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_tridiag(n=3):
    """The reference's canonical test system: tridiag(-1, 2, -1)
    (/root/reference/tests/test_solvers.cpp fixtures)."""
    from basic_iterative_solvers_tpu.matrix import MatrixCSR
    dense = (2.0 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1))
    return MatrixCSR.from_dense(dense)
