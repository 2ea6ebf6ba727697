"""Test config: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (the way Spark local mode stood in for a cluster in the
reference, SURVEY.md section 4).

This container's sitecustomize registers a remote-TPU ("axon") JAX backend in
every interpreter and pins ``jax_platforms="axon,cpu"`` — tiny test kernels
would each pay a remote compile. Flip the config back to CPU *before* any
backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Every test not explicitly marked slow belongs to the quick tier, so
    `pytest -m quick` is the fast inner-loop suite."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU's JIT segfaults when a long test process keeps compiling new
    programs on top of ~100 accumulated executables (observed crashing in
    backend_compile_and_load late in the suite). Dropping compiled programs
    between modules keeps the compiler healthy at the cost of recompiles."""
    yield
    jax.clear_caches()
