"""Test configuration: virtual 8-device CPU mesh + float64.

Mirrors the reference's strategy of running every test under
``mpiexec -np 4`` on one host (reference: tests/CMakeLists.txt:16-23);
here the "4 ranks" are XLA host-platform virtual devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NO persistent compilation cache on CPU: XLA:CPU segfaults
# (de)serializing very large executables on some hosts (see CLAUDE.md);
# elementalx/__init__ likewise skips cache setup when JAX_PLATFORMS=cpu.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_executables_per_module():
    """XLA:CPU keeps every jitted executable mmap-ed; a full-suite run
    accumulates >60k VMAs and hits vm.max_map_count (~65530 default),
    at which point the compiler SEGFAULTS on a failed mmap (observed
    deterministically around test ~506 in tests/test_fuzz.py; ~41k maps
    at 70% of the suite). Dropping the jit caches after every module
    bounds live executables to one module's worth."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def grid():
    """Default 4x2 grid over the 8 virtual devices."""
    from elementalx import Grid

    return Grid(height=4)


@pytest.fixture(scope="session")
def square_grid():
    """2x2 grid over 4 of the devices (for Cannon etc.)."""
    from elementalx import Grid

    return Grid(devices=jax.devices()[:4], height=2)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
