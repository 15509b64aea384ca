"""Test configuration: force an 8-virtual-device CPU backend so sharding /
multi-chip code paths are exercised without TPU hardware, per the project's
test strategy (SURVEY.md §4). Must run before any test module imports jax.

Note: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var,
so the platform is forced through jax.config instead.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# HYSLAM_TEST_PLATFORM=tpu runs the suite on the real chip (the canonical
# backend for the end-to-end proofs); default stays the 8-virtual-device
# CPU mesh so sharding paths are exercised.
_platform = os.environ.get("HYSLAM_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform if _platform != "tpu" else ""

import jax  # noqa: E402

if _platform != "tpu":
    jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_compiler_state():
    """Clear JAX's compilation caches after every test module. A full-suite
    run compiles hundreds of distinct executables on the 8-virtual-device
    CPU backend; letting that state accumulate ends with a segfault inside
    XLA's backend_compile (observed at ~98% of the suite). Per-module
    clearing bounds it; modules rarely share jit signatures anyway."""
    yield
    import jax as _jax

    _jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long end-to-end runs (the rendered-circuit "
        "system proof); included by default, deselect with -m 'not slow'")
