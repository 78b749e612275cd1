"""Test harness: force an 8-device virtual CPU mesh.

The reference has no fake backend for multi-device testing (SURVEY §4);
here every test runs against XLA's host platform with 8 virtual devices so
sharding/collective code paths execute for real without TPU hardware.
Must run before jax initializes, hence env vars at import time.
"""

import os

# The environment's sitecustomize may import jax and register a TPU
# platform before pytest starts, so env vars alone are too late; use
# jax.config (applied before any backend initializes) to force the
# hermetic 8-device virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent compile cache: the heavyweight suite programs (whole-run
# parity trainers, sharding tests) dominate wall-clock through XLA-CPU
# compiles — repeat runs load executables from disk instead
from lifelong_clip_tpu.utils.compile_cache import \
    enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.join(
    os.path.expanduser("~"), ".cache", "lifelong_clip_tpu", "xla-cpu"))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)
