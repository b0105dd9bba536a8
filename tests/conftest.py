"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (SURVEY §4: the
archery-style process-pair analogue).

Note: the environment pins JAX_PLATFORMS=axon (the TPU tunnel); the env var
alone does not stick, so we also update jax.config after import."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# --- suite-scale stability -------------------------------------------------
# The full suite compiles thousands of XLA:CPU executables; at ~95% of
# the run the accumulated executables/FFI state can segfault or abort
# inside a later jit execution (observed round 3 at test_q15/test_q16
# in full-suite runs only — every half-suite bisect passes). Clearing
# jax's compilation caches between test modules bounds the accumulation
# at a small recompile cost.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    try:
        jax.clear_caches()
    except Exception:
        pass
