"""Device-resident execution layer (JAX/XLA/Pallas)."""

import jax

# The engine needs 64-bit integers (keys, counts) and float64 (bit-exact
# aggregation vs the reference). XLA emulates 64-bit on TPU where needed.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: join-heavy plans re-jit per capacity
# bucket and each remote TPU compile costs 60-90 s — caching across
# processes turns repeat benchmark/plan runs from compile-bound into
# execute-bound. Opt out with ARROW_TPU_COMPILE_CACHE=off.
import os as _os  # noqa: E402

def _effective_platform_is_axon() -> bool:
    # the env var alone is NOT the truth: conftest/scripts force cpu via
    # jax.config.update("jax_platforms", "cpu") while the env still says
    # axon. XLA:CPU AOT cache entries are machine-feature specific and
    # LOAD ANYWAY on a different host ("could lead to SIGILL", observed
    # round 3) — so the cache must engage only when the effective
    # platform really is the tunneled TPU.
    if "axon" not in _os.environ.get("JAX_PLATFORMS", ""):
        return False
    try:
        cfg = jax.config.jax_platforms
    except AttributeError:  # pragma: no cover
        cfg = None
    return cfg is None or "axon" in str(cfg)


if _os.environ.get("ARROW_TPU_COMPILE_CACHE", "on") != "off" and \
        _effective_platform_is_axon():
    _cache_dir = _os.environ.get(
        "ARROW_TPU_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.dirname(_os.path.abspath(__file__)))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from .column import (  # noqa: F401,E402
    BLOCK, DeviceBatch, DeviceColumn, download_batch, download_column,
    download_table, jnp_dtype_for, round_up, upload_batch, upload_column,
    upload_table,
)


class DeviceAllocationType:
    """Device allocation kinds (reference: device.h DeviceAllocationType).
    TPU buffers surface as CPU host memory at the Arrow ABI boundary;
    device-resident data lives in DeviceBatch/DeviceColumn."""
    CPU = 1
    CUDA = 2
    CUDA_HOST = 3
    OPENCL = 4
    VULKAN = 7
    METAL = 8
    VPI = 9
    ROCM = 10
    ROCM_HOST = 11
    EXT_DEV = 12
    CUDA_MANAGED = 13
    ONEAPI = 14
    WEBGPU = 15
    HEXAGON = 16


class Device:
    """Compute device handle (reference: device.h:43). The engine's
    devices are JAX devices; this wrapper surfaces them through the
    pyarrow-shaped API."""

    def __init__(self, jax_device=None):
        self._d = jax_device

    @property
    def type_name(self) -> str:
        return getattr(self._d, "platform", "cpu")

    @property
    def device_id(self) -> int:
        return getattr(self._d, "id", 0)

    @property
    def is_cpu(self) -> bool:
        return self.type_name == "cpu"

    @property
    def device_type(self):
        return DeviceAllocationType.CPU if self.is_cpu else \
            DeviceAllocationType.EXT_DEV

    def __repr__(self):
        return f"<Device {self.type_name}:{self.device_id}>"


class MemoryManager:
    """Memory manager bound to a device (reference: device.h:179)."""

    def __init__(self, device: Device):
        self.device = device

    @property
    def is_cpu(self) -> bool:
        return self.device.is_cpu

    def __repr__(self):
        return f"<MemoryManager {self.device!r}>"


def default_cpu_memory_manager() -> MemoryManager:
    return MemoryManager(Device())
