"""Global configuration & build/runtime info.

Reference analogues: cpp/src/arrow/config.h (GlobalOptions,
BuildInfo/RuntimeInfo, arrow::Initialize), util/config.h.cmake feature
flags, and the env-var layer of docs/source/cpp/env_vars.rst.

The engine's layered config mirrors the reference:
  1. build features    -> `build_info()` (what this install supports)
  2. environment knobs -> `env_options()` (ARROW_TPU_* + ARROW_IO_THREADS)
  3. runtime options   -> per-call FunctionOptions / ExecNodeOptions /
                          QueryOptions (compute/options.py, acero/options.py)
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, Optional

__all__ = ["BuildInfo", "RuntimeInfo", "GlobalOptions", "build_info",
           "runtime_info", "initialize", "env_options"]

_ENV_KNOBS = {
    "ARROW_TPU_MOVEMENT": "sort-based vs direct data-movement paths "
                          "(auto|sort|direct|scatter)",
    "ARROW_TPU_BLOOM": "hash-join bloom pushdown (auto|always|never)",
    "ARROW_TPU_COMPILE_CACHE": "persistent XLA compile cache (on|off)",
    "ARROW_TPU_COMPILE_CACHE_DIR": "compile cache location",
    "ARROW_TPU_FRAGMENT_READAHEAD": "dataset scan fragment readahead",
    "ARROW_IO_THREADS": "host IO thread-pool size",
    "ARROW_TPU_BENCH_SF": "benchmark scale factor",
}


@dataclass(frozen=True)
class BuildInfo:
    """Static capabilities of this install (config.h BuildInfo
    analogue)."""
    version: str
    compute_functions: int
    with_zstd: bool
    with_gzip: bool
    with_lz4: bool
    with_native: bool
    with_flight: bool
    with_tpu: bool


@dataclass(frozen=True)
class RuntimeInfo:
    """Detected runtime environment (config.h RuntimeInfo analogue; the
    SIMD-level field maps to the JAX backend platform)."""
    backend: str
    num_devices: int
    x64_enabled: bool


@dataclass
class GlobalOptions:
    """Process-wide defaults consulted by the engine (config.h
    GlobalOptions). Mutate via `initialize(options)` before heavy use."""
    io_threads: Optional[int] = None
    fragment_readahead: Optional[int] = None
    bloom_mode: Optional[str] = None       # auto|always|never
    movement_mode: Optional[str] = None    # auto|sort|direct|scatter


_GLOBAL = GlobalOptions()


def initialize(options: Optional[GlobalOptions] = None) -> None:
    """arrow::Initialize analogue: apply process-wide defaults (exports
    them through the same env knobs the rest of the engine reads)."""
    global _GLOBAL
    if options is None:
        return
    _GLOBAL = options
    if options.io_threads is not None:
        os.environ["ARROW_IO_THREADS"] = str(options.io_threads)
    if options.fragment_readahead is not None:
        os.environ["ARROW_TPU_FRAGMENT_READAHEAD"] = \
            str(options.fragment_readahead)
    if options.bloom_mode is not None:
        os.environ["ARROW_TPU_BLOOM"] = options.bloom_mode
    if options.movement_mode is not None:
        os.environ["ARROW_TPU_MOVEMENT"] = options.movement_mode


def global_options() -> GlobalOptions:
    return _GLOBAL


def build_info() -> BuildInfo:
    from . import __version__
    from .compute.registry import _REGISTRY
    try:
        import zstandard  # noqa: F401
        zstd = True
    except ImportError:
        zstd = False
    try:
        import lz4  # noqa: F401
        lz4_ok = True
    except ImportError:
        lz4_ok = False
    from .native import get_lib
    try:
        import grpc  # noqa: F401
        flight = True
    except ImportError:
        flight = False
    import jax
    return BuildInfo(
        version=__version__,
        compute_functions=len(_REGISTRY),
        with_zstd=zstd, with_gzip=True, with_lz4=lz4_ok,
        with_native=get_lib() is not None,
        with_flight=flight,
        with_tpu=any(d.platform == "tpu" for d in jax.devices())
        if os.environ.get("JAX_PLATFORMS", "") != "cpu" else False,
    )


def runtime_info() -> RuntimeInfo:
    import jax
    devs = jax.devices()
    return RuntimeInfo(backend=devs[0].platform, num_devices=len(devs),
                       x64_enabled=bool(jax.config.jax_enable_x64))


def env_options() -> Dict[str, Optional[str]]:
    """Currently-set engine environment knobs (env_vars.rst analogue)."""
    return {k: os.environ.get(k) for k in _ENV_KNOBS}
