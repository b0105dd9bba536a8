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

if _os.environ.get("ARROW_TPU_COMPILE_CACHE", "on") != "off" and \
        "axon" in _os.environ.get("JAX_PLATFORMS", ""):
    # (cpu runs skip the cache: XLA:CPU AOT entries are machine-feature
    # specific and a shared cache dir can trip SIGILL across hosts)
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
