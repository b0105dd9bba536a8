"""Memory pools and allocation statistics.

Reference: cpp/src/arrow/memory_pool.h:109 (`MemoryPool` with
bytes_allocated/max_memory/num_allocations stats; LoggingMemoryPool
:184, ProxyMemoryPool :218) and pyarrow's `total_allocated_bytes`.

TPU-native split: device memory is owned by XLA (its BFC allocator is
the jemalloc analogue — exposed read-only via ``device_memory_stats``),
while host Buffers register with a python-side pool. Every
``arrow_tpu.Buffer`` reports its backing bytes to the default pool on
creation and un-reports on garbage collection, so ``bytes_allocated``
is the live footprint, ``max_memory`` the high-water mark.
"""

from __future__ import annotations

import os
import threading
import weakref
from typing import Optional


class MemoryPool:
    """Tracked host allocator (memory_pool.h:109 stats contract)."""

    def __init__(self, backend_name: str = "system"):
        self._lock = threading.Lock()
        self._bytes = 0
        self._max = 0
        self._num_allocs = 0
        self._backend = backend_name

    # -- explicit allocation API -----------------------------------------
    def allocate(self, size: int):
        """Allocate a mutable Buffer of ``size`` zeroed bytes."""
        import numpy as np

        from .buffer import Buffer
        self._record_alloc(size)
        buf = Buffer(np.zeros(size, dtype=np.uint8))
        # Buffer.__init__ already recorded it against the default pool;
        # avoid double counting when self IS the default pool.
        if _default_pool is self:
            self._record_free(size)
        weakref.finalize(buf, self._record_free, size)
        return buf

    # -- passive tracking --------------------------------------------------
    def _record_alloc(self, nbytes: int) -> None:
        with self._lock:
            self._bytes += nbytes
            self._num_allocs += 1
            if self._bytes > self._max:
                self._max = self._bytes

    def _record_free(self, nbytes: int) -> None:
        with self._lock:
            self._bytes -= nbytes

    # -- stats --------------------------------------------------------------
    def bytes_allocated(self) -> int:
        return self._bytes

    def max_memory(self) -> int:
        return self._max

    def num_allocations(self) -> int:
        return self._num_allocs

    @property
    def backend_name(self) -> str:
        return self._backend

    def release_unused(self) -> None:
        """memory_pool.h ReleaseUnused — python/numpy frees eagerly."""

    def __repr__(self):
        return (f"<MemoryPool {self._backend} allocated={self._bytes} "
                f"max={self._max} allocs={self._num_allocs}>")


class ProxyMemoryPool(MemoryPool):
    """Forwards to a parent pool while keeping its own stats
    (memory_pool.h:218)."""

    def __init__(self, parent: MemoryPool):
        super().__init__(f"proxy[{parent.backend_name}]")
        self.parent = parent

    def _record_alloc(self, nbytes: int) -> None:
        super()._record_alloc(nbytes)
        self.parent._record_alloc(nbytes)

    def _record_free(self, nbytes: int) -> None:
        super()._record_free(nbytes)
        self.parent._record_free(nbytes)


class LoggingMemoryPool(MemoryPool):
    """Prints every allocation (memory_pool.h:184)."""

    def __init__(self, parent: Optional[MemoryPool] = None, sink=None):
        parent = parent or default_memory_pool()
        super().__init__(f"logging[{parent.backend_name}]")
        self.parent = parent
        import sys
        self._sink = sink or sys.stderr

    def _record_alloc(self, nbytes: int) -> None:
        print(f"Allocate: size = {nbytes}", file=self._sink)
        super()._record_alloc(nbytes)
        self.parent._record_alloc(nbytes)

    def _record_free(self, nbytes: int) -> None:
        print(f"Free: size = {nbytes}", file=self._sink)
        super()._record_free(nbytes)
        self.parent._record_free(nbytes)


class CappedMemoryPool(MemoryPool):
    """Raises when live bytes would exceed the cap."""

    def __init__(self, cap: int, parent: Optional[MemoryPool] = None):
        parent = parent or default_memory_pool()
        super().__init__(f"capped[{parent.backend_name}]")
        self.cap = int(cap)
        self.parent = parent

    def allocate(self, size: int):
        if self._bytes + size > self.cap:
            raise MemoryError(
                f"allocation of {size} bytes exceeds pool cap "
                f"{self.cap} (live: {self._bytes})")
        return super().allocate(size)

    def _record_alloc(self, nbytes: int) -> None:
        super()._record_alloc(nbytes)
        self.parent._record_alloc(nbytes)

    def _record_free(self, nbytes: int) -> None:
        super()._record_free(nbytes)
        self.parent._record_free(nbytes)


_default_pool = MemoryPool(
    os.environ.get("ARROW_DEFAULT_MEMORY_POOL", "system"))


def default_memory_pool() -> MemoryPool:
    return _default_pool


def system_memory_pool() -> MemoryPool:
    return _default_pool


def total_allocated_bytes() -> int:
    """Live host bytes held by arrow_tpu Buffers
    (pyarrow.total_allocated_bytes analogue)."""
    return _default_pool.bytes_allocated()


def supported_memory_backends():
    return ["system"]


def device_memory_stats(device=None) -> dict:
    """XLA device allocator stats (bytes_in_use, peak_bytes_in_use, ...).
    The device-side analogue of MemoryPool stats; XLA's allocator plays
    the jemalloc role from memory_pool_jemalloc.cc."""
    import jax
    dev = device or jax.devices()[0]
    stats = dev.memory_stats()
    return dict(stats) if stats else {}


def log_memory_allocations(enable: bool = True) -> None:
    """Swap the default pool for a logging wrapper (pyarrow API shim)."""
    global _default_pool
    if enable and not isinstance(_default_pool, LoggingMemoryPool):
        _default_pool = LoggingMemoryPool(_default_pool)
    elif not enable and isinstance(_default_pool, LoggingMemoryPool):
        _default_pool = _default_pool.parent


_live_roots = set()
_roots_lock = threading.Lock()


def _register_root(root) -> None:
    """Register an owning ndarray with the default pool exactly once;
    the pool is decremented when numpy frees the array."""
    key = id(root)
    with _roots_lock:
        if key in _live_roots:
            return
        _live_roots.add(key)
    nbytes = root.nbytes
    _default_pool._record_alloc(nbytes)

    def _gone(k=key, n=nbytes):
        with _roots_lock:
            _live_roots.discard(k)
        _default_pool._record_free(n)

    weakref.finalize(root, _gone)
