"""Host memory buffers.

Reference analogue: cpp/src/arrow/buffer.h:52 (``Buffer``). On host, a
Buffer is a thin immutable view over contiguous bytes (numpy uint8). Device
residency is handled separately by arrow_tpu.device; there is no CUDA-style
device buffer here because JAX owns device memory.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np


class Buffer:
    __slots__ = ("_data", "__weakref__")

    def __init__(self, data: Union[bytes, bytearray, memoryview, np.ndarray]):
        if isinstance(data, np.ndarray):
            arr = np.ascontiguousarray(data).view(np.uint8).reshape(-1)
        else:
            arr = np.frombuffer(bytes(data) if isinstance(data, bytearray)
                                else data, dtype=np.uint8)
        self._data = arr
        # Pool accounting: the OWNING root array is the pool allocation;
        # views/slices of it, and memory borrowed from python bytes
        # objects, are Buffer::Wrap-style borrows the reference pool
        # doesn't count either (memory_pool.h:109). Each root is
        # registered once and un-registered when numpy frees it.
        root = arr
        while isinstance(root.base, np.ndarray):
            root = root.base
        if root.base is None and root.flags.owndata:
            from .memory import _register_root
            _register_root(root)

    @property
    def size(self) -> int:
        return self._data.size

    def __len__(self) -> int:
        return self._data.size

    def to_numpy(self) -> np.ndarray:
        return self._data

    def view(self, dtype) -> np.ndarray:
        return self._data.view(dtype)

    def to_pybytes(self) -> bytes:
        return self._data.tobytes()

    def slice(self, offset: int, length: Optional[int] = None) -> "Buffer":
        end = self.size if length is None else offset + length
        return Buffer(self._data[offset:end])

    def equals(self, other: "Buffer") -> bool:
        return (self.size == other.size
                and bool(np.array_equal(self._data, other._data)))

    def __repr__(self) -> str:
        return f"Buffer({self.size} bytes)"


def as_buffer(obj) -> Buffer:
    if isinstance(obj, Buffer):
        return obj
    return Buffer(obj)


def allocate_buffer(nbytes: int) -> Buffer:
    return Buffer(np.zeros(nbytes, dtype=np.uint8))


def _buf_address(self) -> int:
    return self._data.ctypes.data


def _buf_hex(self) -> bytes:
    return self.to_pybytes().hex().encode()


Buffer.address = property(_buf_address)
Buffer.hex = _buf_hex
Buffer.is_cpu = property(lambda self: True)
Buffer.is_mutable = property(lambda self: self._data.flags.writeable)
Buffer.parent = property(lambda self: None)


def _buf_device(self):
    from .device import Device
    return Device()


def _buf_device_type(self):
    from .device import DeviceAllocationType
    return DeviceAllocationType.CPU


def _buf_memory_manager(self):
    from .device import default_cpu_memory_manager
    return default_cpu_memory_manager()


Buffer.device = property(_buf_device)
Buffer.device_type = property(_buf_device_type)
Buffer.memory_manager = property(_buf_memory_manager)
