"""Host IO streams and codecs (reference: cpp/src/arrow/io/interfaces.h,
io/memory.h:145 BufferReader, io/file.h:148 MemoryMappedFile,
util/compression.h Codec).

Python file objects are the native stream currency of this engine (the
readers accept any binary file object), so these classes are thin,
pyarrow-shaped adapters over io/mmap plus the codec registry used by
IPC/Parquet/ORC.
"""

from __future__ import annotations

import io as _io
import mmap as _mmap
import os
from typing import Optional, Union

import numpy as np

from .buffer import Buffer, as_buffer
from .errors import ArrowInvalid


class BufferReader(_io.BytesIO):
    """Zero-copy-ish reader over a Buffer/bytes (io/memory.h:145)."""

    def __init__(self, obj):
        if isinstance(obj, Buffer):
            data = obj.to_numpy().tobytes()
        else:
            data = bytes(obj)
        super().__init__(data)
        self._size = len(data)

    def size(self) -> int:
        return self._size

    def read_buffer(self, nbytes: Optional[int] = None) -> Buffer:
        return Buffer(self.read(nbytes if nbytes is not None else -1))


class BufferOutputStream(_io.BytesIO):
    """Writable in-memory stream; ``getvalue()``/``finish()`` -> Buffer
    (io/memory.h BufferOutputStream)."""

    def finish(self) -> Buffer:
        return Buffer(super().getvalue())


class MockOutputStream:
    """Counts bytes without storing them (io/memory.h MockOutputStream);
    used to pre-compute serialized sizes."""

    def __init__(self):
        self._n = 0

    def write(self, b) -> int:
        self._n += len(b)
        return len(b)

    def size(self) -> int:
        return self._n

    def tell(self) -> int:
        return self._n


def OSFile(path: str, mode: str = "rb"):
    """Open an OS-level file (pyarrow.OSFile)."""
    if "b" not in mode:
        mode += "b"
    return open(path, mode)


class MemoryMappedFile:
    """mmap-backed random-access file (io/file.h:148)."""

    def __init__(self, path: str, mode: str = "r"):
        access = _mmap.ACCESS_READ if mode == "r" else _mmap.ACCESS_WRITE
        self._f = open(path, "rb" if mode == "r" else "r+b")
        self._mm = _mmap.mmap(self._f.fileno(), 0, access=access)

    @classmethod
    def create(cls, path: str, size: int) -> "MemoryMappedFile":
        with open(path, "wb") as f:
            f.truncate(size)
        return cls(path, "r+")

    def read(self, n: int = -1) -> bytes:
        return self._mm.read(n)

    def read_buffer(self, nbytes: Optional[int] = None) -> Buffer:
        data = self._mm.read(nbytes if nbytes is not None else -1)
        return Buffer(np.frombuffer(data, np.uint8))

    def seek(self, pos: int, whence: int = 0) -> int:
        self._mm.seek(pos, whence)
        return self._mm.tell()

    def tell(self) -> int:
        return self._mm.tell()

    def write(self, data) -> int:
        return self._mm.write(bytes(data))

    def size(self) -> int:
        return len(self._mm)

    def close(self) -> None:
        self._mm.close()
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def memory_map(path: str, mode: str = "r") -> MemoryMappedFile:
    return MemoryMappedFile(path, mode)


def create_memory_map(path: str, size: int) -> MemoryMappedFile:
    return MemoryMappedFile.create(path, size)


def py_buffer(obj) -> Buffer:
    """Wrap a python buffer-protocol object (pyarrow.py_buffer)."""
    return as_buffer(obj)


def foreign_buffer(address: int, size: int, base=None) -> Buffer:
    """Wrap memory at a raw address (pyarrow.foreign_buffer)."""
    import ctypes
    raw = (ctypes.c_ubyte * size).from_address(address)
    arr = np.frombuffer(raw, np.uint8)
    buf = Buffer(arr)
    buf._base = base  # keep owner alive
    return buf


def input_stream(source, compression: Optional[str] = None):
    """pyarrow.input_stream: path/bytes/Buffer/file-object -> reader."""
    if isinstance(source, (bytes, bytearray, memoryview, Buffer)):
        stream = BufferReader(source)
    elif isinstance(source, (str, os.PathLike)):
        path = os.fspath(source)
        if compression is None and path.endswith(".gz"):
            compression = "gzip"
        stream = open(path, "rb")
    else:
        stream = source
    if compression in (None, "none"):
        return stream
    return _io.BytesIO(Codec(compression).decompress(stream.read()))


def output_stream(where, compression: Optional[str] = None):
    """pyarrow.output_stream: path/file-object -> writer."""
    if isinstance(where, (str, os.PathLike)):
        raw = open(os.fspath(where), "wb")
    else:
        raw = where
    if compression in (None, "none"):
        return raw
    return _CompressSink(raw, compression)


class _CompressSink:
    def __init__(self, raw, compression: str):
        self._raw = raw
        self._codec = Codec(compression)
        self._buf = bytearray()

    def write(self, b) -> int:
        self._buf += b
        return len(b)

    def close(self) -> None:
        self._raw.write(self._codec.compress(bytes(self._buf)))
        self._raw.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


CompressedInputStream = input_stream
CompressedOutputStream = output_stream


class Codec:
    """Compression codec registry (util/compression.h). Backends:
    zstd/gzip/snappy (native C++)/lz4 frame (native C++)/bz2/brotli
    (system libbrotli via ctypes)."""

    def __init__(self, compression: str, compression_level=None):
        self.name = compression.lower()
        self.compression_level = compression_level
        if self.name not in ("zstd", "gzip", "snappy", "lz4",
                             "lz4_frame", "bz2", "brotli"):
            raise ArrowInvalid(
                f"unsupported codec {compression!r} "
                "(zstd/gzip/snappy/lz4/bz2/brotli available)")
        if self.name == "brotli":
            from .utils import brotli_ctypes
            if not brotli_ctypes.available():
                raise ArrowInvalid("brotli: libbrotli not available")

    @staticmethod
    def is_available(compression: str) -> bool:
        try:
            Codec(compression)
            return True
        except ArrowInvalid:
            return False

    def compress(self, data) -> bytes:
        data = bytes(data)
        if self.name == "zstd":
            import zstandard
            lvl = self.compression_level or 3
            return zstandard.ZstdCompressor(level=lvl).compress(data)
        if self.name == "gzip":
            import gzip
            return gzip.compress(data,
                                 compresslevel=self.compression_level or 9)
        if self.name == "snappy":
            from .native import snappy_compress
            out = snappy_compress(data)
            if out is None:
                raise ArrowInvalid("native snappy unavailable")
            return out
        if self.name == "bz2":
            import bz2
            return bz2.compress(data, self.compression_level or 9)
        if self.name == "brotli":
            from .utils import brotli_ctypes
            return brotli_ctypes.compress(
                data, quality=self.compression_level or 8)
        from .utils import lz4frame
        return lz4frame.compress(data)

    def decompress(self, data, decompressed_size=None) -> bytes:
        data = bytes(data)
        if self.name == "zstd":
            import zstandard
            return zstandard.ZstdDecompressor().decompress(
                data, max_output_size=decompressed_size or (1 << 30))
        if self.name == "gzip":
            import gzip
            return gzip.decompress(data)
        if self.name == "snappy":
            from .native import snappy_decompress
            out = snappy_decompress(data, decompressed_size or (1 << 30))
            if out is None:
                raise ArrowInvalid("native snappy unavailable")
            return out
        if self.name == "bz2":
            import bz2
            return bz2.decompress(data)
        if self.name == "brotli":
            from .utils import brotli_ctypes
            return brotli_ctypes.decompress(data, decompressed_size)
        from .utils import lz4frame
        return lz4frame.decompress(data)


def compress(buf, codec: str = "lz4", asbytes: bool = False,
             memory_pool=None):
    out = Codec(codec).compress(
        buf.to_numpy().tobytes() if isinstance(buf, Buffer) else buf)
    return out if asbytes else Buffer(out)


def decompress(buf, decompressed_size=None, codec: str = "lz4",
               asbytes: bool = False, memory_pool=None):
    out = Codec(codec).decompress(
        buf.to_numpy().tobytes() if isinstance(buf, Buffer) else buf,
        decompressed_size)
    return out if asbytes else Buffer(out)


class NativeFile:
    """Base file-object marker (pyarrow.NativeFile). Our streams are
    plain python file objects; this exists for isinstance checks."""


class PythonFile(NativeFile):
    """Wraps a python file object (pyarrow.PythonFile)."""

    def __init__(self, handle, mode=None):
        self._h = handle
        self.mode = mode or getattr(handle, "mode", "rb")

    def __getattr__(self, name):
        return getattr(self._h, name)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self._h.close()


class BufferedInputStream(PythonFile):
    """Read-buffered stream (io/buffered.h BufferedInputStream)."""

    def __init__(self, stream, buffer_size: int = 65536,
                 memory_pool=None):
        import io as _io
        raw = stream._h if isinstance(stream, PythonFile) else stream
        try:
            buffered = _io.BufferedReader(raw, buffer_size)
        except (TypeError, AttributeError):
            buffered = raw
        super().__init__(buffered, "rb")


class BufferedOutputStream(PythonFile):
    """Write-buffered stream (io/buffered.h BufferedOutputStream)."""

    def __init__(self, stream, buffer_size: int = 65536,
                 memory_pool=None):
        import io as _io
        raw = stream._h if isinstance(stream, PythonFile) else stream
        try:
            buffered = _io.BufferedWriter(raw, buffer_size)
        except (TypeError, AttributeError):
            buffered = raw
        super().__init__(buffered, "wb")


class FixedSizeBufferWriter(PythonFile):
    """Writes into a preallocated buffer (io/memory.h
    FixedSizeBufferWriter)."""

    def __init__(self, buffer):
        import io as _io
        self.buffer = buffer
        super().__init__(_io.BytesIO(), "wb")
        self._written = 0

    def write(self, data):
        data = bytes(data)
        arr = self.buffer.to_numpy()
        if self._written + len(data) > len(arr):
            raise ArrowInvalid("write past end of fixed-size buffer")
        arr[self._written:self._written + len(data)] = \
            np.frombuffer(data, dtype=np.uint8)
        self._written += len(data)
        return len(data)


class ResizableBuffer(Buffer):
    """Growable buffer (buffer.h:494 ResizableBuffer)."""

    def __init__(self, data=b""):
        super().__init__(bytearray(data))

    def resize(self, new_size: int, shrink_to_fit: bool = True):
        cur = self._data
        out = np.zeros(new_size, dtype=np.uint8)
        out[:min(len(cur), new_size)] = cur[:new_size]
        self._data = out


class TransformInputStream(PythonFile):
    """Applies a transform function to chunks read from a stream
    (io/transform.h TransformInputStream)."""

    def __init__(self, stream, transform):
        import io as _io
        raw = stream._h if isinstance(stream, PythonFile) else stream
        data = raw.read()
        super().__init__(_io.BytesIO(transform(data)), "rb")


def transcoding_input_stream(stream, src_encoding: str,
                             dest_encoding: str):
    """Decode/re-encode bytes between charsets (pyarrow
    transcoding_input_stream)."""
    return TransformInputStream(
        stream, lambda b: b.decode(src_encoding).encode(dest_encoding))
