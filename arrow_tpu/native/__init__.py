"""Native (C++) host-side kernels, loaded via ctypes.

Builds lazily with g++ on first import if the shared library is missing;
every entry point has a numpy fallback so the engine works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "native.cpp")
_SO = os.path.join(_DIR, "libarrow_tpu_native.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.dict_encode_binary.restype = ctypes.c_void_p
        lib.dict_encode_binary.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64]
        lib.dict_encode_n_unique.restype = ctypes.c_int64
        lib.dict_encode_n_unique.argtypes = [ctypes.c_void_p]
        lib.dict_encode_uniq_bytes.restype = ctypes.c_int64
        lib.dict_encode_uniq_bytes.argtypes = [ctypes.c_void_p]
        lib.dict_encode_fill.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p]
        lib.dict_encode_free.argtypes = [ctypes.c_void_p]
        lib.pack_bits.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_void_p]
        lib.unpack_bits.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_void_p]
        lib.count_set_bits.restype = ctypes.c_int64
        lib.count_set_bits.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.c_int64]
        lib.rle_decode.restype = ctypes.c_int64
        lib.rle_decode.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_int32, ctypes.c_void_p]
        lib.rle_encode.restype = ctypes.c_int64
        lib.rle_encode.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_int32, ctypes.c_void_p]
        lib.snappy_decompress.restype = ctypes.c_int64
        lib.snappy_decompress.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                          ctypes.c_void_p, ctypes.c_int64]
        lib.snappy_compress.restype = ctypes.c_int64
        lib.snappy_compress.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                        ctypes.c_void_p]
        lib.lz4_block_decompress.restype = ctypes.c_int64
        lib.lz4_block_decompress.argtypes = [ctypes.c_void_p,
                                             ctypes.c_int64,
                                             ctypes.c_void_p,
                                             ctypes.c_int64]
        lib.lz4_block_decompress_hist.restype = ctypes.c_int64
        lib.lz4_block_decompress_hist.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64]
        lib.lz4_block_compress.restype = ctypes.c_int64
        lib.lz4_block_compress.argtypes = [ctypes.c_void_p,
                                           ctypes.c_int64,
                                           ctypes.c_void_p]
        _lib = lib
        return _lib


def dict_encode_binary(data: np.ndarray, offsets: np.ndarray,
                       valid: Optional[np.ndarray]
                       ) -> Optional[Tuple[np.ndarray, np.ndarray,
                                           np.ndarray]]:
    """(codes int32[n], uniq_offsets int32[u+1], uniq_bytes uint8[...]) in
    first-appearance order, or None when the native library is
    unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(offsets) - 1
    data = np.ascontiguousarray(data, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    vptr = None
    if valid is not None:
        valid = np.ascontiguousarray(valid, dtype=np.uint8)
        vptr = valid.ctypes.data_as(ctypes.c_void_p)
    handle = lib.dict_encode_binary(
        data.ctypes.data_as(ctypes.c_void_p),
        offsets.ctypes.data_as(ctypes.c_void_p), vptr, n)
    try:
        u = lib.dict_encode_n_unique(handle)
        nbytes = lib.dict_encode_uniq_bytes(handle)
        codes = np.empty(n, dtype=np.int32)
        uoffs = np.empty(u + 1, dtype=np.int32)
        ubytes = np.empty(max(nbytes, 1), dtype=np.uint8)
        lib.dict_encode_fill(
            handle, codes.ctypes.data_as(ctypes.c_void_p),
            uoffs.ctypes.data_as(ctypes.c_void_p),
            ubytes.ctypes.data_as(ctypes.c_void_p))
        return codes, uoffs, ubytes[:nbytes]
    finally:
        lib.dict_encode_free(handle)


def count_set_bits(bitmap: np.ndarray, n: int, offset: int = 0
                   ) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    bitmap = np.ascontiguousarray(bitmap, dtype=np.uint8)
    return int(lib.count_set_bits(
        bitmap.ctypes.data_as(ctypes.c_void_p), n, offset))


def rle_decode_native(data: bytes, pos: int, num_values: int,
                      bit_width: int) -> Optional[np.ndarray]:
    """Hybrid RLE/bit-packed decode (util/rle_encoding_internal.h
    analogue); None if the native library is unavailable or the stream
    overruns."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(num_values, dtype=np.int64)
    consumed = lib.rle_decode(
        buf.ctypes.data_as(ctypes.c_void_p), len(buf), pos, num_values,
        bit_width, out.ctypes.data_as(ctypes.c_void_p))
    if consumed < 0:
        raise ValueError("RLE stream truncated")
    return out


def rle_encode_native(values: np.ndarray,
                      bit_width: int) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    values = np.ascontiguousarray(values, dtype=np.int64)
    cap = len(values) * 8 + 64
    out = np.empty(cap, dtype=np.uint8)
    n = lib.rle_encode(values.ctypes.data_as(ctypes.c_void_p),
                       len(values), bit_width,
                       out.ctypes.data_as(ctypes.c_void_p))
    return out[:n].tobytes()


def snappy_decompress(data: bytes, out_size: int) -> Optional[bytes]:
    """Raw-snappy decode (util/compression_snappy.cc analogue); None if
    native lib unavailable; raises on malformed input."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    out = np.empty(max(out_size, 1), np.uint8)
    n = lib.snappy_decompress(src.ctypes.data_as(ctypes.c_void_p),
                              len(src),
                              out.ctypes.data_as(ctypes.c_void_p),
                              out_size)
    if n < 0:
        raise ValueError("malformed snappy data")
    return out[:n].tobytes()


def snappy_compress(data: bytes) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8) if data else         np.empty(0, np.uint8)
    out = np.empty(len(data) + len(data) // 4 + 64, np.uint8)
    n = lib.snappy_compress(
        src.ctypes.data_as(ctypes.c_void_p) if len(src) else None,
        len(src), out.ctypes.data_as(ctypes.c_void_p))
    return out[:n].tobytes()
