"""LZ4 frame format over the native block codec.

Reference analogue: cpp/src/arrow/util/compression_lz4.cc
(Lz4FrameCodec — Arrow IPC's BodyCompression LZ4_FRAME). The env ships no
lz4 library, so blocks are coded by native.cpp (lz4_block_*) and this
module provides the frame layer (magic, descriptor + xxhash32 header
checksum, block framing, end mark).
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

_MAGIC = 0x184D2204
_XP1, _XP2, _XP3, _XP4, _XP5 = (2654435761, 2246822519, 3266489917,
                                668265263, 374761393)
_M32 = 0xFFFFFFFF


def _rotl32(x, r):
    return ((x << r) | (x >> (32 - r))) & _M32


def xxhash32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _XP1 + _XP2) & _M32
        v2 = (seed + _XP2) & _M32
        v3 = seed & _M32
        v4 = (seed - _XP1) & _M32
        while i + 16 <= n:
            for j in range(4):
                lane = struct.unpack_from("<I", data, i + 4 * j)[0]
                v = (v1, v2, v3, v4)[j]
                v = (v + lane * _XP2) & _M32
                v = (_rotl32(v, 13) * _XP1) & _M32
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 16
        h = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) +
             _rotl32(v4, 18)) & _M32
    else:
        h = (seed + _XP5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        lane = struct.unpack_from("<I", data, i)[0]
        h = (h + lane * _XP3) & _M32
        h = (_rotl32(h, 17) * _XP4) & _M32
        i += 4
    while i < n:
        h = (h + data[i] * _XP5) & _M32
        h = (_rotl32(h, 11) * _XP1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _XP2) & _M32
    h ^= h >> 13
    h = (h * _XP3) & _M32
    h ^= h >> 16
    return h


_BLOCK_MAX = 4 * 1024 * 1024  # BD 0x70


def compress(data: bytes) -> bytes:
    """LZ4 frame encode (block-independent, no checksums beyond HC)."""
    from ..native import get_lib
    import ctypes
    lib = get_lib()
    if lib is None:
        raise NotImplementedError("native lz4 unavailable")
    flg, bd = 0x60, 0x70
    desc = bytes([flg, bd])
    hc = (xxhash32(desc) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", _MAGIC) + desc + bytes([hc]))
    i = 0
    while i < len(data) or (i == 0 and len(data) == 0):
        chunk = data[i:i + _BLOCK_MAX]
        i += len(chunk)
        if not chunk:
            break
        src = np.frombuffer(chunk, np.uint8)
        buf = np.empty(len(chunk) + len(chunk) // 8 + 64, np.uint8)
        n = lib.lz4_block_compress(src.ctypes.data_as(ctypes.c_void_p),
                                   len(src),
                                   buf.ctypes.data_as(ctypes.c_void_p))
        if n < len(chunk):
            out += struct.pack("<I", n)
            out += buf[:n].tobytes()
        else:  # incompressible: store raw with high bit
            out += struct.pack("<I", len(chunk) | 0x80000000)
            out += chunk
    out += struct.pack("<I", 0)  # end mark
    return bytes(out)


def decompress(data: bytes,
               expected_size: Optional[int] = None) -> bytes:
    from ..native import get_lib
    import ctypes
    lib = get_lib()
    if lib is None:
        raise NotImplementedError("native lz4 unavailable")
    if len(data) < 7 or struct.unpack_from("<I", data)[0] != _MAGIC:
        raise ValueError("not an lz4 frame")
    flg = data[4]
    pos = 6  # FLG + BD
    if flg & 0x08:       # content size
        pos += 8
    if flg & 0x01:       # dict id
        pos += 4
    pos += 1             # HC
    block_checksum = bool(flg & 0x10)
    out = bytearray()
    while pos + 4 <= len(data):
        (size,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if size == 0:
            break
        raw = bool(size & 0x80000000)
        size &= 0x7FFFFFFF
        chunk = data[pos:pos + size]
        pos += size
        if block_checksum:
            pos += 4
        if raw:
            out += chunk
        else:
            # block-linked frames (FLG B.Indep unset) reference up to
            # 64 KiB of the previous blocks' output
            hist = bytes(out[-65536:]) if not (flg & 0x20) else b""
            cap = len(hist) + _BLOCK_MAX + size * 4
            src = np.frombuffer(chunk, np.uint8)
            buf = np.empty(cap, np.uint8)
            if hist:
                buf[:len(hist)] = np.frombuffer(hist, np.uint8)
            n = lib.lz4_block_decompress_hist(
                src.ctypes.data_as(ctypes.c_void_p), len(src),
                buf.ctypes.data_as(ctypes.c_void_p), cap, len(hist))
            if n < 0:
                raise ValueError("malformed lz4 block")
            out += buf[len(hist):len(hist) + n].tobytes()
    return bytes(out)
