"""Validity-bitmap utilities.

Arrow layout packs validity LSB-first (bit i of byte i//8), reference:
cpp/src/arrow/util/bit_util.h. On host we use numpy's little-endian bit
packing; on device we use byte masks (see arrow_tpu.device) and convert at
the boundary.
"""

from __future__ import annotations

import numpy as np


def pack_bits(mask: np.ndarray) -> np.ndarray:
    """bool[n] -> uint8[ceil(n/8)], LSB-first."""
    return np.packbits(np.asarray(mask, dtype=np.bool_), bitorder="little")


def unpack_bits(bitmap: np.ndarray, length: int, offset: int = 0) -> np.ndarray:
    """uint8[] -> bool[length], starting at bit ``offset``."""
    bits = np.unpackbits(np.asarray(bitmap, dtype=np.uint8),
                         bitorder="little")
    return bits[offset:offset + length].astype(np.bool_)


def count_set_bits(bitmap: np.ndarray, length: int, offset: int = 0) -> int:
    if length == 0:
        return 0
    return int(unpack_bits(bitmap, length, offset).sum())


def bytes_for_bits(n: int) -> int:
    return (n + 7) // 8
