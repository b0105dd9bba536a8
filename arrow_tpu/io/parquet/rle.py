"""RLE / bit-packed hybrid encoding (Parquet levels + dictionary indices).

Reference analogue: cpp/src/arrow/util/rle_encoding_internal.h. Decoding is
numpy-vectorized per run; encoding emits bit-packed groups for bulk data
and RLE runs for constant stretches.
"""

from __future__ import annotations


import numpy as np


def _varint_encode(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def bit_width_for(max_value: int) -> int:
    return max(int(max_value).bit_length(), 1) if max_value > 0 else 1


def decode_rle(data: bytes, pos: int, num_values: int,
               bit_width: int) -> np.ndarray:
    """Decode `num_values` values from the hybrid stream starting at pos."""
    if num_values >= 512:
        from ...native import rle_decode_native
        native = rle_decode_native(bytes(data), pos, num_values, bit_width)
        if native is not None:
            return native
    out = np.empty(num_values, dtype=np.int64)
    filled = 0
    byte_width = (bit_width + 7) // 8
    data = memoryview(data)
    while filled < num_values:
        # varint header
        header = 0
        shift = 0
        while True:
            b = data[pos]
            pos += 1
            header |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        if header & 1:  # bit-packed run
            groups = header >> 1
            n = groups * 8
            nbytes = groups * bit_width
            raw = np.frombuffer(data[pos:pos + nbytes], dtype=np.uint8)
            pos += nbytes
            bits = np.unpackbits(raw, bitorder="little")
            vals = bits.reshape(n, bit_width)
            weights = (1 << np.arange(bit_width, dtype=np.int64))
            decoded = vals.astype(np.int64) @ weights
            take = min(n, num_values - filled)
            out[filled:filled + take] = decoded[:take]
            filled += take
        else:  # rle run
            count = header >> 1
            raw = bytes(data[pos:pos + byte_width])
            pos += byte_width
            value = int.from_bytes(raw, "little")
            take = min(count, num_values - filled)
            out[filled:filled + take] = value
            filled += take
    return out


def encode_rle(values: np.ndarray, bit_width: int) -> bytes:
    """Encode with a simple strategy: long constant runs as RLE, the rest
    as bit-packed groups of 8."""
    values = np.asarray(values, dtype=np.int64)
    if len(values) >= 512:
        from ...native import rle_encode_native
        native = rle_encode_native(values, bit_width)
        if native is not None:
            return native
    n = len(values)
    out = bytearray()
    byte_width = (bit_width + 7) // 8
    i = 0
    while i < n:
        # measure the run of equal values
        v = values[i]
        j = i + 1
        while j < n and values[j] == v:
            j += 1
        run = j - i
        if run >= 8:
            out += _varint_encode(run << 1)
            out += int(v).to_bytes(byte_width, "little")
            i = j
        else:
            # bit-pack until the next long run (or end), in groups of 8
            k = i
            while k < n:
                v2 = values[k]
                m = k + 1
                while m < n and values[m] == v2:
                    m += 1
                if m - k >= 16:
                    break
                k = m
            count = k - i
            if k < n:
                # mid-stream bit-packed runs must cover a multiple of 8
                # values: borrow the pad from the following (long) run
                pad = (-count) % 8
                k += pad
                count += pad
            groups = (count + 7) // 8
            out += _varint_encode((groups << 1) | 1)
            chunk = np.zeros(groups * 8, dtype=np.int64)
            chunk[:count] = values[i:k]
            bits = ((chunk[:, None] >> np.arange(bit_width)) & 1) \
                .astype(np.uint8)
            out += np.packbits(bits.reshape(-1),
                               bitorder="little").tobytes()
            i = k
    return bytes(out)
