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
        lib.csv_parse.restype = ctypes.c_void_p
        lib.csv_parse.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_uint8, ctypes.c_uint8,
                                  ctypes.c_int32, ctypes.c_int32,
                                  ctypes.c_int32]
        lib.csv_parse_sizes.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_void_p, ctypes.c_void_p]
        lib.csv_parse_fill.argtypes = [ctypes.c_void_p] + \
            [ctypes.c_void_p] * 4
        lib.csv_parse_free.argtypes = [ctypes.c_void_p]
        lib.csv_parse_nq.restype = ctypes.c_void_p
        lib.csv_parse_nq.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_uint8]
        lib.csv_parse_zc.restype = ctypes.c_void_p
        lib.csv_parse_zc.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_uint8, ctypes.c_uint8,
                                     ctypes.c_int32, ctypes.c_int32]
        lib.csv_parse_n_offsets.restype = ctypes.c_int64
        lib.csv_parse_n_offsets.argtypes = [ctypes.c_void_p]
        lib.csv_parse_int64.restype = ctypes.c_int64
        lib.csv_parse_int64.argtypes = [ctypes.c_void_p] * 4 + \
            [ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p]
        lib.csv_parse_float64.restype = ctypes.c_int64
        lib.csv_parse_float64.argtypes = [ctypes.c_void_p] * 4 + \
            [ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p]
        lib.csv_parse_int64p.restype = ctypes.c_int64
        lib.csv_parse_int64p.argtypes = [ctypes.c_void_p] * 4 + \
            [ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p]
        lib.csv_parse_float64p.restype = ctypes.c_int64
        lib.csv_parse_float64p.argtypes = [ctypes.c_void_p] * 4 + \
            [ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p]
        lib.csv_transpose_columns.restype = None
        lib.csv_transpose_columns.argtypes = [ctypes.c_void_p] * 4 + \
            [ctypes.c_int64] * 3 + [ctypes.c_void_p, ctypes.c_void_p]
        lib.csv_parse_date32.restype = ctypes.c_int64
        lib.csv_parse_date32.argtypes = [ctypes.c_void_p] * 4 + \
            [ctypes.c_int64, ctypes.c_void_p]
        lib.csv_parse_ts_micros.restype = ctypes.c_int64
        lib.csv_parse_ts_micros.argtypes = [ctypes.c_void_p] * 4 + \
            [ctypes.c_int64, ctypes.c_void_p]
        lib.csv_parse_bool.restype = ctypes.c_int64
        lib.csv_parse_bool.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p]
        lib.csv_match_tokens.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_void_p]
        lib.csv_gather_bytes.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p]
        lib.json_parse_flat.restype = ctypes.c_void_p
        lib.json_parse_flat.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.json_parse_sizes.argtypes = [ctypes.c_void_p] + \
            [ctypes.c_void_p] * 5
        lib.json_parse_fill.argtypes = [ctypes.c_void_p] + \
            [ctypes.c_void_p] * 5
        lib.json_parse_free.argtypes = [ctypes.c_void_p]
        lib.plain_decode_byte_array.restype = ctypes.c_int64
        lib.plain_decode_byte_array.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.plain_encode_byte_array.restype = ctypes.c_int64
        lib.plain_encode_byte_array.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p]
        lib.minmax_binary.restype = ctypes.c_int64
        lib.minmax_binary.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p]
        lib.csv_format_f64.restype = ctypes.c_int64
        lib.csv_format_f64.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.csv_quote_cells.restype = ctypes.c_int64
        lib.csv_quote_cells.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_uint8, ctypes.c_void_p,
            ctypes.c_void_p]
        lib.csv_interleave.restype = ctypes.c_int64
        lib.csv_interleave.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_uint8, ctypes.c_void_p]
        lib.csv_format_i64.restype = ctypes.c_int64
        lib.csv_format_i64.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.orc_rlev2_encode.restype = ctypes.c_int64
        lib.orc_rlev2_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p]
        lib.orc_rlev2_decode.restype = ctypes.c_int64
        lib.orc_rlev2_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_void_p]
        lib.pq_scan_pages.restype = ctypes.c_int64
        lib.pq_scan_pages.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p]
        lib.pq_decode_flat.restype = ctypes.c_int64
        lib.pq_decode_flat.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        _lib = lib
        return _lib


def _ptr(arr: np.ndarray) -> ctypes.c_void_p:
    return arr.ctypes.data_as(ctypes.c_void_p)


class CsvBlock:
    """Tokenized CSV block.

    Copying form (id_scale=1): offsets int64[n_fields+1] into an
    unescaped pool; field k spans offsets[k]..offsets[k+1].
    Zero-copy form (id_scale=2): pool IS the source bytes and offsets
    hold (start, end) pairs; field k spans offsets[2k]..offsets[2k+1].
    The bulk converters work on either by multiplying field ids by
    id_scale.
    """

    __slots__ = ("offsets", "pool", "quoted", "row_counts", "id_scale")

    def __init__(self, offsets, pool, quoted, row_counts, id_scale=1):
        self.offsets = offsets
        self.pool = pool
        self.quoted = quoted
        self.row_counts = row_counts
        self.id_scale = id_scale

    def field_bytes(self, fid: int) -> bytes:
        o = fid * self.id_scale
        return bytes(self.pool[int(self.offsets[o]):
                               int(self.offsets[o + 1])])


def csv_parse(data: bytes, delimiter: str, quote_char,
              doublequote: bool, escape_char,
              needs_copy: Optional[bool] = None) -> Optional[CsvBlock]:
    """Tokenize a CSV byte block (csv/parser.cc analogue); None if the
    native library is unavailable. Blocks containing no quote/escape
    byte take a zero-copy tokenizer (offsets into the source, no pool
    copy). data may be bytes or a memoryview."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8) if len(data) else \
        np.empty(0, np.uint8)
    if needs_copy is None:
        needs_copy = _block_needs_copy(data, quote_char, escape_char)
    def pairs_block(handle):
        try:
            n_offs = lib.csv_parse_n_offsets(handle)
            n_fields = ctypes.c_int64()
            n_rows = ctypes.c_int64()
            pool_bytes = ctypes.c_int64()
            lib.csv_parse_sizes(handle, ctypes.byref(n_fields),
                                ctypes.byref(n_rows),
                                ctypes.byref(pool_bytes))
            offsets = np.empty(max(n_offs, 1), np.int64)
            quoted = np.zeros(max(n_fields.value, 1), np.uint8)
            row_counts = np.empty(max(n_rows.value, 1), np.int64)
            dummy = np.empty(1, np.uint8)
            lib.csv_parse_fill(handle, _ptr(offsets), _ptr(dummy),
                               _ptr(quoted), _ptr(row_counts))
            return CsvBlock(offsets[:n_offs], src,
                            quoted[:n_fields.value],
                            row_counts[:n_rows.value], id_scale=2)
        finally:
            lib.csv_parse_free(handle)

    if not needs_copy:
        return pairs_block(lib.csv_parse_nq(
            _ptr(src) if len(src) else None, len(src), ord(delimiter)))
    # quote bytes present: optimistic ZERO-COPY quoted tokenize (quotes
    # stripped by offset arithmetic); nullptr = a field needs byte
    # rewriting (doubled quote / escape) -> copying tokenizer below
    if quote_char and not isinstance(escape_char, str):
        handle = lib.csv_parse_zc(
            _ptr(src) if len(src) else None, len(src), ord(delimiter),
            ord(quote_char), 1 if doublequote else 0, -1)
        if handle:
            return pairs_block(handle)
    use_quote = 1 if quote_char else 0
    handle = lib.csv_parse(
        _ptr(src) if len(src) else None, len(src),
        ord(delimiter), ord(quote_char) if quote_char else 0,
        use_quote, 1 if doublequote else 0,
        ord(escape_char) if isinstance(escape_char, str) else -1)
    try:
        n_fields = ctypes.c_int64()
        n_rows = ctypes.c_int64()
        pool_bytes = ctypes.c_int64()
        lib.csv_parse_sizes(handle, ctypes.byref(n_fields),
                            ctypes.byref(n_rows), ctypes.byref(pool_bytes))
        offsets = np.empty(n_fields.value + 1, np.int64)
        pool = np.empty(max(pool_bytes.value, 1), np.uint8)
        quoted = np.empty(max(n_fields.value, 1), np.uint8)
        row_counts = np.empty(max(n_rows.value, 1), np.int64)
        lib.csv_parse_fill(handle, _ptr(offsets), _ptr(pool), _ptr(quoted),
                           _ptr(row_counts))
        return CsvBlock(offsets, pool[:pool_bytes.value],
                        quoted[:n_fields.value],
                        row_counts[:n_rows.value])
    finally:
        lib.csv_parse_free(handle)


def _block_needs_copy(data, quote_char, escape_char) -> bool:
    if isinstance(data, memoryview):
        arr = np.frombuffer(data, np.uint8)
        if quote_char is not None and bool(
                (arr == ord(quote_char)).any()):
            return True
        return isinstance(escape_char, str) and bool(
            (arr == ord(escape_char)).any())
    return (quote_char is not None and
            data.find(quote_char.encode()) >= 0) or \
           (isinstance(escape_char, str) and
            data.find(escape_char.encode()) >= 0)


def csv_parse_parallel(data: bytes, delimiter: str, quote_char,
                       doublequote: bool, escape_char,
                       max_workers: int = 8) -> Optional[CsvBlock]:
    """Chunked parallel tokenize: split at newline boundaries (valid when
    newlines cannot appear inside values — the reference's parallel
    chunker makes the same assumption, csv/chunker.cc) and merge. ctypes
    releases the GIL, so chunks tokenize concurrently."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(data)
    # below ~64 MB the chunk merge (numpy concats of per-chunk offsets)
    # costs more than the parallel tokenize saves (measured round 2).
    # ARROW_TPU_CSV_PARALLEL_MIN overrides (tests exercise the merge
    # without building 64 MB fixtures).
    try:
        min_bytes = int(os.environ.get("ARROW_TPU_CSV_PARALLEL_MIN",
                                       str(1 << 26)))
    except ValueError:
        min_bytes = 1 << 26
    if n < min_bytes:
        return csv_parse(data, delimiter, quote_char, doublequote,
                         escape_char)
    ncpu = os.cpu_count() or 1
    nchunks = min(max_workers, ncpu, max(1, n >> 20))
    if nchunks <= 1:
        return csv_parse(data, delimiter, quote_char, doublequote,
                         escape_char)
    bounds = [0]
    for k in range(1, nchunks):
        target = n * k // nchunks
        cut = data.find(b"\n", max(target, bounds[-1]))
        bounds.append(n if cut < 0 else cut + 1)
    bounds.append(n)
    spans = [(bounds[k], bounds[k + 1]) for k in range(nchunks)
             if bounds[k + 1] > bounds[k]]
    if len(spans) <= 1:
        return csv_parse(data, delimiter, quote_char, doublequote,
                         escape_char)
    needs_copy = _block_needs_copy(data, quote_char, escape_char)
    mv = memoryview(data)
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=len(spans)) as ex:
        blocks = list(ex.map(
            lambda s: csv_parse(mv[s[0]:s[1]], delimiter, quote_char,
                                doublequote, escape_char,
                                needs_copy=needs_copy), spans))
    if any(b is None for b in blocks):
        return None
    quoted = np.concatenate([b.quoted for b in blocks])
    row_counts = np.concatenate([b.row_counts for b in blocks])
    if all(b.id_scale == 2 for b in blocks):
        # all chunks are zero-copy views of `data`: rebase their pair
        # offsets by chunk start; the merged pool IS the source
        offsets = np.concatenate(
            [b.offsets + s[0] for s, b in zip(spans, blocks)]) \
            if blocks else np.zeros(0, np.int64)
        return CsvBlock(offsets, np.frombuffer(data, np.uint8), quoted,
                        row_counts, id_scale=2)
    # mixed forms: normalize every chunk to (start, end) pairs over a
    # concatenated pool
    pair_offs = []
    pools = []
    bias = 0
    for b in blocks:
        if b.id_scale == 1:
            po = np.empty(2 * (len(b.offsets) - 1), np.int64)
            po[0::2] = b.offsets[:-1]
            po[1::2] = b.offsets[1:]
        else:
            po = b.offsets.astype(np.int64, copy=True)
        pair_offs.append(po + bias)
        pools.append(b.pool)
        bias += len(b.pool)
    offsets = np.concatenate(pair_offs) if pair_offs else \
        np.zeros(0, np.int64)
    return CsvBlock(offsets, np.concatenate(pools), quoted, row_counts,
                    id_scale=2)


def csv_parse_int64(block: CsvBlock, ids: np.ndarray,
                    skip: Optional[np.ndarray], strict: bool = True):
    """Bulk int64 parse of fields `ids`; returns (values, ok_mask) or
    None when any field fails to parse (or no native lib). With
    strict=False, returns (values, ok_mask, failures) regardless —
    callers resolve failures against null tokens themselves (the
    parse-first inference path)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(ids)
    ids = np.ascontiguousarray(ids, np.int64)
    if block.id_scale != 1:
        ids = ids * block.id_scale
    sptr = None
    if skip is not None:
        skip = np.ascontiguousarray(skip, np.uint8)
        sptr = _ptr(skip)
    out = np.empty(n, np.int64)
    ok = np.empty(n, np.uint8)
    if not strict:
        failures = lib.csv_parse_int64p(
            _ptr(block.pool), _ptr(block.offsets), _ptr(ids), sptr, n,
            _ptr(out), _ptr(ok))
        return out, ok, failures
    failures = lib.csv_parse_int64(_ptr(block.pool), _ptr(block.offsets),
                                   _ptr(ids), sptr, n, _ptr(out), _ptr(ok))
    if failures:
        return None
    return out, ok


def csv_parse_float64(block: CsvBlock, ids: np.ndarray,
                      skip: Optional[np.ndarray], strict: bool = True):
    lib = get_lib()
    if lib is None:
        return None
    n = len(ids)
    ids = np.ascontiguousarray(ids, np.int64)
    if block.id_scale != 1:
        ids = ids * block.id_scale
    sptr = None
    if skip is not None:
        skip = np.ascontiguousarray(skip, np.uint8)
        sptr = _ptr(skip)
    out = np.empty(n, np.float64)
    ok = np.empty(n, np.uint8)
    if not strict:
        failures = lib.csv_parse_float64p(
            _ptr(block.pool), _ptr(block.offsets), _ptr(ids), sptr, n,
            _ptr(out), _ptr(ok))
        return out, ok, failures
    failures = lib.csv_parse_float64(_ptr(block.pool), _ptr(block.offsets),
                                     _ptr(ids), sptr, n, _ptr(out),
                                     _ptr(ok))
    if failures:
        return None
    return out, ok


def csv_transpose_columns(block: CsvBlock, row_starts: np.ndarray,
                          row_counts: np.ndarray, ncols: int
                          ) -> Optional[list]:
    """One sequential pass over the field table -> per-column CsvBlocks
    (pair offsets + quoted flags, id_scale=2 with identity ids), so the
    bulk converters scan contiguously instead of column-strided."""
    lib = get_lib()
    if lib is None or ncols == 0:
        return None
    n = len(row_starts)
    row_starts = np.ascontiguousarray(row_starts, np.int64)
    row_counts = np.ascontiguousarray(row_counts, np.int64)
    out_off = np.empty((ncols, 2 * n), np.int64)
    out_q = np.empty((ncols, n), np.uint8)
    lib.csv_transpose_columns(
        _ptr(block.offsets), _ptr(block.quoted), _ptr(row_starts),
        _ptr(row_counts), n, ncols, block.id_scale,
        _ptr(out_off), _ptr(out_q))
    return [CsvBlock(out_off[j], block.pool, out_q[j], row_counts,
                     id_scale=2) for j in range(ncols)]


def csv_parse_date32(block: CsvBlock, ids: np.ndarray,
                     skip: Optional[np.ndarray]) -> Optional[np.ndarray]:
    """Bulk ISO date parse of fields `ids` -> date32 days, or None when
    any field fails (caller falls back to the python parser)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(ids)
    ids = np.ascontiguousarray(ids, np.int64)
    if block.id_scale != 1:
        ids = ids * block.id_scale
    sptr = None
    if skip is not None:
        skip = np.ascontiguousarray(skip, np.uint8)
        sptr = _ptr(skip)
    out = np.empty(n, np.int32)
    failures = lib.csv_parse_date32(_ptr(block.pool), _ptr(block.offsets),
                                    _ptr(ids), sptr, n, _ptr(out))
    if failures:
        return None
    return out


def csv_parse_ts_micros(block: CsvBlock, ids: np.ndarray,
                        skip: Optional[np.ndarray]
                        ) -> Optional[np.ndarray]:
    """Bulk ISO timestamp parse of fields `ids` -> int64 microseconds
    since epoch, or None on any failure. Tz offsets are validated then
    cancelled (wall-clock semantics, same as the python fallback; the
    reference folds offsets to UTC — divergence noted in
    docs/PARITY.md)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(ids)
    ids = np.ascontiguousarray(ids, np.int64)
    if block.id_scale != 1:
        ids = ids * block.id_scale
    sptr = None
    if skip is not None:
        skip = np.ascontiguousarray(skip, np.uint8)
        sptr = _ptr(skip)
    out = np.empty(n, np.int64)
    failures = lib.csv_parse_ts_micros(_ptr(block.pool),
                                       _ptr(block.offsets),
                                       _ptr(ids), sptr, n, _ptr(out))
    if failures:
        return None
    return out


def _token_buffers(tokens):
    toks = [t.encode() for t in tokens]
    tok_bytes = np.frombuffer(b"".join(toks) or b"\0", np.uint8)
    tok_offs = np.zeros(len(toks) + 1, np.int32)
    if toks:
        tok_offs[1:] = np.cumsum([len(t) for t in toks])
    return tok_bytes, tok_offs, len(toks)


def csv_match_tokens(block: CsvBlock, ids: np.ndarray,
                     tokens) -> Optional[np.ndarray]:
    """Byte mask: field ids[i] equals one of `tokens` (list of str)."""
    lib = get_lib()
    if lib is None:
        return None
    tok_bytes, tok_offs, m = _token_buffers(tokens)
    ids = np.ascontiguousarray(ids, np.int64)
    if block.id_scale != 1:
        ids = ids * block.id_scale
    out = np.empty(len(ids), np.uint8)
    lib.csv_match_tokens(_ptr(block.pool), _ptr(block.offsets), _ptr(ids),
                         len(ids), _ptr(tok_bytes), _ptr(tok_offs),
                         m, _ptr(out))
    return out


def csv_parse_bool(block: CsvBlock, ids: np.ndarray,
                   skip: Optional[np.ndarray], true_tokens,
                   false_tokens) -> Optional[np.ndarray]:
    """Fused bool inference: values where every non-null field is a
    true/false token, else None."""
    lib = get_lib()
    if lib is None:
        return None
    tb, to, nt = _token_buffers(true_tokens)
    fb, fo, nf = _token_buffers(false_tokens)
    ids = np.ascontiguousarray(ids, np.int64)
    if block.id_scale != 1:
        ids = ids * block.id_scale
    sptr = None
    if skip is not None:
        skip = np.ascontiguousarray(skip, np.uint8)
        sptr = _ptr(skip)
    out = np.empty(len(ids), np.uint8)
    failures = lib.csv_parse_bool(
        _ptr(block.pool), _ptr(block.offsets), _ptr(ids), sptr, len(ids),
        _ptr(tb), _ptr(to), nt, _ptr(fb), _ptr(fo), nf, _ptr(out))
    if failures:
        return None
    return out


def csv_gather_bytes(block: CsvBlock, ids: np.ndarray,
                     skip: Optional[np.ndarray] = None
                     ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Dense (offsets int64[n+1], bytes) for the given fields;
    skip[i] != 0 gathers a zero-length value."""
    lib = get_lib()
    if lib is None:
        return None
    ids = np.ascontiguousarray(ids, np.int64)
    if block.id_scale != 1:
        ids = ids * block.id_scale
    lens = block.offsets[ids + 1] - block.offsets[ids]
    sptr = None
    if skip is not None:
        skip = np.ascontiguousarray(skip, np.uint8)
        lens = np.where(skip != 0, 0, lens)
        sptr = _ptr(skip)
    out_offsets = np.zeros(len(ids) + 1, np.int64)
    np.cumsum(lens, out=out_offsets[1:])
    total = int(out_offsets[-1])
    out = np.empty(max(total, 1), np.uint8)
    lib.csv_gather_bytes(_ptr(block.pool), _ptr(block.offsets), _ptr(ids),
                         sptr, len(ids), _ptr(out_offsets), _ptr(out))
    return out_offsets, out[:total]


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


class JsonBlock:
    """Tokenized flat-ndjson block: value pool + kind byte per field.

    kinds: 0=null 1=false 2=true 3=number 4=string 5=nested-raw-json.
    Field id for (row, col) = row * ncols + col.
    """

    id_scale = 1  # shared bulk converters scale field ids by this

    __slots__ = ("offsets", "pool", "kinds", "keys", "n_rows", "ncols")

    def __init__(self, offsets, pool, kinds, keys, n_rows, ncols):
        self.offsets = offsets
        self.pool = pool
        self.kinds = kinds
        self.keys = keys
        self.n_rows = n_rows
        self.ncols = ncols


def json_parse_flat(data: bytes) -> Optional[JsonBlock]:
    """Tokenize flat same-keyed ndjson; None when the native lib is
    unavailable or the input needs the general parser."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8) if data else np.empty(0, np.uint8)
    handle = lib.json_parse_flat(_ptr(src) if len(src) else None,
                                 len(src))
    try:
        ok = ctypes.c_int32()
        n_rows = ctypes.c_int64()
        ncols = ctypes.c_int32()
        pool_bytes = ctypes.c_int64()
        key_bytes = ctypes.c_int64()
        lib.json_parse_sizes(handle, ctypes.byref(ok),
                             ctypes.byref(n_rows), ctypes.byref(ncols),
                             ctypes.byref(pool_bytes),
                             ctypes.byref(key_bytes))
        if not ok.value:
            return None
        n_fields = n_rows.value * ncols.value
        offsets = np.empty(n_fields + 1, np.int64)
        pool = np.empty(max(pool_bytes.value, 1), np.uint8)
        kinds = np.empty(max(n_fields, 1), np.uint8)
        kb = np.empty(max(key_bytes.value, 1), np.uint8)
        ko = np.empty(ncols.value + 1, np.int32)
        lib.json_parse_fill(handle, _ptr(offsets), _ptr(pool),
                            _ptr(kinds), _ptr(kb), _ptr(ko))
        raw = kb.tobytes()
        keys = [raw[ko[i]:ko[i + 1]].decode("utf8")
                for i in range(ncols.value)]
        return JsonBlock(offsets, pool[:pool_bytes.value],
                         kinds[:n_fields], keys, n_rows.value,
                         ncols.value)
    finally:
        lib.json_parse_free(handle)


def gather_var_bytes(pool: np.ndarray, offsets: np.ndarray,
                     ids: np.ndarray
                     ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Dense (offsets int64[n+1], bytes) gather of var-length values
    `ids` out of (pool, offsets); None without the native lib."""
    lib = get_lib()
    if lib is None:
        return None
    pool = np.ascontiguousarray(pool, np.uint8)
    offsets = np.ascontiguousarray(offsets, np.int64)
    ids = np.ascontiguousarray(ids, np.int64)
    lens = offsets[ids + 1] - offsets[ids]
    out_offsets = np.zeros(len(ids) + 1, np.int64)
    np.cumsum(lens, out=out_offsets[1:])
    total = int(out_offsets[-1])
    out = np.empty(max(total, 1), np.uint8)
    lib.csv_gather_bytes(_ptr(pool), _ptr(offsets), _ptr(ids), None,
                         len(ids), _ptr(out_offsets), _ptr(out))
    return out_offsets, out[:total]


def plain_decode_byte_array(data, n: int
                            ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Parquet PLAIN BYTE_ARRAY decode: n length-prefixed values ->
    (offsets int64[n+1], compact bytes). Raises on overrun."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    offsets = np.empty(n + 1, np.int64)
    out = np.empty(max(len(src), 1), np.uint8)
    written = lib.plain_decode_byte_array(
        _ptr(src) if len(src) else None, len(src), n, _ptr(offsets),
        _ptr(out))
    if written < 0:
        raise ValueError("parquet BYTE_ARRAY data truncated")
    return offsets, out[:written]


def plain_encode_byte_array(pool: np.ndarray, offsets: np.ndarray,
                            present: Optional[np.ndarray]
                            ) -> Optional[bytes]:
    """Parquet PLAIN BYTE_ARRAY encode of the present values."""
    lib = get_lib()
    if lib is None:
        return None
    pool = np.ascontiguousarray(pool, np.uint8)
    offsets = np.ascontiguousarray(offsets, np.int64)
    n = len(offsets) - 1
    lens = offsets[1:] - offsets[:-1]
    pptr = None
    if present is not None:
        present = np.ascontiguousarray(present, np.uint8)
        pptr = _ptr(present)
        cap = int(lens[present != 0].sum()) + 4 * int((present != 0).sum())
    else:
        cap = int(lens.sum()) + 4 * n
    out = np.empty(max(cap, 1), np.uint8)
    written = lib.plain_encode_byte_array(_ptr(pool), _ptr(offsets), pptr,
                                          n, _ptr(out))
    return out[:written].tobytes()


def minmax_binary(pool: np.ndarray, offsets: np.ndarray,
                  valid: Optional[np.ndarray]
                  ) -> Optional[Tuple[int, int, int]]:
    """(min_idx, max_idx, n_valid) by unsigned-byte order; indices are
    -1 when no valid values. None without the native lib."""
    lib = get_lib()
    if lib is None:
        return None
    pool = np.ascontiguousarray(pool, np.uint8)
    offsets = np.ascontiguousarray(offsets, np.int64)
    n = len(offsets) - 1
    vptr = None
    if valid is not None:
        valid = np.ascontiguousarray(valid, np.uint8)
        vptr = _ptr(valid)
    idx = np.empty(2, np.int64)
    count = lib.minmax_binary(_ptr(pool), _ptr(offsets), vptr, n,
                              _ptr(idx))
    return int(idx[0]), int(idx[1]), int(count)


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


def csv_format_f64(vals: np.ndarray, valid: Optional[np.ndarray],
                   raw: bool = False):
    """Shortest-round-trip decimal strings for an f64 column
    (std::to_chars; csv/writer.cc float formatting analogue). Returns a
    list of str (invalid rows -> ""), or None without the native lib.
    NOTE: to_chars picks scientific whenever shorter (0.0001 ->
    "1e-04" where python repr keeps "0.0001"); values round-trip
    identically either way."""
    lib = get_lib()
    if lib is None:
        return None
    vals = np.ascontiguousarray(vals, np.float64)
    n = len(vals)
    pool = np.empty(n * 32, np.uint8)
    offs = np.empty(n + 1, np.int64)
    vptr = None
    if valid is not None:
        valid = np.ascontiguousarray(valid, np.uint8)
        vptr = _ptr(valid)
    total = lib.csv_format_f64(_ptr(vals), vptr, n, _ptr(pool),
                               _ptr(offs))
    if raw:
        return offs, pool[:total]
    text = pool[:total].tobytes().decode("ascii")
    ol = offs.tolist()
    return [text[ol[i]:ol[i + 1]] for i in range(n)]


def csv_format_i64(vals: np.ndarray, valid: Optional[np.ndarray],
                   raw: bool = False):
    lib = get_lib()
    if lib is None:
        return None
    vals = np.ascontiguousarray(vals, np.int64)
    n = len(vals)
    pool = np.empty(n * 24, np.uint8)
    offs = np.empty(n + 1, np.int64)
    vptr = None
    if valid is not None:
        valid = np.ascontiguousarray(valid, np.uint8)
        vptr = _ptr(valid)
    total = lib.csv_format_i64(_ptr(vals), vptr, n, _ptr(pool),
                               _ptr(offs))
    if raw:
        return offs, pool[:total]
    text = pool[:total].tobytes().decode("ascii")
    ol = offs.tolist()
    return [text[ol[i]:ol[i + 1]] for i in range(n)]


def csv_quote_cells(pool: np.ndarray, offsets_i32: np.ndarray,
                    valid: Optional[np.ndarray], delim: str):
    """QUOTE_MINIMAL pass over a string column's (pool, i32 offsets);
    returns (offsets int64[n+1], quoted pool u8) or None."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(offsets_i32) - 1
    pool = np.ascontiguousarray(pool, np.uint8)
    offsets_i32 = np.ascontiguousarray(offsets_i32, np.int32)
    vptr = None
    if valid is not None:
        valid = np.ascontiguousarray(valid, np.uint8)
        vptr = _ptr(valid)
    out_pool = np.empty(2 * len(pool) + 2 * n + 2, np.uint8)
    out_offs = np.empty(n + 1, np.int64)
    total = lib.csv_quote_cells(_ptr(pool), _ptr(offsets_i32), vptr, n,
                                ord(delim), _ptr(out_pool),
                                _ptr(out_offs))
    return out_offs, out_pool[:total]


def csv_interleave(cols, n: int, delim: str) -> Optional[np.ndarray]:
    """Interleave per-column (offsets int64[n+1], pool u8) pairs into
    one CSV body (delim-joined cells, CRLF rows); returns u8 array."""
    lib = get_lib()
    if lib is None:
        return None
    ncols = len(cols)
    offs_arr = (ctypes.c_void_p * ncols)()
    pool_arr = (ctypes.c_void_p * ncols)()
    total = n * (ncols + 1)          # delims + CRLF
    keep = []
    for i, (offs, pool) in enumerate(cols):
        offs = np.ascontiguousarray(offs, np.int64)
        pool = np.ascontiguousarray(pool, np.uint8)
        keep.append((offs, pool))
        offs_arr[i] = _ptr(offs)
        pool_arr[i] = _ptr(pool)
        total += int(offs[-1])
    out = np.empty(total, np.uint8)
    written = lib.csv_interleave(ncols, ctypes.cast(offs_arr,
                                                   ctypes.c_void_p),
                                 ctypes.cast(pool_arr, ctypes.c_void_p),
                                 n, ord(delim), _ptr(out))
    return out[:written]


def orc_rlev2_encode(vals: np.ndarray, signed: bool) -> Optional[bytes]:
    """ORC RLEv2 encode (SHORT_REPEAT + DIRECT subset), byte-identical
    to io/orc.py's python encoder; None without the native lib."""
    lib = get_lib()
    if lib is None:
        return None
    vals = np.ascontiguousarray(vals, np.int64)
    n = len(vals)
    out = np.empty(9 * n + 2 * (n // 512 + 2) + 16, np.uint8)
    written = lib.orc_rlev2_encode(_ptr(vals), n, 1 if signed else 0,
                                   _ptr(out))
    return out[:written].tobytes()


def orc_rlev2_decode(data: bytes, n: int, signed: bool):
    """ORC RLEv2 bulk decode (liborc RleDecoderV2 analogue); returns an
    int64 array or None when the native lib is unavailable; raises on a
    corrupt/overrunning stream like the python decoder."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(n, np.int64)
    consumed = lib.orc_rlev2_decode(_ptr(buf), len(buf), n,
                                    1 if signed else 0, _ptr(out))
    if consumed < 0:
        raise ValueError("ORC RLEv2 stream truncated/corrupt")
    return out


def pq_scan_pages(blob, expect_values: int) -> Optional[np.ndarray]:
    """Parse every page header of a parquet column-chunk blob in ONE
    native call (SerializedPageReader analogue). Returns an (n_pages,
    10) int64 table: [ptype, payload_off, comp, uncomp, nvals, enc,
    nnulls, dl_len, rl_len, v2_values_compressed]; None if the native
    library is unavailable or the blob is malformed/truncated."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(blob, np.uint8)
    max_pages = 8
    while True:
        tab = np.empty((max_pages, 10), dtype=np.int64)
        n = lib.pq_scan_pages(_ptr(src), len(src), expect_values,
                              max_pages, _ptr(tab))
        if n < 0:
            if max_pages < (1 << 22):
                # could also be truncation mid-scan; a larger table
                # only helps when pages overflowed it
                probe = int((tab[:, 4] > 0).sum())
                if probe >= max_pages - 1:
                    max_pages *= 8
                    continue
            return None
        return tab[:n]


def pq_decode_flat(blob, tab: np.ndarray, codec: int, max_def: int,
                   def_bw: int, byte_width: int, expect_values: int):
    """Decode a flat fixed-width column chunk in ONE native call:
    per-page decompress + definition-level RLE + PLAIN value copy /
    dictionary-index RLE (parquet/column_reader.cc inner loop).
    Returns (validity_u8, plain_bytes, idx_i64, page_kind, page_np,
    dict_bytes) or None when unsupported (exotic encoding, codec, or
    no native library)."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(blob, np.uint8)
    tab = np.ascontiguousarray(tab, dtype=np.int64)
    n_pages = len(tab)
    uncomp_total = int(tab[:, 3].sum())
    dict_rows = tab[tab[:, 0] == 2]
    dict_cap = int(dict_rows[:, 3].max()) if len(dict_rows) else 1
    is_data = (tab[:, 0] == 0) | (tab[:, 0] == 3)
    encs = tab[is_data, 5]
    any_plain = bool((encs == 0).any())
    any_idx = bool(((encs == 2) | (encs == 8)).any())
    validity = np.empty(max(expect_values, 1), dtype=np.uint8)
    plain = np.empty(max(uncomp_total, 1) if any_plain else 1,
                     dtype=np.uint8)
    idx = np.empty(max(expect_values, 1) if any_idx else 1,
                   dtype=np.int64)
    dict_buf = np.empty(max(dict_cap, 1), dtype=np.uint8)
    page_kind = np.empty(n_pages, dtype=np.int64)
    page_np = np.empty(n_pages, dtype=np.int64)
    totals = np.zeros(6, dtype=np.int64)
    rc = lib.pq_decode_flat(
        _ptr(src), len(src), _ptr(tab), n_pages, codec, max_def,
        def_bw, byte_width, _ptr(validity), len(validity), _ptr(plain),
        len(plain), _ptr(idx), len(idx), _ptr(dict_buf), len(dict_buf),
        _ptr(page_kind), _ptr(page_np), _ptr(totals))
    if rc != 0:
        return None
    nv, npres, pbytes, icount, dbytes = (int(totals[i]) for i in
                                         range(5))
    return (validity[:nv], plain[:pbytes], idx[:icount], page_kind,
            page_np, dict_buf[:dbytes].tobytes())
