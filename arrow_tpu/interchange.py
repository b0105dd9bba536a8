"""DataFrame interchange protocol (dataframe-api spec v1).

Reference analogue: python/pyarrow/interchange/ (column.py
_PyArrowColumn, dataframe.py _PyArrowDataFrame, buffer.py _PyArrowBuffer,
from_dataframe.py). Produces protocol objects over our Arrow-layout
buffers zero-copy, and consumes any protocol-compliant producer (pandas,
polars, pyarrow, ...) into an arrow_tpu Table.
"""

from __future__ import annotations

import ctypes
import enum
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from .buffer import Buffer
from .types import DataType, Field, Schema, TypeId
from . import types as T


class DtypeKind(enum.IntEnum):
    INT = 0
    UINT = 1
    FLOAT = 2
    BOOL = 20
    STRING = 21
    DATETIME = 22
    CATEGORICAL = 23


class ColumnNullType(enum.IntEnum):
    NON_NULLABLE = 0
    USE_NAN = 1
    USE_SENTINEL = 2
    USE_BITMASK = 3
    USE_BYTEMASK = 4


class DlpackDeviceType(enum.IntEnum):
    CPU = 1
    CUDA = 2


_KIND_FOR: Dict[int, Tuple[DtypeKind, int]] = {
    TypeId.INT8: (DtypeKind.INT, 8), TypeId.INT16: (DtypeKind.INT, 16),
    TypeId.INT32: (DtypeKind.INT, 32), TypeId.INT64: (DtypeKind.INT, 64),
    TypeId.UINT8: (DtypeKind.UINT, 8), TypeId.UINT16: (DtypeKind.UINT, 16),
    TypeId.UINT32: (DtypeKind.UINT, 32),
    TypeId.UINT64: (DtypeKind.UINT, 64),
    TypeId.HALF_FLOAT: (DtypeKind.FLOAT, 16),
    TypeId.FLOAT: (DtypeKind.FLOAT, 32),
    TypeId.DOUBLE: (DtypeKind.FLOAT, 64),
    TypeId.BOOL: (DtypeKind.BOOL, 1),
    TypeId.STRING: (DtypeKind.STRING, 8),
    TypeId.LARGE_STRING: (DtypeKind.STRING, 8),
    TypeId.DATE32: (DtypeKind.DATETIME, 32),
    TypeId.DATE64: (DtypeKind.DATETIME, 64),
    TypeId.TIMESTAMP: (DtypeKind.DATETIME, 64),
    TypeId.DURATION: (DtypeKind.DATETIME, 64),
    TypeId.TIME32: (DtypeKind.DATETIME, 32),
    TypeId.TIME64: (DtypeKind.DATETIME, 64),
}


def _dtype_tuple(t: DataType) -> Tuple[DtypeKind, int, str, str]:
    from .c_data import format_for_type
    if t.id == TypeId.DICTIONARY:
        idx = t.index_type
        kind, bits = _KIND_FOR[idx.id]
        return (DtypeKind.CATEGORICAL, bits, format_for_type(idx), "=")
    if t.id not in _KIND_FOR:
        raise NotImplementedError(
            f"type {t!r} not supported by the interchange protocol")
    kind, bits = _KIND_FOR[t.id]
    return (kind, bits, format_for_type(t), "=")


class _ATBuffer:
    """Protocol Buffer over one of our Arrow-layout buffers."""

    def __init__(self, buf: Buffer):
        self._buf = buf
        self._np = buf.to_numpy()

    @property
    def bufsize(self) -> int:
        return int(self._np.nbytes)

    @property
    def ptr(self) -> int:
        return self._np.ctypes.data

    def __dlpack__(self):
        return self._np.__dlpack__()

    def __dlpack_device__(self):
        return (DlpackDeviceType.CPU, None)

    def __repr__(self) -> str:
        return (f"ATBuffer(bufsize={self.bufsize}, ptr={self.ptr}, "
                f"device='CPU')")


class _ATColumn:
    """Protocol Column over one arrow_tpu Array (a single chunk)."""

    def __init__(self, arr, allow_copy: bool = True):
        self._arr = arr
        self._allow_copy = allow_copy

    def size(self) -> int:
        return len(self._arr)

    @property
    def offset(self) -> int:
        return self._arr.offset

    @property
    def dtype(self) -> Tuple[DtypeKind, int, str, str]:
        return _dtype_tuple(self._arr.type)

    @property
    def describe_categorical(self):
        t = self._arr.type
        if t.id != TypeId.DICTIONARY:
            raise TypeError("describe_categorical only works on a column "
                            "with categorical dtype")
        return {
            "is_ordered": bool(getattr(t, "ordered", False)),
            "is_dictionary": True,
            "categories": _ATColumn(self._arr.dictionary, self._allow_copy),
        }

    @property
    def describe_null(self) -> Tuple[int, Any]:
        if self._arr.null_count == 0 and \
                self._arr.data.buffers[0] is None:
            return (ColumnNullType.NON_NULLABLE, None)
        return (ColumnNullType.USE_BITMASK, 0)

    @property
    def null_count(self) -> int:
        return self._arr.null_count

    @property
    def metadata(self) -> Dict[str, Any]:
        return {"arrow_tpu.type": repr(self._arr.type)}

    def num_chunks(self) -> int:
        return 1

    def get_chunks(self, n_chunks: Optional[int] = None):
        if n_chunks and n_chunks > 1:
            n = len(self._arr)
            step = max(1, (n + n_chunks - 1) // n_chunks)
            for start in range(0, max(n, 1), step):
                yield _ATColumn(self._arr.slice(
                    start, min(step, n - start)), self._allow_copy)
        else:
            yield self

    def get_buffers(self):
        arr = self._arr
        t = arr.type
        bufs = arr.data.buffers
        out: Dict[str, Any] = {"data": None, "validity": None,
                               "offsets": None}
        if bufs and bufs[0] is not None:
            out["validity"] = (_ATBuffer(bufs[0]),
                               (DtypeKind.BOOL, 1, "b", "="))
        if t.id == TypeId.DICTIONARY:
            # buffer dtype is the physical INDEX dtype (the consumer
            # reconstructs the dictionary via describe_categorical)
            from .c_data import format_for_type
            idx = t.index_type
            idx_kind, idx_bits = _KIND_FOR[idx.id]
            out["data"] = (_ATBuffer(bufs[1]),
                           (idx_kind, idx_bits, format_for_type(idx), "="))
            return out
        kind, bits, fmt, _ = self.dtype
        if kind == DtypeKind.STRING:
            off_bits = 64 if t.id == TypeId.LARGE_STRING else 32
            off_fmt = "l" if off_bits == 64 else "i"
            out["offsets"] = (_ATBuffer(bufs[1]),
                              (DtypeKind.INT, off_bits, off_fmt, "="))
            data_buf = bufs[2] if bufs[2] is not None else Buffer(b"")
            out["data"] = (_ATBuffer(data_buf),
                           (DtypeKind.STRING, 8, "u", "="))
        else:
            out["data"] = (_ATBuffer(bufs[1]), (kind, bits, fmt, "="))
        return out


class _ATDataFrame:
    """Protocol DataFrame over an arrow_tpu Table or RecordBatch."""

    def __init__(self, table, nan_as_null: bool = False,
                 allow_copy: bool = True):
        self._tbl = table
        self._nan_as_null = nan_as_null
        self._allow_copy = allow_copy

    def __dataframe__(self, nan_as_null: bool = False,
                      allow_copy: bool = True):
        return _ATDataFrame(self._tbl, nan_as_null, allow_copy)

    @property
    def metadata(self) -> Dict[str, Any]:
        return {"arrow_tpu.num_rows": self._tbl.num_rows}

    def num_columns(self) -> int:
        return len(self._tbl.schema)

    def num_rows(self) -> int:
        return self._tbl.num_rows

    def num_chunks(self) -> int:
        return 1

    def column_names(self) -> List[str]:
        return list(self._tbl.schema.names)

    def _chunk_array(self, i: int):
        col = self._tbl.column(i)
        if hasattr(col, "combine_chunks"):
            return col.combine_chunks()
        if hasattr(col, "chunks"):
            chunks = col.chunks
            if len(chunks) == 1:
                return chunks[0]
            from .api import concat_arrays
            return concat_arrays(chunks)
        return col

    def get_column(self, i: int) -> _ATColumn:
        return _ATColumn(self._chunk_array(i), self._allow_copy)

    def get_column_by_name(self, name: str) -> _ATColumn:
        return self.get_column(self._tbl.schema.names.index(name))

    def get_columns(self) -> List[_ATColumn]:
        return [self.get_column(i) for i in range(self.num_columns())]

    def select_columns(self, indices: Sequence[int]) -> "_ATDataFrame":
        names = [self._tbl.schema.names[i] for i in indices]
        return self.select_columns_by_name(names)

    def select_columns_by_name(self, names: Sequence[str]):
        return _ATDataFrame(self._tbl.select(list(names)),
                            self._nan_as_null, self._allow_copy)

    def get_chunks(self, n_chunks: Optional[int] = None):
        if n_chunks and n_chunks > 1:
            n = self._tbl.num_rows
            step = max(1, (n + n_chunks - 1) // n_chunks)
            for start in range(0, max(n, 1), step):
                yield _ATDataFrame(
                    self._tbl.slice(start, min(step, n - start)),
                    self._nan_as_null, self._allow_copy)
        else:
            yield self


# --------------------------------------------------------------------------
# Consumer: build an arrow_tpu Table from any protocol producer
# --------------------------------------------------------------------------

def _np_from_buffer(buf, n_items: int, bits: int, np_dtype,
                    offset_items: int = 0) -> np.ndarray:
    nbytes = (n_items + offset_items) * (bits // 8)
    raw = (ctypes.c_ubyte * nbytes).from_address(buf.ptr)
    a = np.frombuffer(raw, dtype=np_dtype, count=n_items + offset_items)
    return a[offset_items:].copy()


_NP_FOR = {(DtypeKind.INT, 8): np.int8, (DtypeKind.INT, 16): np.int16,
           (DtypeKind.INT, 32): np.int32, (DtypeKind.INT, 64): np.int64,
           (DtypeKind.UINT, 8): np.uint8, (DtypeKind.UINT, 16): np.uint16,
           (DtypeKind.UINT, 32): np.uint32,
           (DtypeKind.UINT, 64): np.uint64,
           (DtypeKind.FLOAT, 16): np.float16,
           (DtypeKind.FLOAT, 32): np.float32,
           (DtypeKind.FLOAT, 64): np.float64}

_AT_FOR = {(DtypeKind.INT, 8): T.int8, (DtypeKind.INT, 16): T.int16,
           (DtypeKind.INT, 32): T.int32, (DtypeKind.INT, 64): T.int64,
           (DtypeKind.UINT, 8): T.uint8, (DtypeKind.UINT, 16): T.uint16,
           (DtypeKind.UINT, 32): T.uint32, (DtypeKind.UINT, 64): T.uint64,
           (DtypeKind.FLOAT, 16): T.float16, (DtypeKind.FLOAT, 32):
           T.float32, (DtypeKind.FLOAT, 64): T.float64}


def _valid_mask(col, n: int) -> np.ndarray:
    kind, value = col.describe_null
    bufs = col.get_buffers()
    vb = bufs.get("validity")
    if kind == ColumnNullType.NON_NULLABLE or vb is None:
        if kind == ColumnNullType.USE_NAN:
            dbuf, ddt = bufs["data"]
            vals = _np_from_buffer(dbuf, n, ddt[1], _NP_FOR[(ddt[0],
                                                             ddt[1])],
                                   col.offset)
            return ~np.isnan(vals)
        return np.ones(n, dtype=bool)
    buf, dt = vb
    if kind == ColumnNullType.USE_BITMASK:
        nbytes = (n + col.offset + 7) // 8
        raw = (ctypes.c_ubyte * nbytes).from_address(buf.ptr)
        bits = np.unpackbits(np.frombuffer(raw, dtype=np.uint8),
                             bitorder="little")
        mask = bits[col.offset:col.offset + n].astype(bool)
    else:  # byte mask
        raw = (ctypes.c_ubyte * (n + col.offset)).from_address(buf.ptr)
        mask = np.frombuffer(raw, dtype=np.uint8)[
            col.offset:col.offset + n].astype(bool)
    if value == 1:  # 1 means null -> invert
        mask = ~mask
    return mask


def _column_to_array(col):
    from .array.array import array as make_array
    n = col.size() if callable(col.size) else col.size
    kind, bits, fmt, _ = col.dtype
    mask = _valid_mask(col, n)
    bufs = col.get_buffers()

    if kind == DtypeKind.STRING:
        obuf, odt = bufs["offsets"]
        offs = _np_from_buffer(obuf, n + 1, odt[1],
                               _NP_FOR[(DtypeKind.INT, odt[1])],
                               col.offset)
        dbuf, _ = bufs["data"]
        nbytes = int(offs[-1])
        raw = bytes((ctypes.c_ubyte * nbytes).from_address(dbuf.ptr)) \
            if nbytes else b""
        vals = [raw[offs[i]:offs[i + 1]].decode("utf8") if mask[i]
                else None for i in range(n)]
        return make_array(vals, T.string())

    if kind == DtypeKind.BOOL:
        dbuf, ddt = bufs["data"]
        if ddt[1] == 1:  # bit-packed
            nbytes = (n + col.offset + 7) // 8
            raw = (ctypes.c_ubyte * nbytes).from_address(dbuf.ptr)
            b = np.unpackbits(np.frombuffer(raw, dtype=np.uint8),
                              bitorder="little")
            vals = b[col.offset:col.offset + n].astype(bool)
        else:
            raw = (ctypes.c_ubyte * (n + col.offset)).from_address(
                dbuf.ptr)
            vals = np.frombuffer(raw, dtype=np.uint8)[
                col.offset:col.offset + n].astype(bool)
        py = [bool(v) if m else None for v, m in zip(vals, mask)]
        return make_array(py, T.bool_())

    if kind == DtypeKind.CATEGORICAL:
        dbuf, ddt = bufs["data"]
        idx = _np_from_buffer(dbuf, n, ddt[1],
                              _NP_FOR[(DtypeKind(ddt[0]), ddt[1])],
                              col.offset)
        cats_col = col.describe_categorical["categories"]
        cats = _column_to_array(cats_col).to_pylist()
        vals = [cats[int(i)] if m else None for i, m in zip(idx, mask)]
        vt = T.string() if (cats and isinstance(
            next((c for c in cats if c is not None), ""), str)) \
            else T.int64()
        return make_array(vals, T.dictionary(T.int32(), vt))

    if kind == DtypeKind.DATETIME:
        dbuf, ddt = bufs["data"]
        vals = _np_from_buffer(
            dbuf, n, bits, np.int64 if bits == 64 else np.int32,
            col.offset)
        # format like "tsu:" / "tsn:tz" / "tdD"
        if fmt.startswith("ts"):
            unit = {"s": "s", "m": "ms", "u": "us", "n": "ns"}[fmt[2]]
            tz = fmt.split(":", 1)[1] if ":" in fmt else ""
            t = T.timestamp(unit, tz or None)
        elif fmt == "tdD":
            t = T.date32()
        elif fmt == "tdm":
            t = T.date64()
        elif fmt.startswith("tt"):
            unit = {"s": "s", "m": "ms", "u": "us", "n": "ns"}[fmt[2]]
            t = T.time32(unit) if bits == 32 else T.time64(unit)
        elif fmt.startswith("tD"):
            unit = {"s": "s", "m": "ms", "u": "us", "n": "ns"}[fmt[2]]
            t = T.duration(unit)
        else:
            raise NotImplementedError(f"datetime format {fmt!r}")
        py = [int(v) if m else None for v, m in zip(vals, mask)]
        return make_array(py, t)

    np_dtype = _NP_FOR[(kind, bits)]
    dbuf, _ = bufs["data"]
    vals = _np_from_buffer(dbuf, n, bits, np_dtype, col.offset)
    py = [vals.dtype.type(v).item() if m else None
          for v, m in zip(vals, mask)]
    return make_array(py, _AT_FOR[(kind, bits)]())


def from_dataframe(df, allow_copy: bool = True):
    """Build an arrow_tpu Table from any __dataframe__ producer
    (pandas, polars, pyarrow, arrow_tpu, ...). Reference analogue:
    python/pyarrow/interchange/from_dataframe.py."""
    from .table import Table, RecordBatch

    if isinstance(df, (Table, RecordBatch)):
        return df if isinstance(df, Table) else Table.from_batches([df])
    if not hasattr(df, "__dataframe__"):
        raise TypeError("`df` does not support __dataframe__")
    proto = df.__dataframe__(allow_copy=allow_copy)

    batches = []
    names = list(proto.column_names())
    for chunk in proto.get_chunks():
        arrays = [_column_to_array(chunk.get_column(i))
                  for i in range(chunk.num_columns())]
        fields = [Field(nm, a.type, True) for nm, a in zip(names, arrays)]
        batches.append(RecordBatch(Schema(fields), arrays))
    if not batches:
        raise ValueError("empty interchange dataframe")
    return Table.from_batches(batches, batches[0].schema)
