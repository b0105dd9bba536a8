"""Array construction from Python sequences / numpy arrays.

Replaces the reference's builder hierarchy (cpp/src/arrow/array/builder_base.h:97)
with vectorized numpy conversion: host construction is a test/ingest
convenience, the hot path is device-side.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
from typing import Any, Optional, Sequence

import numpy as np

from .. import types as T
from ..buffer import Buffer
from ..types import DataType, TypeId
from ..utils import bits as bitutil
from .data import ArrayData


def infer_type(values: Sequence[Any]) -> DataType:
    has_float = has_int = has_bool = False
    sample = None
    for v in values:
        if v is None:
            continue
        if isinstance(v, bool) or isinstance(v, np.bool_):
            has_bool = True
        elif isinstance(v, (int, np.integer)):
            has_int = True
        elif isinstance(v, (float, np.floating)):
            has_float = True
        else:
            sample = v
            break
    if sample is None:
        if has_bool and not (has_int or has_float):
            return T.bool_()
        if has_float:
            return T.float64()
        if has_int:
            return T.int64()
        return T.null()
    if isinstance(sample, str):
        return T.string()
    if isinstance(sample, (bytes, bytearray)):
        return T.binary()
    if isinstance(sample, _decimal.Decimal):
        return T.decimal128(38, max(0, -sample.as_tuple().exponent))
    if isinstance(sample, _dt.datetime):
        return T.timestamp("us")
    if isinstance(sample, _dt.date):
        return T.date32()
    if isinstance(sample, _dt.timedelta):
        return T.duration("us")
    if isinstance(sample, dict):
        keys = {}
        for v in values:
            if v is not None:
                for k, item in v.items():
                    keys.setdefault(k, []).append(item)
        return T.struct([(k, infer_type(vs)) for k, vs in keys.items()])
    if isinstance(sample, (list, tuple, np.ndarray)):
        flat = [x for v in values if v is not None for x in v]
        return T.list_(infer_type(flat))
    raise TypeError(f"cannot infer arrow type for {type(sample)}")


def _make_validity(mask: np.ndarray) -> Optional[Buffer]:
    """mask True=valid -> packed bitmap buffer, or None when all valid."""
    if mask.all():
        return None
    return Buffer(bitutil.pack_bits(mask))


def _temporal_to_int(v, type: DataType) -> int:
    tid = type.id
    if isinstance(v, (int, np.integer)):
        return int(v)
    if tid == TypeId.DATE32 and isinstance(v, _dt.date):
        return (v - _dt.date(1970, 1, 1)).days
    if tid == TypeId.DATE64 and isinstance(v, _dt.date):
        return (v - _dt.date(1970, 1, 1)).days * 86400000
    if tid == TypeId.TIMESTAMP and isinstance(v, _dt.datetime):
        epoch = _dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
        delta = v - epoch
        us = delta // _dt.timedelta(microseconds=1)
        scale = {"s": 1_000_000, "ms": 1000, "us": 1, "ns": 1}[type.unit]
        return us * 1000 if type.unit == "ns" else us // scale
    if tid == TypeId.DURATION and isinstance(v, _dt.timedelta):
        us = v // _dt.timedelta(microseconds=1)
        scale = {"s": 1_000_000, "ms": 1000, "us": 1, "ns": 1}[type.unit]
        return us * 1000 if type.unit == "ns" else us // scale
    if tid in (TypeId.TIME32, TypeId.TIME64) and isinstance(v, _dt.time):
        us = ((v.hour * 3600 + v.minute * 60 + v.second) * 1_000_000
              + v.microsecond)
        scale = {"s": 1_000_000, "ms": 1000, "us": 1, "ns": 1}[type.unit]
        return us * 1000 if type.unit == "ns" else us // scale
    raise TypeError(f"cannot convert {v!r} to {type!r}")


def _decimal_to_bytes(v, type) -> bytes:
    if isinstance(v, _decimal.Decimal):
        unscaled = int(v.scaleb(type.scale).to_integral_value())
    else:
        unscaled = int(v)
    return unscaled.to_bytes(type.byte_width, "little", signed=True)


def array_data_from_sequence(values: Sequence[Any],
                             type: Optional[DataType] = None) -> ArrayData:
    if isinstance(values, np.ndarray) and values.dtype != object:
        return _from_numpy(values, type)
    values = list(values)
    if type is None:
        type = infer_type(values)
    n = len(values)
    mask = np.array([v is not None for v in values], dtype=np.bool_)
    tid = type.id

    if tid == TypeId.NA:
        return ArrayData(type, n, [], null_count=n)

    if tid == TypeId.BOOL:
        data = np.array([bool(v) if v is not None else False for v in values])
        return ArrayData(type, n, [_make_validity(mask),
                                   Buffer(bitutil.pack_bits(data))])

    if type.is_numeric:
        dt = type.to_numpy_dtype()
        data = np.array([v if v is not None else 0 for v in values], dtype=dt)
        return ArrayData(type, n, [_make_validity(mask), Buffer(data)])

    if tid == TypeId.INTERVAL_DAY_TIME:
        # 8-byte (days i32, ms i32) pairs
        data = np.zeros((n, 2), dtype=np.int32)
        for i, v in enumerate(values):
            if v is not None:
                d_, ms = (v.days, v.milliseconds) if hasattr(v, "days") \
                    else (v[0], v[1])
                data[i] = (d_, ms)
        return ArrayData(type, n, [_make_validity(mask),
                                   Buffer(data.reshape(-1))])

    if tid == TypeId.INTERVAL_MONTH_DAY_NANO:
        # 16-byte (months i32, days i32, nanos i64) records
        raw = np.zeros((n, 16), dtype=np.uint8)
        for i, v in enumerate(values):
            if v is None:
                continue
            m, d_, ns = (v.months, v.days, v.nanoseconds) \
                if hasattr(v, "months") else (v[0], v[1], v[2])
            import struct as _st
            raw[i] = np.frombuffer(_st.pack("<iiq", m, d_, ns), np.uint8)
        return ArrayData(type, n, [_make_validity(mask),
                                   Buffer(raw.reshape(-1))])

    if type.is_temporal or tid == TypeId.INTERVAL_MONTHS:
        dt = type.to_numpy_dtype()
        data = np.array([_temporal_to_int(v, type) if v is not None else 0
                         for v in values], dtype=dt)
        return ArrayData(type, n, [_make_validity(mask), Buffer(data)])

    if tid in (TypeId.STRING, TypeId.BINARY, TypeId.LARGE_STRING,
               TypeId.LARGE_BINARY):
        off_dt = np.int32 if tid in (TypeId.STRING, TypeId.BINARY) else np.int64
        if tid in (TypeId.STRING, TypeId.LARGE_STRING) and n:
            # one join + one encode instead of n per-value encodes; for
            # ASCII (byte len == char len) offsets come from char
            # lengths in one C pass (same trick as to_pylist's reader).
            # join TypeErrors on any non-str -> generic loop below
            try:
                strs = ["" if v is None else v for v in values]
                joined = "".join(strs)
            except TypeError:
                strs = None
            if strs is not None:
                data = joined.encode()
                if len(data) == len(joined):
                    offsets = np.zeros(n + 1, dtype=off_dt)
                    np.cumsum(np.fromiter(map(len, strs), np.int64, n),
                              out=offsets[1:])
                    return ArrayData(type, n,
                                     [_make_validity(mask),
                                      Buffer(offsets), Buffer(data)])
        chunks = []
        offsets = np.zeros(n + 1, dtype=off_dt)
        pos = 0
        for i, v in enumerate(values):
            if v is not None:
                b = v.encode() if isinstance(v, str) else bytes(v)
                chunks.append(b)
                pos += len(b)
            offsets[i + 1] = pos
        data = b"".join(chunks)
        return ArrayData(type, n, [_make_validity(mask), Buffer(offsets),
                                   Buffer(data)])

    if tid in (TypeId.STRING_VIEW, TypeId.BINARY_VIEW):
        # view layout (reference: format/Columnar.rst "Variable-size Binary
        # View"): 16-byte views — length(i32) + (inline 12B | prefix 4B +
        # buffer_index i32 + offset i32); long values land in ONE variadic
        # data buffer here.
        views = np.zeros((n, 16), dtype=np.uint8)
        chunks = []
        pos = 0
        for i, v in enumerate(values):
            if v is None:
                continue
            b = v.encode() if isinstance(v, str) else bytes(v)
            views[i, 0:4] = np.frombuffer(
                np.int32(len(b)).tobytes(), np.uint8)
            if len(b) <= 12:
                views[i, 4:4 + len(b)] = np.frombuffer(b, np.uint8)
            else:
                views[i, 4:8] = np.frombuffer(b[:4], np.uint8)
                views[i, 8:12] = 0  # buffer index 0
                views[i, 12:16] = np.frombuffer(
                    np.int32(pos).tobytes(), np.uint8)
                chunks.append(b)
                pos += len(b)
        return ArrayData(type, n, [_make_validity(mask), Buffer(views),
                                   Buffer(b"".join(chunks))])

    if tid in (TypeId.LIST_VIEW, TypeId.LARGE_LIST_VIEW):
        off_dt = np.int64 if tid == TypeId.LARGE_LIST_VIEW else np.int32
        offsets = np.zeros(n, dtype=off_dt)
        sizes = np.zeros(n, dtype=off_dt)
        flat = []
        pos = 0
        for i, v in enumerate(values):
            if v is None:
                continue
            items = list(v)
            offsets[i] = pos
            sizes[i] = len(items)
            flat.extend(items)
            pos += len(items)
        child = array_data_from_sequence(flat, type.value_type)
        return ArrayData(type, n, [_make_validity(mask), Buffer(offsets),
                                   Buffer(sizes)], [child])

    if tid in (TypeId.FIXED_SIZE_BINARY, TypeId.DECIMAL128, TypeId.DECIMAL256, TypeId.DECIMAL32, TypeId.DECIMAL64):
        w = type.byte_width
        buf = bytearray(n * w)
        for i, v in enumerate(values):
            if v is None:
                continue
            if tid == TypeId.FIXED_SIZE_BINARY:
                b = bytes(v)
                if len(b) != w:
                    raise ValueError(f"expected {w} bytes, got {len(b)}")
            else:
                b = _decimal_to_bytes(v, type)
            buf[i * w:(i + 1) * w] = b
        return ArrayData(type, n, [_make_validity(mask), Buffer(bytes(buf))])

    if tid in (TypeId.LIST, TypeId.LARGE_LIST, TypeId.MAP):
        off_dt = np.int64 if tid == TypeId.LARGE_LIST else np.int32
        if tid != TypeId.MAP and all(
                v is None or isinstance(v, (list, tuple))
                for v in values):
            # C-level flatten: length cumsum + one chain pass instead
            # of per-row list() + extend
            from itertools import chain
            offsets = np.zeros(n + 1, dtype=off_dt)
            np.cumsum(np.fromiter(
                (0 if v is None else len(v) for v in values),
                np.int64, n), out=offsets[1:])
            flat = list(chain.from_iterable(
                v for v in values if v is not None))
            child = array_data_from_sequence(flat, type.value_type)
            return ArrayData(type, n,
                             [_make_validity(mask), Buffer(offsets)],
                             [child])
        offsets = np.zeros(n + 1, dtype=off_dt)
        flat = []
        pos = 0
        for i, v in enumerate(values):
            if v is not None:
                items = list(v.items()) if tid == TypeId.MAP and isinstance(v, dict) else list(v)
                flat.extend(items)
                pos += len(items)
            offsets[i + 1] = pos
        if tid == TypeId.MAP:
            entries = [{"key": k, "value": it} for (k, it) in flat]
            child = array_data_from_sequence(entries, type.value_type)
        else:
            child = array_data_from_sequence(flat, type.value_type)
        return ArrayData(type, n, [_make_validity(mask), Buffer(offsets)],
                         [child])

    if tid == TypeId.FIXED_SIZE_LIST:
        sz = type.list_size
        flat = []
        for v in values:
            if v is None:
                flat.extend([None] * sz)
            else:
                if len(v) != sz:
                    raise ValueError(f"expected lists of size {sz}")
                flat.extend(v)
        child = array_data_from_sequence(flat, type.value_type)
        return ArrayData(type, n, [_make_validity(mask)], [child])

    if tid == TypeId.STRUCT:
        children = []
        for f in type.fields:
            col = [None if v is None else v.get(f.name) for v in values]
            children.append(array_data_from_sequence(col, f.type))
        return ArrayData(type, n, [_make_validity(mask)], children)

    if tid == TypeId.DICTIONARY:
        # encode via python-level memo (host ingest path; device path uses
        # the vectorized grouper)
        memo: dict = {}
        idx_dt = type.index_type.to_numpy_dtype()
        indices = np.zeros(n, dtype=idx_dt)
        uniques = []
        for i, v in enumerate(values):
            if v is None:
                continue
            key = v
            if key not in memo:
                memo[key] = len(uniques)
                uniques.append(v)
            indices[i] = memo[key]
        dict_data = array_data_from_sequence(uniques, type.value_type)
        return ArrayData(type, n, [_make_validity(mask), Buffer(indices)],
                         dictionary=dict_data)

    raise NotImplementedError(f"construction for {type!r}")


def _from_numpy(arr: np.ndarray, type: Optional[DataType]) -> ArrayData:
    if arr.dtype.kind in "US":
        # numpy unicode/bytes arrays -> var-length string/binary
        if type is None:
            type = T.string() if arr.dtype.kind == "U" else T.binary()
        return array_data_from_sequence(arr.tolist(), type)
    if type is None:
        type = T.from_numpy_dtype(arr.dtype)
    if arr.dtype.kind in "Mm":
        arr = arr.view(np.int64)
    if type.id == TypeId.BOOL:
        return ArrayData(type, len(arr),
                         [None, Buffer(bitutil.pack_bits(arr.astype(np.bool_)))],
                         null_count=0)
    target = type.to_numpy_dtype()
    if arr.dtype != target:
        arr = arr.astype(target)
    return ArrayData(type, len(arr), [None, Buffer(arr)], null_count=0)
