"""User-facing Array wrapper (reference: cpp/src/arrow/array/array_base.h:53).

A thin, typed view over ArrayData with Python-level access for tests and
ingest. One class (not a hierarchy): the type id drives behavior.
"""

from __future__ import annotations

from typing import Any, List, Optional

import numpy as np

from ..types import DataType, TypeId
from .construct import array_data_from_sequence
from .data import ArrayData


class Array:
    __slots__ = ("data",)

    def __init__(self, data: ArrayData):
        self.data = data

    # -- properties -----------------------------------------------------
    @property
    def type(self) -> DataType:
        return self.data.type

    @property
    def null_count(self) -> int:
        return self.data.null_count

    @property
    def offset(self) -> int:
        return self.data.offset

    def __len__(self) -> int:
        return self.data.length

    @property
    def dictionary(self) -> Optional["Array"]:
        return Array(self.data.dictionary) if self.data.dictionary else None

    @property
    def indices(self) -> "Array":
        if self.type.id != TypeId.DICTIONARY:
            raise ValueError("not a dictionary array")
        d = self.data
        idx_data = ArrayData(self.type.index_type, d.length,
                             [d.buffers[0], d.buffers[1]],
                             null_count=d._null_count, offset=d.offset)
        return Array(idx_data)

    @property
    def run_ends(self) -> "Array":
        """Run-ends child of a run-end-encoded array (reference:
        array/array_run_end.h:48 RunEndEncodedArray::run_ends)."""
        if self.type.id != TypeId.RUN_END_ENCODED:
            raise ValueError("not a run-end-encoded array")
        return Array(self.data.children[0])

    @property
    def values(self) -> "Array":
        """Values child: REE values (array_run_end.h) or flattened list
        child (array_nested.h ListArray::values)."""
        if self.type.id == TypeId.RUN_END_ENCODED:
            return Array(self.data.children[1])
        if self.type.id in (TypeId.LIST, TypeId.LARGE_LIST,
                            TypeId.FIXED_SIZE_LIST, TypeId.MAP):
            return Array(self.data.children[0])
        raise ValueError(f"{self.type!r} has no values child")

    # -- access ---------------------------------------------------------
    def is_valid_mask(self) -> np.ndarray:
        m = self.data.validity_mask()
        if m is None:
            return np.ones(len(self), dtype=np.bool_)
        return m

    def to_numpy(self, zero_copy_only: bool = False) -> np.ndarray:
        """Primitive arrays -> numpy (nulls must be absent unless float)."""
        vals = self.data.values()
        if self.null_count:
            if zero_copy_only:
                raise ValueError("nulls present")
            if self.type.is_floating:
                vals = vals.copy()
                vals[~self.is_valid_mask()] = np.nan
            else:
                raise ValueError("nulls present in non-float array")
        return vals

    def to_pylist(self) -> List[Any]:
        return _to_pylist(self.data)

    def __getitem__(self, i):
        if isinstance(i, slice):
            start, stop, step = i.indices(len(self))
            if step != 1:
                raise ValueError("only unit-step slices")
            return Array(self.data.slice(start, stop - start))
        if i < 0:
            i += len(self)
        return self.to_pylist()[i] if 0 <= i < len(self) else _raise_oob(i)

    def slice(self, offset: int, length: Optional[int] = None) -> "Array":
        return Array(self.data.slice(offset, length))

    def equals(self, other: "Array") -> bool:
        """Deep equality. NaNs compare equal (round-trip identity); this is
        the ``nans_equal=True`` setting of the reference's EqualOptions
        (cpp/src/arrow/compare.h)."""
        if self.type != other.type or len(self) != len(other):
            return False
        return pylist_equal(self.to_pylist(), other.to_pylist())

    def __eq__(self, other):
        return isinstance(other, Array) and self.equals(other)

    def __repr__(self):
        vals = self.to_pylist()
        shown = vals if len(vals) <= 20 else vals[:10] + ["..."] + vals[-5:]
        return f"<arrow_tpu.Array {self.type!r}>\n{shown}"

    def cast(self, target: DataType) -> "Array":
        from ..compute import call_function
        return call_function("cast", [self], options={"to_type": target})

    def __arrow_c_array__(self, requested_schema=None):
        from ..c_data import array_capsules
        return array_capsules(self)

    # dlpack (reference: c/dlpack.cc) — primitive arrays without nulls
    def __dlpack__(self, stream=None):
        return self.to_numpy(zero_copy_only=True).__dlpack__()

    def __dlpack_device__(self):
        return self.to_numpy(zero_copy_only=True).__dlpack_device__()

    def buffers(self):
        return list(self.data.buffers)

    @property
    def nbytes(self) -> int:
        return sum(b.size for b in self.data.buffers if b is not None)

    def to_pandas(self):
        import numpy as np
        import pandas as pd
        t = self.type
        if t.id in (TypeId.TIMESTAMP, TypeId.DURATION):
            # pyarrow converts to datetime64/timedelta64 with NaT nulls
            kind = "datetime64" if t.id == TypeId.TIMESTAMP else \
                "timedelta64"
            vals = np.asarray(self.data.values(),
                              np.int64).astype(f"{kind}[{t.unit}]")
            if self.null_count:
                vals = vals.copy()
                vals[~self.is_valid_mask()] = "NaT"
            s = pd.Series(vals)
            if t.id == TypeId.TIMESTAMP and getattr(t, "tz", None):
                s = s.dt.tz_localize("UTC").dt.tz_convert(t.tz)
            return s
        if t.id == TypeId.DICTIONARY:
            cats = self.dictionary.to_pylist()
            codes = np.asarray(self.indices.data.values(), np.int64)
            if self.null_count:
                codes = codes.copy()
                codes[~self.is_valid_mask()] = -1
            return pd.Series(pd.Categorical.from_codes(
                codes, categories=pd.Index(cats)))
        if t.is_numeric and self.null_count == 0:
            return pd.Series(self.data.values())
        if t.is_floating:
            return pd.Series(self.to_numpy())
        return pd.Series(self.to_pylist(), dtype=object)

    # -- pyarrow-parity conveniences (delegate to the compute registry) --
    def _call(self, fname, *args, **opts):
        from ..compute import call_function
        return call_function(fname, [self, *args],
                             options=opts or None)

    def filter(self, mask, null_selection_behavior: str = "drop"):
        return self._call(
            "filter", mask,
            null_selection_behavior=null_selection_behavior)

    def take(self, indices):
        return self._call("take", indices)

    def drop_null(self):
        return self._call("drop_null")

    def sort(self, order: str = "ascending", **kwargs):
        from ..compute import call_function
        idx = call_function("array_sort_indices", [self],
                            options={"order": order, **kwargs})
        return self.take(idx)

    def unique(self):
        return self._call("unique")

    def value_counts(self):
        from ..compute import value_counts as _vc
        return _vc(self)

    def dictionary_encode(self):
        from ..compute import dictionary_encode as _de
        from ..types import TypeId
        if self.type.id == TypeId.DICTIONARY:
            return self
        return _de(self)

    def fill_null(self, fill_value):
        from ..compute import call_function
        return call_function("coalesce", [self, fill_value])

    def is_null(self, nan_is_null: bool = False):
        return self._call("is_null", nan_is_null=nan_is_null)

    def is_valid(self):
        return self._call("is_valid")

    def is_nan(self):
        return self._call("is_nan")

    def index(self, value, start=None, end=None):
        """First index of value in [start, end), -1 if absent
        (compute::index)."""
        a = self
        base = 0
        if start is not None or end is not None:
            base = start or 0
            a = a.slice(base, (end if end is not None else len(a)) - base)
        r = a._call("index", value=value)
        v = r.as_py() if hasattr(r, "as_py") else r
        return v + base if v >= 0 else -1

    def sum(self, **kwargs):
        return self._call("sum", **kwargs)

    def tolist(self):
        return self.to_pylist()

    def to_string(self, **kwargs) -> str:
        return repr(self)

    def view(self, target_type):
        """Zero-copy reinterpret to a same-width type (array.h View)."""
        from ..array.data import ArrayData
        from ..types import DataType
        if not isinstance(target_type, DataType):
            raise TypeError("view() expects a DataType")
        d = self.data
        return Array(ArrayData(target_type, d.length, list(d.buffers),
                               null_count=d._null_count, offset=d.offset,
                               children=list(d.children or []),
                               dictionary=d.dictionary))

    def diff(self, other) -> str:
        """Human-readable element diff (array/diff.h analogue)."""
        if self.equals(other):
            return ""
        a, b = self.to_pylist(), other.to_pylist()
        lines = []
        for i in range(max(len(a), len(b))):
            va = a[i] if i < len(a) else "<absent>"
            vb = b[i] if i < len(b) else "<absent>"
            if va != vb:
                lines.append(f"@ {i}: -{va!r} +{vb!r}")
        return "\n".join(lines)

    @staticmethod
    def from_pandas(obj, type=None):
        from .array import array as make_array
        import pandas as pd
        vals = [None if v is None or (isinstance(v, float) and v != v)
                else v for v in obj.tolist()] \
            if isinstance(obj, pd.Series) else list(obj)
        return make_array(vals, type)

    @staticmethod
    def from_buffers(type, length, buffers, null_count=-1, offset=0,
                     children=None):
        from ..array.data import ArrayData
        from ..buffer import Buffer
        bufs = [b if (b is None or isinstance(b, Buffer)) else Buffer(b)
                for b in buffers]
        return Array(ArrayData(
            type, length, bufs, null_count=null_count, offset=offset,
            children=[c.data for c in (children or [])]))

    def get_total_buffer_size(self) -> int:
        return self.nbytes

    @property
    def is_cpu(self) -> bool:
        return True

    @property
    def device_type(self):
        from ..device import DeviceAllocationType
        return DeviceAllocationType.CPU

    def copy_to(self, destination):
        return self

    def validate(self, *, full: bool = False):
        from .validate import validate, validate_full
        (validate_full if full else validate)(self.data)

    @property
    def statistics(self):
        return None  # ArrayStatistics attached by IPC readers; none here


def _raise_oob(i):
    raise IndexError(i)


def pylist_equal(a, b) -> bool:
    """Element equality with NaN == NaN, recursing into containers."""
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (a != a and b != b)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(pylist_equal(x, y)
                                        for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return (a.keys() == b.keys()
                and all(pylist_equal(a[k], b[k]) for k in a))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(pylist_equal(x, y)
                                        for x, y in zip(a, b))
    return a == b


def array(values, type: Optional[DataType] = None) -> Array:
    """Construct an Array from a Python sequence or numpy array."""
    if isinstance(values, Array):
        return values if type is None else values.cast(type)
    return Array(array_data_from_sequence(values, type))


def _to_pylist(d: ArrayData) -> List[Any]:
    t = d.type
    tid = t.id
    n = d.length
    if tid == TypeId.EXTENSION:
        storage = d.copy()
        storage.type = t.storage_type
        return _to_pylist(storage)
    if tid == TypeId.NA:
        return [None] * n
    mask = d.validity_mask()
    valid = (lambda i: True) if mask is None else (lambda i: bool(mask[i]))

    if tid == TypeId.INTERVAL_DAY_TIME:
        vals = d.buffers[1].to_numpy().view(np.int32).reshape(-1, 2)
        vals = vals[d.offset:d.offset + n]
        return [(int(vals[i][0]), int(vals[i][1])) if valid(i) else None
                for i in range(n)]
    if tid == TypeId.INTERVAL_MONTH_DAY_NANO:
        import struct as _st
        raw = d.buffers[1].to_numpy().reshape(-1, 16)
        raw = raw[d.offset:d.offset + n]
        return [tuple(_st.unpack("<iiq", raw[i].tobytes())) if valid(i)
                else None for i in range(n)]

    if tid == TypeId.BOOL or t.is_numeric or tid == TypeId.INTERVAL_MONTHS:
        vals = d.values()
        # bulk path: ndarray.tolist() converts the whole buffer in C
        # (~30x over per-element .item(), round-3 host-agg profile)
        out = np.asarray(vals[:n]).tolist()
        if mask is None:
            return out
        mvals = np.asarray(mask[:n])
        return [v if m else None for v, m in zip(out, mvals.tolist())]

    if t.is_temporal:
        import datetime as _dt
        vals = d.values()
        unit_us = {"s": 1_000_000, "ms": 1000, "us": 1, "ns": 0.001}
        def conv(x):
            x = int(x)
            if tid == TypeId.DATE32:
                return _dt.date(1970, 1, 1) + _dt.timedelta(days=x)
            if tid == TypeId.DATE64:
                return _dt.date(1970, 1, 1) + _dt.timedelta(milliseconds=x)
            if tid == TypeId.TIMESTAMP:
                us = x * unit_us[t.unit] if t.unit != "ns" else x // 1000
                out = (_dt.datetime(1970, 1, 1)
                       + _dt.timedelta(microseconds=int(us)))
                if t.tz is not None:
                    import zoneinfo
                    tzinfo = (_dt.timezone.utc if t.tz.upper() == "UTC"
                              else zoneinfo.ZoneInfo(t.tz))
                    out = out.replace(tzinfo=_dt.timezone.utc).astimezone(tzinfo)
                return out
            if tid == TypeId.DURATION:
                us = x * unit_us[t.unit] if t.unit != "ns" else x // 1000
                return _dt.timedelta(microseconds=int(us))
            # TIME32/TIME64
            us = x * unit_us[t.unit] if t.unit != "ns" else x // 1000
            us = int(us)
            return _dt.time(us // 3600_000_000, us // 60_000_000 % 60,
                            us // 1_000_000 % 60, us % 1_000_000)
        return [conv(vals[i]) if valid(i) else None for i in range(n)]

    if tid in (TypeId.STRING, TypeId.LARGE_STRING, TypeId.BINARY,
               TypeId.LARGE_BINARY):
        offs = d.offsets()
        raw = d.data_bytes().tobytes()
        is_str = tid in (TypeId.STRING, TypeId.LARGE_STRING)
        offl = np.asarray(offs[:n + 1]).tolist()
        if is_str:
            # one whole-buffer decode + str slicing beats 1M bytes
            # .decode() calls; for ASCII, byte offsets == char offsets
            # (checked by length), else per-row slices decode below
            try:
                text = raw.decode("utf-8")
            except UnicodeDecodeError:
                text = None  # e.g. junk bytes in null slots: row decode
            if text is not None and len(text) == len(raw):
                if mask is None:
                    return [text[offl[i]:offl[i + 1]] for i in range(n)]
                mv = np.asarray(mask[:n]).tolist()
                return [text[offl[i]:offl[i + 1]] if mv[i] else None
                        for i in range(n)]
            if mask is None:
                return [raw[offl[i]:offl[i + 1]].decode()
                        for i in range(n)]
            mv = np.asarray(mask[:n]).tolist()
            return [raw[offl[i]:offl[i + 1]].decode() if mv[i] else None
                    for i in range(n)]
        if mask is None:
            return [raw[offl[i]:offl[i + 1]] for i in range(n)]
        mv = np.asarray(mask[:n]).tolist()
        return [raw[offl[i]:offl[i + 1]] if mv[i] else None
                for i in range(n)]

    if tid in (TypeId.STRING_VIEW, TypeId.BINARY_VIEW):
        if n == 0 or d.buffers[1] is None:
            return []
        views = d.buffers[1].to_numpy().reshape(-1, 16)[d.offset:
                                                        d.offset + n]
        data_bufs = [b.to_numpy().tobytes() if b is not None else b""
                     for b in d.buffers[2:]]
        out = []
        for i in range(n):
            if not valid(i):
                out.append(None)
                continue
            row = views[i]
            ln = int(np.frombuffer(row[0:4].tobytes(), np.int32)[0])
            if ln <= 12:
                b = row[4:4 + ln].tobytes()
            else:
                bi = int(np.frombuffer(row[8:12].tobytes(), np.int32)[0])
                off = int(np.frombuffer(row[12:16].tobytes(), np.int32)[0])
                b = data_bufs[bi][off:off + ln]
            out.append(b.decode() if tid == TypeId.STRING_VIEW else b)
        return out

    if tid in (TypeId.LIST_VIEW, TypeId.LARGE_LIST_VIEW):
        if n == 0 or d.buffers[1] is None:
            return []
        off_dt = np.int64 if tid == TypeId.LARGE_LIST_VIEW else np.int32
        offs = d.buffers[1].view(off_dt)[d.offset:d.offset + n]
        sizes = d.buffers[2].view(off_dt)[d.offset:d.offset + n]
        child = _to_pylist(d.children[0])
        return [child[int(offs[i]):int(offs[i]) + int(sizes[i])]
                if valid(i) else None for i in range(n)]

    if tid == TypeId.FIXED_SIZE_BINARY:
        vals = d.values()
        return [vals[i].tobytes() if valid(i) else None for i in range(n)]

    if tid in (TypeId.DECIMAL128, TypeId.DECIMAL256, TypeId.DECIMAL32, TypeId.DECIMAL64):
        import decimal as _decimal
        vals = d.values()
        out = []
        for i in range(n):
            if not valid(i):
                out.append(None)
            else:
                unscaled = int.from_bytes(vals[i].tobytes(), "little",
                                          signed=True)
                out.append(_decimal.Decimal(unscaled).scaleb(-t.scale))
        return out

    if tid in (TypeId.LIST, TypeId.LARGE_LIST):
        offs = d.offsets()
        child = _to_pylist(d.children[0])
        return [child[offs[i]:offs[i + 1]] if valid(i) else None
                for i in range(n)]

    if tid == TypeId.MAP:
        offs = d.offsets()
        entries = _to_pylist(d.children[0])
        return [[(e["key"], e["value"]) for e in entries[offs[i]:offs[i + 1]]]
                if valid(i) else None for i in range(n)]

    if tid == TypeId.FIXED_SIZE_LIST:
        sz = t.list_size
        child = _to_pylist(d.children[0].slice(d.offset * sz, n * sz))
        return [child[i * sz:(i + 1) * sz] if valid(i) else None
                for i in range(n)]

    if tid == TypeId.STRUCT:
        cols = [_to_pylist(c.slice(d.offset, n)) for c in d.children]
        names = [f.name for f in t.fields]
        return [{nm: col[i] for nm, col in zip(names, cols)} if valid(i)
                else None for i in range(n)]

    if tid == TypeId.DICTIONARY:
        dict_vals = _to_pylist(d.dictionary)
        idx = d.values()
        return [dict_vals[idx[i]] if valid(i) else None for i in range(n)]

    if tid in (TypeId.SPARSE_UNION, TypeId.DENSE_UNION):
        type_ids = d.type_ids()
        code_to_child = {c: j for j, c in enumerate(t.type_codes)}
        kids = [_to_pylist(c) for c in d.children]
        out = []
        if tid == TypeId.DENSE_UNION:
            offs = d.buffers[1].view(np.int32)[d.offset:d.offset + n]
            for i in range(n):
                out.append(kids[code_to_child[type_ids[i]]][offs[i]])
        else:
            for i in range(n):
                out.append(kids[code_to_child[type_ids[i]]][d.offset + i])
        return out

    if tid == TypeId.RUN_END_ENCODED:
        run_ends = _to_pylist(d.children[0])
        vals = _to_pylist(d.children[1])
        out = []
        prev = 0
        for re_, v in zip(run_ends, vals):
            # runs cover logical positions [prev, re_)
            for pos in range(prev, re_):
                if d.offset <= pos < d.offset + n:
                    out.append(v)
            prev = re_
        return out

    raise NotImplementedError(f"to_pylist for {t!r}")
