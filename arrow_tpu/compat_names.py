"""pyarrow module-level name parity.

pyarrow exposes a per-type class hierarchy (Int32Array, StringScalar,
Decimal128Type, ...); this engine uses one Array / one Scalar / a small
set of DataType classes. These compat classes make the pyarrow names
importable AND make ``isinstance`` checks behave correctly by testing
the value's runtime type id (python/pyarrow/array.pxi / scalar.pxi /
types.pxi class surfaces).
"""

from __future__ import annotations

from .array.array import Array
from .compute.registry import Scalar
from .extension import ExtensionType
from .types import DataType, TypeId
from . import types as _T

_GROUPS = {
    "Null": (TypeId.NA,),
    "Boolean": (TypeId.BOOL,),
    "Int8": (TypeId.INT8,), "Int16": (TypeId.INT16,),
    "Int32": (TypeId.INT32,), "Int64": (TypeId.INT64,),
    "UInt8": (TypeId.UINT8,), "UInt16": (TypeId.UINT16,),
    "UInt32": (TypeId.UINT32,), "UInt64": (TypeId.UINT64,),
    "HalfFloat": (TypeId.HALF_FLOAT,), "Float": (TypeId.FLOAT,),
    "Double": (TypeId.DOUBLE,),
    "Integer": (TypeId.INT8, TypeId.INT16, TypeId.INT32, TypeId.INT64,
                TypeId.UINT8, TypeId.UINT16, TypeId.UINT32,
                TypeId.UINT64),
    "FloatingPoint": (TypeId.HALF_FLOAT, TypeId.FLOAT, TypeId.DOUBLE),
    "Numeric": (TypeId.INT8, TypeId.INT16, TypeId.INT32, TypeId.INT64,
                TypeId.UINT8, TypeId.UINT16, TypeId.UINT32,
                TypeId.UINT64, TypeId.HALF_FLOAT, TypeId.FLOAT,
                TypeId.DOUBLE),
    "String": (TypeId.STRING,), "LargeString": (TypeId.LARGE_STRING,),
    "StringView": (TypeId.STRING_VIEW,),
    "Binary": (TypeId.BINARY,), "LargeBinary": (TypeId.LARGE_BINARY,),
    "BinaryView": (TypeId.BINARY_VIEW,),
    "FixedSizeBinary": (TypeId.FIXED_SIZE_BINARY,),
    "Date32": (TypeId.DATE32,), "Date64": (TypeId.DATE64,),
    "Time32": (TypeId.TIME32,), "Time64": (TypeId.TIME64,),
    "Timestamp": (TypeId.TIMESTAMP,), "Duration": (TypeId.DURATION,),
    "MonthDayNanoInterval": (TypeId.INTERVAL_MONTH_DAY_NANO,),
    "Decimal32": (TypeId.DECIMAL32,), "Decimal64": (TypeId.DECIMAL64,),
    "Decimal128": (TypeId.DECIMAL128,),
    "Decimal256": (TypeId.DECIMAL256,),
    "List": (TypeId.LIST,), "LargeList": (TypeId.LARGE_LIST,),
    "ListView": (TypeId.LIST_VIEW,),
    "LargeListView": (TypeId.LARGE_LIST_VIEW,),
    "FixedSizeList": (TypeId.FIXED_SIZE_LIST,),
    "Struct": (TypeId.STRUCT,), "Map": (TypeId.MAP,),
    "Union": (TypeId.SPARSE_UNION, TypeId.DENSE_UNION),
    "SparseUnion": (TypeId.SPARSE_UNION,),
    "DenseUnion": (TypeId.DENSE_UNION,),
    "Dictionary": (TypeId.DICTIONARY,),
    "RunEndEncoded": (TypeId.RUN_END_ENCODED,),
}

_EXT_GROUPS = {  # extension-name-keyed (Bool8Array, UuidScalar, ...)
    "Bool8": "arrow.bool8", "Uuid": "arrow.uuid", "Json": "arrow.json",
    "Opaque": "arrow.opaque",
    "FixedShapeTensor": "arrow.fixed_shape_tensor",
}


def _type_of(obj):
    t = getattr(obj, "type", None)
    return t if isinstance(t, DataType) else None


class _TypedMeta(type):
    def __instancecheck__(cls, obj):
        ids = cls.__type_ids__
        ext = cls.__ext_name__
        base = cls.__compat_base__
        if not isinstance(obj, base):
            return False
        t = _type_of(obj) if base is not DataType else obj
        if t is None:
            return False
        if ext is not None:
            return (isinstance(t, ExtensionType) and
                    t.extension_name == ext)
        return t.id in ids

    def __subclasscheck__(cls, sub):
        return cls is sub or sub in getattr(cls, "__mro__", ())


def _make(name, base, ids=(), ext=None):
    cls = _TypedMeta(name, (base,), {
        "__type_ids__": tuple(ids), "__ext_name__": ext,
        "__compat_base__": base,
        "__doc__": f"pyarrow-compat alias: {name} "
                   f"(isinstance checks the runtime type id)."})
    return cls


_EXPORTS = {}
for _g, _ids in _GROUPS.items():
    _EXPORTS[f"{_g}Array"] = _make(f"{_g}Array", Array, _ids)
    _EXPORTS[f"{_g}Scalar"] = _make(f"{_g}Scalar", Scalar, _ids)
for _g, _ext in _EXT_GROUPS.items():
    if _g != "FixedShapeTensor":
        # FixedShapeTensorArray is a real class (extension.py) with
        # ndarray conversions — don't shadow it
        _EXPORTS[f"{_g}Array"] = _make(f"{_g}Array", Array, ext=_ext)
    _EXPORTS[f"{_g}Scalar"] = _make(f"{_g}Scalar", Scalar, ext=_ext)
_EXPORTS["ExtensionScalar"] = _make("ExtensionScalar", Scalar,
                                    [TypeId.EXTENSION])

# type classes missing from arrow_tpu.types (per-parameterization names)
_EXPORTS["Decimal32Type"] = _make("Decimal32Type", DataType,
                                  [TypeId.DECIMAL32])
_EXPORTS["Decimal64Type"] = _make("Decimal64Type", DataType,
                                  [TypeId.DECIMAL64])
_EXPORTS["Decimal128Type"] = _make("Decimal128Type", DataType,
                                   [TypeId.DECIMAL128])
_EXPORTS["Decimal256Type"] = _make("Decimal256Type", DataType,
                                   [TypeId.DECIMAL256])
_EXPORTS["SparseUnionType"] = _make("SparseUnionType", DataType,
                                    [TypeId.SPARSE_UNION])
_EXPORTS["DenseUnionType"] = _make("DenseUnionType", DataType,
                                   [TypeId.DENSE_UNION])
_EXPORTS["ListViewType"] = _make("ListViewType", DataType,
                                 [TypeId.LIST_VIEW])
_EXPORTS["LargeListType"] = _make("LargeListType", DataType,
                                  [TypeId.LARGE_LIST])
_EXPORTS["LargeListViewType"] = _make("LargeListViewType", DataType,
                                      [TypeId.LARGE_LIST_VIEW])
_EXPORTS["Time32Type"] = _make("Time32Type", DataType, [TypeId.TIME32])
_EXPORTS["Time64Type"] = _make("Time64Type", DataType, [TypeId.TIME64])

BaseExtensionType = ExtensionType


class UnknownExtensionType(ExtensionType):
    """Fallback for unregistered extension names
    (extension_type.h UnregisteredExtensionType analogue)."""

    def __init__(self, storage_type, serialized: bytes = b""):
        super().__init__(storage_type, "arrow.unknown")
        object.__setattr__(self, "serialized", serialized)

    def extension_metadata(self) -> bytes:
        return self.serialized


def union(child_fields, mode: str = "sparse", type_codes=None):
    """Union type factory (pyarrow.union)."""
    if mode in ("sparse", 0):
        return _T.sparse_union(child_fields, type_codes)
    return _T.dense_union(child_fields, type_codes)


def arange(start, stop=None, step=1, *, type=None):
    """pyarrow.arange analogue."""
    from .array.array import array as _array
    if stop is None:
        start, stop = 0, start
    return _array(list(range(start, stop, step)), type or _T.int64())


globals().update(_EXPORTS)
__all__ = (list(_EXPORTS) +
           ["BaseExtensionType", "UnknownExtensionType", "union",
            "arange"])


# --- misc module-level names (pyarrow lib.pyx surface) ----------------------

class MonthDayNano:
    """Interval value triple (pyarrow.MonthDayNano)."""

    __slots__ = ("months", "days", "nanoseconds")

    def __init__(self, value):
        self.months, self.days, self.nanoseconds = value

    def __iter__(self):
        return iter((self.months, self.days, self.nanoseconds))

    def __eq__(self, other):
        return tuple(self) == tuple(MonthDayNano(other)
                                    if not isinstance(other, MonthDayNano)
                                    else other)

    def __repr__(self):
        return (f"MonthDayNano(months={self.months}, days={self.days}, "
                f"nanoseconds={self.nanoseconds})")


class KeyValueMetadata(dict):
    """Binary key/value metadata map (util/key_value_metadata.h)."""

    def __init__(self, mapping=None, **kwargs):
        items = {}
        for src in (mapping or {}), kwargs:
            for k, v in dict(src).items():
                items[k.encode() if isinstance(k, str) else bytes(k)] = \
                    v.encode() if isinstance(v, str) else bytes(v)
        super().__init__(items)

    def key(self, i):
        return list(self.keys())[i]

    def value(self, i):
        return list(self.values())[i]

    def to_dict(self):
        return dict(self)


class DictionaryMemo:
    """Tracks dictionary ids across IPC batches (ipc/dictionary.h).
    Opaque at the python level, as in pyarrow."""

    def __init__(self):
        self._dicts = {}


from .io.caching import CacheOptions  # noqa: E402


def _cache_options_from_network_metrics(
        time_to_first_byte_millis, transfer_bandwidth_mib_per_sec,
        ideal_bandwidth_utilization_frac=0.9,
        max_ideal_request_size_mib=64):
    return CacheOptions()


CacheOptions.from_network_metrics = staticmethod(
    _cache_options_from_network_metrics)


def have_libhdfs() -> bool:
    return False


def is_opentelemetry_enabled() -> bool:
    return False


def enable_signal_handlers(enable: bool) -> None:
    return None


def create_library_symlinks() -> None:
    return None


def get_include() -> str:
    import os
    return os.path.join(os.path.dirname(__file__), "include")


def get_libraries():
    return []


def get_library_dirs():
    return []


def set_timezone_db_path(path) -> None:
    return None


def jemalloc_set_decay_ms(decay_ms: int) -> None:
    raise NotImplementedError("jemalloc backend not available "
                              "(XLA's BFC allocator manages memory)")


__all__ += ["MonthDayNano", "KeyValueMetadata", "DictionaryMemo",
            "CacheOptions", "have_libhdfs", "is_opentelemetry_enabled",
            "enable_signal_handlers", "create_library_symlinks",
            "get_include", "get_libraries", "get_library_dirs",
            "set_timezone_db_path", "jemalloc_set_decay_ms"]
