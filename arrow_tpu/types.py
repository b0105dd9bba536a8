"""Logical type system for the TPU-native columnar engine.

Mirrors the semantics of the Arrow type system (reference:
cpp/src/arrow/type.h:136 ``DataType``, cpp/src/arrow/type_fwd.h:328-467 type
ids) but is a fresh, Python-first design: types are lightweight immutable
values; physical layout decisions (device padding, mask representation) live
in :mod:`arrow_tpu.device`, not here.
"""

from __future__ import annotations

import enum
from typing import Iterator, Mapping, Optional, Sequence, Union

import numpy as np

__all__ = [
    "TypeId", "DataType", "Field", "Schema",
    "null", "bool_", "int8", "int16", "int32", "int64",
    "uint8", "uint16", "uint32", "uint64",
    "float16", "float32", "float64",
    "string", "large_string", "binary", "large_binary", "fixed_size_binary",
    "date32", "date64", "timestamp", "time32", "time64", "duration",
    "month_interval", "day_time_interval", "month_day_nano_interval",
    "decimal32", "decimal64", "decimal128", "decimal256",
    "list_", "large_list", "fixed_size_list", "struct", "map_",
    "string_view", "binary_view", "list_view", "large_list_view",
    "dictionary", "sparse_union", "dense_union", "run_end_encoded",
    "field", "schema",
]


class TypeId(enum.IntEnum):
    """Type ids, numerically identical to the reference enum
    (cpp/src/arrow/type_fwd.h:328-467) so IPC / interop code can rely on
    matching discriminants."""

    NA = 0
    BOOL = 1
    UINT8 = 2
    INT8 = 3
    UINT16 = 4
    INT16 = 5
    UINT32 = 6
    INT32 = 7
    UINT64 = 8
    INT64 = 9
    HALF_FLOAT = 10
    FLOAT = 11
    DOUBLE = 12
    STRING = 13
    BINARY = 14
    FIXED_SIZE_BINARY = 15
    DATE32 = 16
    DATE64 = 17
    TIMESTAMP = 18
    TIME32 = 19
    TIME64 = 20
    INTERVAL_MONTHS = 21
    INTERVAL_DAY_TIME = 22
    DECIMAL128 = 23
    DECIMAL256 = 24
    DECIMAL32 = 43
    DECIMAL64 = 44
    LIST = 25
    STRUCT = 26
    SPARSE_UNION = 27
    DENSE_UNION = 28
    DICTIONARY = 29
    MAP = 30
    EXTENSION = 31
    FIXED_SIZE_LIST = 32
    DURATION = 33
    LARGE_STRING = 34
    LARGE_BINARY = 35
    LARGE_LIST = 36
    INTERVAL_MONTH_DAY_NANO = 37
    RUN_END_ENCODED = 38
    STRING_VIEW = 39
    BINARY_VIEW = 40
    LIST_VIEW = 41
    LARGE_LIST_VIEW = 42


_INT_IDS = {
    TypeId.INT8, TypeId.INT16, TypeId.INT32, TypeId.INT64,
    TypeId.UINT8, TypeId.UINT16, TypeId.UINT32, TypeId.UINT64,
}
_FLOAT_IDS = {TypeId.HALF_FLOAT, TypeId.FLOAT, TypeId.DOUBLE}

_NUMPY_DTYPES = {
    TypeId.BOOL: np.dtype(np.bool_),
    TypeId.INT8: np.dtype(np.int8),
    TypeId.INT16: np.dtype(np.int16),
    TypeId.INT32: np.dtype(np.int32),
    TypeId.INT64: np.dtype(np.int64),
    TypeId.UINT8: np.dtype(np.uint8),
    TypeId.UINT16: np.dtype(np.uint16),
    TypeId.UINT32: np.dtype(np.uint32),
    TypeId.UINT64: np.dtype(np.uint64),
    TypeId.HALF_FLOAT: np.dtype(np.float16),
    TypeId.FLOAT: np.dtype(np.float32),
    TypeId.DOUBLE: np.dtype(np.float64),
    TypeId.DATE32: np.dtype(np.int32),
    TypeId.DATE64: np.dtype(np.int64),
    TypeId.TIMESTAMP: np.dtype(np.int64),
    TypeId.TIME32: np.dtype(np.int32),
    TypeId.TIME64: np.dtype(np.int64),
    TypeId.DURATION: np.dtype(np.int64),
    TypeId.INTERVAL_MONTHS: np.dtype(np.int32),
}

_BIT_WIDTHS = {
    TypeId.BOOL: 1,
    TypeId.INT8: 8, TypeId.UINT8: 8,
    TypeId.INT16: 16, TypeId.UINT16: 16,
    TypeId.INT32: 32, TypeId.UINT32: 32,
    TypeId.INT64: 64, TypeId.UINT64: 64,
    TypeId.HALF_FLOAT: 16, TypeId.FLOAT: 32, TypeId.DOUBLE: 64,
    TypeId.DATE32: 32, TypeId.DATE64: 64,
    TypeId.TIMESTAMP: 64, TypeId.TIME32: 32, TypeId.TIME64: 64,
    TypeId.DURATION: 64, TypeId.INTERVAL_MONTHS: 32,
    TypeId.INTERVAL_DAY_TIME: 64, TypeId.INTERVAL_MONTH_DAY_NANO: 128,
    TypeId.DECIMAL128: 128, TypeId.DECIMAL256: 256,
    TypeId.DECIMAL32: 32, TypeId.DECIMAL64: 64,
}


class DataType:
    """A logical column type. Immutable and hashable.

    Unlike the reference (which uses a class per type), parametric state is
    held in slots on a single class hierarchy kept deliberately shallow; the
    ``id`` discriminant drives all layout decisions.
    """

    __slots__ = ("id",)

    def __init__(self, type_id: TypeId):
        object.__setattr__(self, "id", TypeId(type_id))

    def __setattr__(self, *a):  # immutability
        raise AttributeError("DataType is immutable")

    # --- structural info -------------------------------------------------
    @property
    def num_fields(self) -> int:
        return len(self.fields)

    def field(self, i: int) -> "Field":
        """Child field accessor (pyarrow DataType.field)."""
        return self.fields[i]

    @property
    def num_buffers(self) -> int:
        """Number of physical layout buffers (layout per the columnar
        spec; pyarrow DataType.num_buffers)."""
        tid = self.id
        if tid in (TypeId.NA,):
            return 0
        if tid in (TypeId.STRUCT, TypeId.SPARSE_UNION,
                   TypeId.RUN_END_ENCODED, TypeId.FIXED_SIZE_LIST):
            return 1
        if tid in (TypeId.STRING, TypeId.BINARY, TypeId.LARGE_STRING,
                   TypeId.LARGE_BINARY):
            return 3
        if tid in (TypeId.LIST_VIEW, TypeId.LARGE_LIST_VIEW):
            return 3
        return 2

    @property
    def has_variadic_buffers(self) -> bool:
        return self.id in (TypeId.STRING_VIEW, TypeId.BINARY_VIEW)

    def to_pandas_dtype(self):
        """Matching NumPy/pandas dtype (pyarrow to_pandas_dtype)."""
        import numpy as _np
        if self.id == TypeId.TIMESTAMP:
            return _np.dtype(f"datetime64[{self.unit}]").type
        if self.id == TypeId.DURATION:
            return _np.dtype(f"timedelta64[{self.unit}]").type
        np_dt = _NUMPY_DTYPES.get(self.id)
        if np_dt is not None:
            return np_dt.type if hasattr(np_dt, "type") else np_dt
        return _np.object_

    @property
    def fields(self) -> Sequence["Field"]:
        return ()

    @property
    def name(self) -> str:
        return _TYPE_NAMES.get(self.id, self.id.name.lower())

    # --- predicates ------------------------------------------------------
    @property
    def is_primitive(self) -> bool:
        """Fixed-width value buffer, no child arrays."""
        return self.id in _BIT_WIDTHS or self.id == TypeId.FIXED_SIZE_BINARY

    @property
    def is_integer(self) -> bool:
        return self.id in _INT_IDS

    @property
    def is_signed_integer(self) -> bool:
        return self.id in (TypeId.INT8, TypeId.INT16, TypeId.INT32, TypeId.INT64)

    @property
    def is_unsigned_integer(self) -> bool:
        return self.id in (TypeId.UINT8, TypeId.UINT16, TypeId.UINT32, TypeId.UINT64)

    @property
    def is_floating(self) -> bool:
        return self.id in _FLOAT_IDS

    @property
    def is_numeric(self) -> bool:
        return self.id in _INT_IDS or self.id in _FLOAT_IDS

    @property
    def is_temporal(self) -> bool:
        return self.id in (TypeId.DATE32, TypeId.DATE64, TypeId.TIMESTAMP,
                           TypeId.TIME32, TypeId.TIME64, TypeId.DURATION)

    @property
    def is_binary_like(self) -> bool:
        return self.id in (TypeId.STRING, TypeId.BINARY)

    @property
    def is_binary_view_like(self) -> bool:
        return self.id in (TypeId.STRING_VIEW, TypeId.BINARY_VIEW)

    @property
    def is_large_binary_like(self) -> bool:
        return self.id in (TypeId.LARGE_STRING, TypeId.LARGE_BINARY)

    @property
    def is_nested(self) -> bool:
        return self.id in (TypeId.LIST, TypeId.LARGE_LIST, TypeId.FIXED_SIZE_LIST,
                           TypeId.STRUCT, TypeId.MAP, TypeId.SPARSE_UNION,
                           TypeId.DENSE_UNION, TypeId.RUN_END_ENCODED,
                           TypeId.LIST_VIEW, TypeId.LARGE_LIST_VIEW)

    @property
    def bit_width(self) -> int:
        if self.id in _BIT_WIDTHS:
            return _BIT_WIDTHS[self.id]
        raise ValueError(f"{self} is not fixed-width")

    @property
    def byte_width(self) -> int:
        return self.bit_width // 8

    def to_numpy_dtype(self) -> np.dtype:
        if self.id in _NUMPY_DTYPES:
            return _NUMPY_DTYPES[self.id]
        raise ValueError(f"no 1:1 numpy dtype for {self}")

    # --- identity --------------------------------------------------------
    def _key(self) -> tuple:
        return (int(self.id),)

    def __eq__(self, other) -> bool:
        return isinstance(other, DataType) and self._key() == other._key()

    def __hash__(self) -> int:
        return hash(self._key())

    def __repr__(self) -> str:
        return self.name

    def equals(self, other: "DataType") -> bool:
        return self == other


class FixedSizeBinaryType(DataType):
    __slots__ = ("byte_width_",)

    def __init__(self, byte_width: int, type_id: TypeId = TypeId.FIXED_SIZE_BINARY):
        super().__init__(type_id)
        object.__setattr__(self, "byte_width_", int(byte_width))

    @property
    def bit_width(self) -> int:
        return self.byte_width_ * 8

    @property
    def byte_width(self) -> int:
        return self.byte_width_

    def _key(self):
        return (int(self.id), self.byte_width_)

    def __repr__(self):
        return f"fixed_size_binary[{self.byte_width_}]"


class DecimalType(FixedSizeBinaryType):
    __slots__ = ("precision", "scale")

    def __init__(self, precision: int, scale: int, type_id: TypeId):
        width = {TypeId.DECIMAL32: 4, TypeId.DECIMAL64: 8,
                 TypeId.DECIMAL128: 16, TypeId.DECIMAL256: 32}[type_id]
        super().__init__(width, type_id)
        object.__setattr__(self, "precision", int(precision))
        object.__setattr__(self, "scale", int(scale))

    def _key(self):
        return (int(self.id), self.precision, self.scale)

    def __repr__(self):
        n = {TypeId.DECIMAL32: 32, TypeId.DECIMAL64: 64,
             TypeId.DECIMAL128: 128, TypeId.DECIMAL256: 256}[self.id]
        return f"decimal{n}({self.precision}, {self.scale})"


class TimestampType(DataType):
    __slots__ = ("unit", "tz")

    def __init__(self, unit: str = "us", tz: Optional[str] = None):
        if unit not in ("s", "ms", "us", "ns"):
            raise ValueError(f"bad unit {unit!r}")
        super().__init__(TypeId.TIMESTAMP)
        object.__setattr__(self, "unit", unit)
        object.__setattr__(self, "tz", tz)

    def _key(self):
        return (int(self.id), self.unit, self.tz)

    def __repr__(self):
        return f"timestamp[{self.unit}]" + (f", tz={self.tz}" if self.tz else "")


class TimeType(DataType):
    __slots__ = ("unit",)

    def __init__(self, type_id: TypeId, unit: str):
        super().__init__(type_id)
        valid = ("s", "ms") if type_id == TypeId.TIME32 else ("us", "ns")
        if unit not in valid:
            raise ValueError(f"bad unit {unit!r} for {type_id.name}")
        object.__setattr__(self, "unit", unit)

    def _key(self):
        return (int(self.id), self.unit)

    def __repr__(self):
        n = 32 if self.id == TypeId.TIME32 else 64
        return f"time{n}[{self.unit}]"


class DurationType(DataType):
    __slots__ = ("unit",)

    def __init__(self, unit: str = "us"):
        if unit not in ("s", "ms", "us", "ns"):
            raise ValueError(f"bad unit {unit!r}")
        super().__init__(TypeId.DURATION)
        object.__setattr__(self, "unit", unit)

    def _key(self):
        return (int(self.id), self.unit)

    def __repr__(self):
        return f"duration[{self.unit}]"


class ListType(DataType):
    __slots__ = ("value_field",)

    def __init__(self, value_field: "Field", type_id: TypeId = TypeId.LIST):
        super().__init__(type_id)
        object.__setattr__(self, "value_field", value_field)

    @property
    def value_type(self) -> DataType:
        return self.value_field.type

    @property
    def fields(self):
        return (self.value_field,)

    def _key(self):
        return (int(self.id), self.value_field._key())

    def __repr__(self):
        base = {TypeId.LIST: "list", TypeId.LARGE_LIST: "large_list",
                TypeId.MAP: "map", TypeId.LIST_VIEW: "list_view",
                TypeId.LARGE_LIST_VIEW: "large_list_view"}[self.id]
        return f"{base}<{self.value_field.type!r}>"


class MapType(ListType):
    __slots__ = ("keys_sorted",)

    def __init__(self, key_type: DataType, item_type: DataType,
                 keys_sorted: bool = False):
        entries = Field("entries", StructType([
            Field("key", key_type, nullable=False),
            Field("value", item_type, nullable=True),
        ]), nullable=False)
        super().__init__(entries, TypeId.MAP)
        object.__setattr__(self, "keys_sorted", bool(keys_sorted))

    @property
    def key_type(self) -> DataType:
        return self.value_type.fields[0].type

    @property
    def item_type(self) -> DataType:
        return self.value_type.fields[1].type

    def _key(self):
        return (int(self.id), self.value_field._key(), self.keys_sorted)

    def __repr__(self):
        return f"map<{self.key_type!r}, {self.item_type!r}>"


class FixedSizeListType(DataType):
    __slots__ = ("value_field", "list_size")

    def __init__(self, value_field: "Field", list_size: int):
        super().__init__(TypeId.FIXED_SIZE_LIST)
        object.__setattr__(self, "value_field", value_field)
        object.__setattr__(self, "list_size", int(list_size))

    @property
    def value_type(self) -> DataType:
        return self.value_field.type

    @property
    def fields(self):
        return (self.value_field,)

    def _key(self):
        return (int(self.id), self.value_field._key(), self.list_size)

    def __repr__(self):
        return f"fixed_size_list<{self.value_type!r}>[{self.list_size}]"


class StructType(DataType):
    __slots__ = ("fields_",)

    def __init__(self, fields: Sequence["Field"]):
        super().__init__(TypeId.STRUCT)
        object.__setattr__(self, "fields_", tuple(fields))

    @property
    def fields(self):
        return self.fields_

    def field(self, i: Union[int, str]) -> "Field":
        if isinstance(i, str):
            for f in self.fields_:
                if f.name == i:
                    return f
            raise KeyError(i)
        return self.fields_[i]

    def get_field_index(self, name: str) -> int:
        for i, f in enumerate(self.fields_):
            if f.name == name:
                return i
        return -1

    def _key(self):
        return (int(self.id), tuple(f._key() for f in self.fields_))

    def __repr__(self):
        inner = ", ".join(f"{f.name}: {f.type!r}" for f in self.fields_)
        return f"struct<{inner}>"


class UnionType(DataType):
    __slots__ = ("fields_", "type_codes")

    def __init__(self, fields: Sequence["Field"], type_codes: Sequence[int],
                 mode: str):
        super().__init__(TypeId.SPARSE_UNION if mode == "sparse"
                         else TypeId.DENSE_UNION)
        object.__setattr__(self, "fields_", tuple(fields))
        object.__setattr__(self, "type_codes", tuple(int(c) for c in type_codes))

    @property
    def mode(self) -> str:
        return "sparse" if self.id == TypeId.SPARSE_UNION else "dense"

    @property
    def fields(self):
        return self.fields_

    def _key(self):
        return (int(self.id), tuple(f._key() for f in self.fields_),
                self.type_codes)

    def __repr__(self):
        inner = ", ".join(f"{f.name}: {f.type!r}" for f in self.fields_)
        return f"{self.mode}_union<{inner}>"


class DictionaryType(DataType):
    """Dictionary-encoded column: indices into a values array.

    On TPU this is the preferred physical form for strings (SURVEY §7
    stage 1: variable-length data is dictionary-encoded at ingest)."""

    __slots__ = ("index_type", "value_type", "ordered")

    def __init__(self, index_type: DataType, value_type: DataType,
                 ordered: bool = False):
        if not index_type.is_integer:
            raise ValueError("dictionary indices must be integer")
        super().__init__(TypeId.DICTIONARY)
        object.__setattr__(self, "index_type", index_type)
        object.__setattr__(self, "value_type", value_type)
        object.__setattr__(self, "ordered", bool(ordered))

    @property
    def bit_width(self) -> int:
        return self.index_type.bit_width

    def _key(self):
        return (int(self.id), self.index_type._key(), self.value_type._key(),
                self.ordered)

    def __repr__(self):
        return f"dictionary<values={self.value_type!r}, indices={self.index_type!r}>"


class RunEndEncodedType(DataType):
    __slots__ = ("run_end_type", "value_type")

    def __init__(self, run_end_type: DataType, value_type: DataType):
        if run_end_type.id not in (TypeId.INT16, TypeId.INT32, TypeId.INT64):
            raise ValueError("run ends must be int16/int32/int64")
        super().__init__(TypeId.RUN_END_ENCODED)
        object.__setattr__(self, "run_end_type", run_end_type)
        object.__setattr__(self, "value_type", value_type)

    @property
    def fields(self):
        return (Field("run_ends", self.run_end_type, nullable=False),
                Field("values", self.value_type))

    def _key(self):
        return (int(self.id), self.run_end_type._key(), self.value_type._key())

    def __repr__(self):
        return f"run_end_encoded<{self.run_end_type!r}, {self.value_type!r}>"


_TYPE_NAMES = {
    TypeId.NA: "null", TypeId.BOOL: "bool",
    TypeId.INT8: "int8", TypeId.INT16: "int16", TypeId.INT32: "int32",
    TypeId.INT64: "int64", TypeId.UINT8: "uint8", TypeId.UINT16: "uint16",
    TypeId.UINT32: "uint32", TypeId.UINT64: "uint64",
    TypeId.HALF_FLOAT: "halffloat", TypeId.FLOAT: "float", TypeId.DOUBLE: "double",
    TypeId.STRING: "string", TypeId.BINARY: "binary",
    TypeId.LARGE_STRING: "large_string", TypeId.LARGE_BINARY: "large_binary",
    TypeId.DATE32: "date32[day]", TypeId.DATE64: "date64[ms]",
    TypeId.INTERVAL_MONTHS: "month_interval",
    TypeId.INTERVAL_DAY_TIME: "day_time_interval",
    TypeId.INTERVAL_MONTH_DAY_NANO: "month_day_nano_interval",
    TypeId.STRING_VIEW: "string_view", TypeId.BINARY_VIEW: "binary_view",
}


class Field:
    """Named, nullable-annotated slot in a schema or nested type
    (reference: cpp/src/arrow/type.h:364)."""

    __slots__ = ("name", "type", "nullable", "metadata")

    def __init__(self, name: str, type: DataType, nullable: bool = True,
                 metadata: Optional[Mapping[bytes, bytes]] = None):
        object.__setattr__(self, "name", name)
        object.__setattr__(self, "type", type)
        object.__setattr__(self, "nullable", bool(nullable))
        object.__setattr__(self, "metadata", _norm_metadata(metadata))

    def __setattr__(self, *a):
        raise AttributeError("Field is immutable")

    def with_name(self, name: str) -> "Field":
        return Field(name, self.type, self.nullable, self.metadata)

    def with_type(self, type: DataType) -> "Field":
        return Field(self.name, type, self.nullable, self.metadata)

    def with_nullable(self, nullable: bool) -> "Field":
        return Field(self.name, self.type, nullable, self.metadata)

    def with_metadata(self, metadata) -> "Field":
        return Field(self.name, self.type, self.nullable, metadata)

    def remove_metadata(self) -> "Field":
        return Field(self.name, self.type, self.nullable, None)

    def flatten(self) -> list:
        """Struct fields -> prefixed child fields (type.h Field::Flatten)."""
        if self.type.id == TypeId.STRUCT:
            return [Field(f"{self.name}.{c.name}", c.type, True,
                          c.metadata) for c in self.type.fields]
        return [self]

    def _key(self):
        return (self.name, self.type._key(), self.nullable,
                tuple(sorted(self.metadata.items())) if self.metadata else ())

    def __eq__(self, other):
        return isinstance(other, Field) and self._key() == other._key()

    def __hash__(self):
        return hash(self._key())

    def __repr__(self):
        null = "" if self.nullable else " not null"
        return f"Field({self.name}: {self.type!r}{null})"

    def equals(self, other: "Field") -> bool:
        return self == other


def _norm_metadata(md) -> Optional[dict]:
    if md is None:
        return None
    out = {}
    for k, v in md.items():
        k = k.encode() if isinstance(k, str) else bytes(k)
        v = v.encode() if isinstance(v, str) else bytes(v)
        out[k] = v
    return out


class Schema:
    """Ordered collection of fields + metadata
    (reference: cpp/src/arrow/type.h:2330)."""

    __slots__ = ("fields", "metadata")

    def __init__(self, fields: Sequence[Field],
                 metadata: Optional[Mapping] = None):
        object.__setattr__(self, "fields", tuple(fields))
        object.__setattr__(self, "metadata", _norm_metadata(metadata))

    def __setattr__(self, *a):
        raise AttributeError("Schema is immutable")

    def __len__(self) -> int:
        return len(self.fields)

    def __iter__(self) -> Iterator[Field]:
        return iter(self.fields)

    def __getitem__(self, i: Union[int, str]) -> Field:
        return self.field(i)

    @property
    def names(self) -> list:
        return [f.name for f in self.fields]

    @property
    def types(self) -> list:
        return [f.type for f in self.fields]

    def field(self, i: Union[int, str]) -> Field:
        if isinstance(i, str):
            idx = self.get_field_index(i)
            if idx < 0:
                raise KeyError(i)
            return self.fields[idx]
        return self.fields[i]

    def get_field_index(self, name: str) -> int:
        for i, f in enumerate(self.fields):
            if f.name == name:
                return i
        return -1

    def append(self, f: Field) -> "Schema":
        return Schema(self.fields + (f,), self.metadata)

    def remove(self, i: int) -> "Schema":
        fs = list(self.fields)
        fs.pop(i)
        return Schema(fs, self.metadata)

    def set(self, i: int, f: Field) -> "Schema":
        fs = list(self.fields)
        fs[i] = f
        return Schema(fs, self.metadata)

    def with_metadata(self, metadata) -> "Schema":
        return Schema(self.fields, metadata)

    # pyarrow parity (type.h:2330 / python/pyarrow/types.pxi Schema)
    add_metadata = with_metadata          # deprecated pyarrow name

    def remove_metadata(self) -> "Schema":
        return Schema(self.fields, None)

    def field_by_name(self, name: str) -> Optional["Field"]:
        idx = self.get_field_index(name)
        return self.fields[idx] if idx >= 0 else None

    def get_all_field_indices(self, name: str) -> list:
        return [i for i, f in enumerate(self.fields) if f.name == name]

    def insert(self, i: int, f: "Field") -> "Schema":
        fs = list(self.fields)
        fs.insert(i, f)
        return Schema(fs, self.metadata)

    def empty_table(self):
        from .table import Table
        return Table.from_batches([], self)

    def to_string(self, truncate_metadata: bool = True,
                  show_field_metadata: bool = True,
                  show_schema_metadata: bool = True) -> str:
        return repr(self)

    def serialize(self, memory_pool=None):
        """IPC-serialize the schema (ipc/writer.h SerializeSchema)."""
        import io as _io
        from . import ipc as _ipc
        from .buffer import Buffer
        buf = _io.BytesIO()
        w = _ipc.new_stream(buf, self)
        w.close()
        return Buffer(buf.getvalue())

    @property
    def pandas_metadata(self):
        import json as _json
        raw = (self.metadata or {}).get(b"pandas")
        return _json.loads(raw) if raw else None

    @classmethod
    def from_pandas(cls, df, preserve_index: bool = True) -> "Schema":
        from .table import Table
        return Table.from_pandas(df).schema

    def equals(self, other: "Schema", check_metadata: bool = False) -> bool:
        if len(self) != len(other):
            return False
        if not all(a == b for a, b in zip(self.fields, other.fields)):
            return False
        if check_metadata and self.metadata != other.metadata:
            return False
        return True

    def __eq__(self, other):
        return isinstance(other, Schema) and self.equals(other)

    def __hash__(self):
        return hash(tuple(f._key() for f in self.fields))

    def __repr__(self):
        inner = "\n".join(f"{f.name}: {f.type!r}" for f in self.fields)
        return f"Schema:\n{inner}"


# --- factory functions (the public construction API) ----------------------

_SINGLETONS: dict = {}


def _singleton(type_id: TypeId) -> DataType:
    t = _SINGLETONS.get(type_id)
    if t is None:
        t = _SINGLETONS[type_id] = DataType(type_id)
    return t


def null() -> DataType: return _singleton(TypeId.NA)
def bool_() -> DataType: return _singleton(TypeId.BOOL)
def int8() -> DataType: return _singleton(TypeId.INT8)
def int16() -> DataType: return _singleton(TypeId.INT16)
def int32() -> DataType: return _singleton(TypeId.INT32)
def int64() -> DataType: return _singleton(TypeId.INT64)
def uint8() -> DataType: return _singleton(TypeId.UINT8)
def uint16() -> DataType: return _singleton(TypeId.UINT16)
def uint32() -> DataType: return _singleton(TypeId.UINT32)
def uint64() -> DataType: return _singleton(TypeId.UINT64)
def float16() -> DataType: return _singleton(TypeId.HALF_FLOAT)
def float32() -> DataType: return _singleton(TypeId.FLOAT)
def float64() -> DataType: return _singleton(TypeId.DOUBLE)
def string() -> DataType: return _singleton(TypeId.STRING)
def large_string() -> DataType: return _singleton(TypeId.LARGE_STRING)
def binary() -> DataType: return _singleton(TypeId.BINARY)
def large_binary() -> DataType: return _singleton(TypeId.LARGE_BINARY)
def date32() -> DataType: return _singleton(TypeId.DATE32)
def date64() -> DataType: return _singleton(TypeId.DATE64)
def month_interval() -> DataType: return _singleton(TypeId.INTERVAL_MONTHS)
def day_time_interval() -> DataType: return _singleton(TypeId.INTERVAL_DAY_TIME)


def month_day_nano_interval() -> DataType:
    return _singleton(TypeId.INTERVAL_MONTH_DAY_NANO)


def fixed_size_binary(byte_width: int) -> FixedSizeBinaryType:
    return FixedSizeBinaryType(byte_width)


def timestamp(unit: str = "us", tz: Optional[str] = None) -> TimestampType:
    return TimestampType(unit, tz)


def time32(unit: str = "ms") -> TimeType:
    return TimeType(TypeId.TIME32, unit)


def time64(unit: str = "us") -> TimeType:
    return TimeType(TypeId.TIME64, unit)


def duration(unit: str = "us") -> DurationType:
    return DurationType(unit)


def decimal32(precision: int, scale: int = 0) -> DecimalType:
    return DecimalType(precision, scale, TypeId.DECIMAL32)


def decimal64(precision: int, scale: int = 0) -> DecimalType:
    return DecimalType(precision, scale, TypeId.DECIMAL64)


def decimal128(precision: int, scale: int = 0) -> DecimalType:
    return DecimalType(precision, scale, TypeId.DECIMAL128)


def decimal256(precision: int, scale: int = 0) -> DecimalType:
    return DecimalType(precision, scale, TypeId.DECIMAL256)


def _as_field(x, default_name: str = "item") -> Field:
    if isinstance(x, Field):
        return x
    if isinstance(x, DataType):
        return Field(default_name, x)
    raise TypeError(f"expected Field or DataType, got {type(x)}")


def list_(value: Union[Field, DataType]) -> ListType:
    return ListType(_as_field(value))


def large_list(value: Union[Field, DataType]) -> ListType:
    return ListType(_as_field(value), TypeId.LARGE_LIST)


def string_view() -> DataType:
    return _singleton(TypeId.STRING_VIEW)


def binary_view() -> DataType:
    return _singleton(TypeId.BINARY_VIEW)


def list_view(value: Union[Field, DataType]) -> ListType:
    return ListType(_as_field(value), TypeId.LIST_VIEW)


def large_list_view(value: Union[Field, DataType]) -> ListType:
    return ListType(_as_field(value), TypeId.LARGE_LIST_VIEW)


def fixed_size_list(value: Union[Field, DataType], list_size: int) -> FixedSizeListType:
    return FixedSizeListType(_as_field(value), list_size)


def struct(fields) -> StructType:
    if isinstance(fields, Mapping):
        fields = [Field(k, v) for k, v in fields.items()]
    else:
        fields = [f if isinstance(f, Field) else Field(f[0], f[1])
                  for f in fields]
    return StructType(fields)


def map_(key_type: DataType, item_type: DataType,
         keys_sorted: bool = False) -> MapType:
    return MapType(key_type, item_type, keys_sorted)


def dictionary(index_type: DataType, value_type: DataType,
               ordered: bool = False) -> DictionaryType:
    return DictionaryType(index_type, value_type, ordered)


def sparse_union(fields: Sequence[Field],
                 type_codes: Optional[Sequence[int]] = None) -> UnionType:
    codes = type_codes if type_codes is not None else list(range(len(fields)))
    return UnionType(fields, codes, "sparse")


def dense_union(fields: Sequence[Field],
                type_codes: Optional[Sequence[int]] = None) -> UnionType:
    codes = type_codes if type_codes is not None else list(range(len(fields)))
    return UnionType(fields, codes, "dense")


def run_end_encoded(run_end_type: DataType,
                    value_type: DataType) -> RunEndEncodedType:
    return RunEndEncodedType(run_end_type, value_type)


def field(name: str, type: DataType, nullable: bool = True,
          metadata=None) -> Field:
    return Field(name, type, nullable, metadata)


def schema(fields, metadata=None) -> Schema:
    if isinstance(fields, Schema):
        return fields
    if isinstance(fields, Mapping):
        fields = [Field(k, v) for k, v in fields.items()]
    else:
        fields = [f if isinstance(f, Field) else Field(f[0], f[1])
                  for f in fields]
    return Schema(fields, metadata)


def from_numpy_dtype(dtype) -> DataType:
    """Map a numpy dtype to the corresponding logical type."""
    dtype = np.dtype(dtype)
    for tid, nd in _NUMPY_DTYPES.items():
        if nd == dtype and tid not in (TypeId.DATE32, TypeId.DATE64,
                                       TypeId.TIMESTAMP, TypeId.TIME32,
                                       TypeId.TIME64, TypeId.DURATION,
                                       TypeId.INTERVAL_MONTHS):
            return _singleton(tid)
    if dtype.kind == "M":  # datetime64
        unit = np.datetime_data(dtype)[0]
        return timestamp({"s": "s", "ms": "ms", "us": "us", "ns": "ns"}[unit])
    if dtype.kind == "m":
        unit = np.datetime_data(dtype)[0]
        return duration({"s": "s", "ms": "ms", "us": "us", "ns": "ns"}[unit])
    if dtype.kind in ("U", "S", "O"):
        return string() if dtype.kind != "S" else binary()
    raise ValueError(f"unsupported numpy dtype {dtype}")


# ---------------------------------------------------------------------------
# Type predicate functions (reference: python/pyarrow/types.py pa.types.is_*)
# ---------------------------------------------------------------------------

def _mk_id_pred(*ids):
    idset = frozenset(ids)
    def pred(t):
        return getattr(t, "id", None) in idset
    return pred


is_null = _mk_id_pred(TypeId.NA)
is_boolean = _mk_id_pred(TypeId.BOOL)
is_int8 = _mk_id_pred(TypeId.INT8)
is_int16 = _mk_id_pred(TypeId.INT16)
is_int32 = _mk_id_pred(TypeId.INT32)
is_int64 = _mk_id_pred(TypeId.INT64)
is_uint8 = _mk_id_pred(TypeId.UINT8)
is_uint16 = _mk_id_pred(TypeId.UINT16)
is_uint32 = _mk_id_pred(TypeId.UINT32)
is_uint64 = _mk_id_pred(TypeId.UINT64)
is_float16 = _mk_id_pred(TypeId.HALF_FLOAT)
is_float32 = _mk_id_pred(TypeId.FLOAT)
is_float64 = _mk_id_pred(TypeId.DOUBLE)
is_signed_integer = _mk_id_pred(TypeId.INT8, TypeId.INT16, TypeId.INT32,
                                TypeId.INT64)
is_unsigned_integer = _mk_id_pred(TypeId.UINT8, TypeId.UINT16,
                                  TypeId.UINT32, TypeId.UINT64)


def is_integer(t):
    return is_signed_integer(t) or is_unsigned_integer(t)


def is_floating(t):
    return getattr(t, "id", None) in (TypeId.HALF_FLOAT, TypeId.FLOAT,
                                      TypeId.DOUBLE)


is_decimal32 = _mk_id_pred(TypeId.DECIMAL32)
is_decimal64 = _mk_id_pred(TypeId.DECIMAL64)
is_decimal128 = _mk_id_pred(TypeId.DECIMAL128)
is_decimal256 = _mk_id_pred(TypeId.DECIMAL256)


def is_decimal(t):
    return (is_decimal32(t) or is_decimal64(t) or is_decimal128(t) or
            is_decimal256(t))


is_list = _mk_id_pred(TypeId.LIST)
is_large_list = _mk_id_pred(TypeId.LARGE_LIST)
is_fixed_size_list = _mk_id_pred(TypeId.FIXED_SIZE_LIST)
is_list_view = _mk_id_pred(TypeId.LIST_VIEW)
is_large_list_view = _mk_id_pred(TypeId.LARGE_LIST_VIEW)
is_struct = _mk_id_pred(TypeId.STRUCT)
is_union = _mk_id_pred(TypeId.SPARSE_UNION, TypeId.DENSE_UNION)
is_map = _mk_id_pred(TypeId.MAP)


def is_nested(t):
    return (is_list(t) or is_large_list(t) or is_fixed_size_list(t) or
            is_list_view(t) or is_large_list_view(t) or is_struct(t) or
            is_union(t) or is_map(t))


is_run_end_encoded = _mk_id_pred(TypeId.RUN_END_ENCODED)
is_timestamp = _mk_id_pred(TypeId.TIMESTAMP)
is_duration = _mk_id_pred(TypeId.DURATION)
is_time32 = _mk_id_pred(TypeId.TIME32)
is_time64 = _mk_id_pred(TypeId.TIME64)
is_date32 = _mk_id_pred(TypeId.DATE32)
is_date64 = _mk_id_pred(TypeId.DATE64)


def is_time(t):
    return is_time32(t) or is_time64(t)


def is_date(t):
    return is_date32(t) or is_date64(t)


is_interval = _mk_id_pred(TypeId.INTERVAL_MONTHS, TypeId.INTERVAL_DAY_TIME,
                          TypeId.INTERVAL_MONTH_DAY_NANO)


def is_temporal(t):
    return (is_timestamp(t) or is_duration(t) or is_time(t) or
            is_date(t) or is_interval(t))


is_string = _mk_id_pred(TypeId.STRING)
is_unicode = is_string
is_large_string = _mk_id_pred(TypeId.LARGE_STRING)
is_large_unicode = is_large_string
is_string_view = _mk_id_pred(TypeId.STRING_VIEW)
is_binary = _mk_id_pred(TypeId.BINARY)
is_large_binary = _mk_id_pred(TypeId.LARGE_BINARY)
is_binary_view = _mk_id_pred(TypeId.BINARY_VIEW)
is_fixed_size_binary = _mk_id_pred(TypeId.FIXED_SIZE_BINARY)
is_dictionary = _mk_id_pred(TypeId.DICTIONARY)


def is_primitive(t):
    return (is_boolean(t) or is_integer(t) or is_floating(t) or
            is_temporal(t) or
            getattr(t, "id", None) == TypeId.FIXED_SIZE_BINARY)


def is_boolean_value(v):
    import numpy as _np
    return isinstance(v, (bool, _np.bool_))


def is_integer_value(v):
    import numpy as _np
    return isinstance(v, (int, _np.integer)) and not isinstance(v, bool)


def is_float_value(v):
    import numpy as _np
    return isinstance(v, (float, _np.floating))
