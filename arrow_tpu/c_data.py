"""Arrow C Data Interface (zero-copy in-process interchange).

Reference: cpp/src/arrow/c/abi.h:50,66 (ArrowSchema / ArrowArray structs),
bridge in c/bridge.cc. Implemented with ctypes against the stable C ABI so
arrays move between this engine and any Arrow implementation in-process
without copying value buffers.
"""

from __future__ import annotations

import ctypes
from typing import List, Optional

import numpy as np

from . import types as T
from .array.array import Array
from .array.data import ArrayData
from .buffer import Buffer
from .types import DataType, Field, TypeId

ARROW_FLAG_NULLABLE = 2
ARROW_FLAG_DICTIONARY_ORDERED = 1
ARROW_FLAG_MAP_KEYS_SORTED = 4


class ArrowSchemaStruct(ctypes.Structure):
    pass


ArrowSchemaStruct._fields_ = [
    ("format", ctypes.c_char_p),
    ("name", ctypes.c_char_p),
    ("metadata", ctypes.c_void_p),
    ("flags", ctypes.c_int64),
    ("n_children", ctypes.c_int64),
    ("children", ctypes.POINTER(ctypes.POINTER(ArrowSchemaStruct))),
    ("dictionary", ctypes.POINTER(ArrowSchemaStruct)),
    ("release", ctypes.CFUNCTYPE(None,
                                 ctypes.POINTER(ArrowSchemaStruct))),
    ("private_data", ctypes.c_void_p),
]


class ArrowArrayStruct(ctypes.Structure):
    pass


ArrowArrayStruct._fields_ = [
    ("length", ctypes.c_int64),
    ("null_count", ctypes.c_int64),
    ("offset", ctypes.c_int64),
    ("n_buffers", ctypes.c_int64),
    ("n_children", ctypes.c_int64),
    ("buffers", ctypes.POINTER(ctypes.c_void_p)),
    ("children", ctypes.POINTER(ctypes.POINTER(ArrowArrayStruct))),
    ("dictionary", ctypes.POINTER(ArrowArrayStruct)),
    ("release", ctypes.CFUNCTYPE(None, ctypes.POINTER(ArrowArrayStruct))),
    ("private_data", ctypes.c_void_p),
]


_FORMAT_FOR = {
    TypeId.NA: "n", TypeId.BOOL: "b",
    TypeId.INT8: "c", TypeId.UINT8: "C",
    TypeId.INT16: "s", TypeId.UINT16: "S",
    TypeId.INT32: "i", TypeId.UINT32: "I",
    TypeId.INT64: "l", TypeId.UINT64: "L",
    TypeId.HALF_FLOAT: "e", TypeId.FLOAT: "f", TypeId.DOUBLE: "g",
    TypeId.STRING: "u", TypeId.BINARY: "z",
    TypeId.LARGE_STRING: "U", TypeId.LARGE_BINARY: "Z",
    TypeId.DATE32: "tdD", TypeId.DATE64: "tdm",
    TypeId.INTERVAL_MONTHS: "tiM",
    TypeId.INTERVAL_DAY_TIME: "tiD",
    TypeId.INTERVAL_MONTH_DAY_NANO: "tin",
    TypeId.LIST: "+l", TypeId.LARGE_LIST: "+L", TypeId.STRUCT: "+s",
    TypeId.MAP: "+m", TypeId.RUN_END_ENCODED: "+r",
}

_UNIT_CODE = {"s": "s", "ms": "m", "us": "u", "ns": "n"}
_CODE_UNIT = {v: k for k, v in _UNIT_CODE.items()}


def format_for_type(t: DataType) -> str:
    tid = t.id
    if tid in _FORMAT_FOR:
        return _FORMAT_FOR[tid]
    if tid == TypeId.TIMESTAMP:
        return f"ts{_UNIT_CODE[t.unit]}:{t.tz or ''}"
    if tid == TypeId.TIME32:
        return f"tt{_UNIT_CODE[t.unit]}"
    if tid == TypeId.TIME64:
        return f"tt{_UNIT_CODE[t.unit]}"
    if tid == TypeId.DURATION:
        return f"tD{_UNIT_CODE[t.unit]}"
    if tid == TypeId.FIXED_SIZE_BINARY:
        return f"w:{t.byte_width}"
    if tid in (TypeId.DECIMAL128, TypeId.DECIMAL256, TypeId.DECIMAL32, TypeId.DECIMAL64):
        bits = "" if tid == TypeId.DECIMAL128 else f",{t.bit_width}"
        return f"d:{t.precision},{t.scale}{bits}"
    if tid == TypeId.FIXED_SIZE_LIST:
        return f"+w:{t.list_size}"
    if tid == TypeId.SPARSE_UNION:
        return "+us:" + ",".join(map(str, t.type_codes))
    if tid == TypeId.DENSE_UNION:
        return "+ud:" + ",".join(map(str, t.type_codes))
    if tid == TypeId.DICTIONARY:
        return format_for_type(t.index_type)
    raise NotImplementedError(f"C ABI format for {t!r}")


def type_for_format(fmt: str, children: List[Field]) -> DataType:
    simple = {v: k for k, v in _FORMAT_FOR.items()}
    if fmt in simple:
        tid = simple[fmt]
        if tid == TypeId.LIST:
            return T.ListType(children[0])
        if tid == TypeId.LARGE_LIST:
            return T.ListType(children[0], TypeId.LARGE_LIST)
        if tid == TypeId.STRUCT:
            return T.StructType(children)
        if tid == TypeId.MAP:
            entries = children[0].type
            return T.map_(entries.fields[0].type, entries.fields[1].type)
        if tid == TypeId.RUN_END_ENCODED:
            return T.RunEndEncodedType(children[0].type, children[1].type)
        return T.DataType(tid)
    if fmt.startswith("ts"):
        unit = _CODE_UNIT[fmt[2]]
        tz = fmt[4:] or None
        return T.timestamp(unit, tz)
    if fmt.startswith("tt"):
        unit = _CODE_UNIT[fmt[2]]
        return T.time32(unit) if unit in ("s", "ms") else T.time64(unit)
    if fmt.startswith("tD"):
        return T.duration(_CODE_UNIT[fmt[2]])
    if fmt.startswith("w:"):
        return T.fixed_size_binary(int(fmt[2:]))
    if fmt.startswith("d:"):
        parts = fmt[2:].split(",")
        mk = T.decimal128 if len(parts) < 3 else {
            "32": T.decimal32, "64": T.decimal64, "128": T.decimal128,
            "256": T.decimal256}[parts[2]]
        return mk(int(parts[0]), int(parts[1]))
    if fmt.startswith("+w:"):
        return T.FixedSizeListType(children[0], int(fmt[3:]))
    if fmt.startswith("+us:"):
        codes = [int(c) for c in fmt[4:].split(",")]
        return T.UnionType(children, codes, "sparse")
    if fmt.startswith("+ud:"):
        codes = [int(c) for c in fmt[4:].split(",")]
        return T.UnionType(children, codes, "dense")
    raise NotImplementedError(f"C ABI format {fmt!r}")


# --- export ----------------------------------------------------------------

_EXPORT_KEEPALIVE = {}
_next_export_id = [0]


@ctypes.CFUNCTYPE(None, ctypes.POINTER(ArrowSchemaStruct))
def _release_schema(ptr):
    try:
        s = ptr.contents
        key = s.private_data
        ctypes.memset(ctypes.addressof(s) + ArrowSchemaStruct.release.offset,
                      0, ctypes.sizeof(ctypes.c_void_p))
        _EXPORT_KEEPALIVE.pop(key, None)
    except Exception:
        pass  # interpreter shutdown


@ctypes.CFUNCTYPE(None, ctypes.POINTER(ArrowArrayStruct))
def _release_array(ptr):
    try:
        a = ptr.contents
        key = a.private_data
        ctypes.memset(ctypes.addressof(a) + ArrowArrayStruct.release.offset,
                      0, ctypes.sizeof(ctypes.c_void_p))
        _EXPORT_KEEPALIVE.pop(key, None)
    except Exception:
        pass


def _keepalive(objs) -> int:
    _next_export_id[0] += 1
    key = _next_export_id[0]
    _EXPORT_KEEPALIVE[key] = objs
    return key


def _export_schema_into(field: Field, out: ArrowSchemaStruct, keep: list):
    t = field.type
    fmt = format_for_type(t).encode()
    name = field.name.encode()
    keep.extend([fmt, name])
    out.format = fmt
    out.name = name
    out.metadata = None
    out.flags = ARROW_FLAG_NULLABLE if field.nullable else 0
    child_fields = (t.value_type.fields if t.id == TypeId.DICTIONARY
                    else t.fields)
    n = len(child_fields)
    out.n_children = n
    if n:
        arr_t = ctypes.POINTER(ArrowSchemaStruct) * n
        ptrs = arr_t()
        keep.append(ptrs)
        for i, cf in enumerate(child_fields):
            child = ArrowSchemaStruct()
            keep.append(child)
            _export_schema_into(cf, child, keep)
            ptrs[i] = ctypes.pointer(child)
        out.children = ctypes.cast(ptrs,
                                   ctypes.POINTER(
                                       ctypes.POINTER(ArrowSchemaStruct)))
    else:
        out.children = None
    if t.id == TypeId.DICTIONARY:
        d = ArrowSchemaStruct()
        keep.append(d)
        _export_schema_into(Field("", t.value_type), d, keep)
        out.dictionary = ctypes.pointer(d)
        if t.ordered:
            out.flags |= ARROW_FLAG_DICTIONARY_ORDERED
    else:
        out.dictionary = None
    out.release = _release_schema
    out.private_data = None


def _np_of_buffer(buf: Optional[Buffer]):
    return None if buf is None else buf.to_numpy()


def _export_array_into(data: ArrayData, out: ArrowArrayStruct, keep: list):
    out.length = data.length
    out.null_count = data.null_count
    out.offset = data.offset
    bufs = data.buffers
    out.n_buffers = len(bufs) if data.type.id != TypeId.NA else 1
    nb = out.n_buffers
    if nb:
        arr_t = ctypes.c_void_p * nb
        ptrs = arr_t()
        keep.append(ptrs)
        for i in range(nb):
            b = bufs[i] if i < len(bufs) else None
            npb = _np_of_buffer(b)
            if npb is None or npb.size == 0:
                ptrs[i] = None
            else:
                keep.append(npb)
                ptrs[i] = npb.ctypes.data_as(ctypes.c_void_p)
        out.buffers = ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p))
    else:
        out.buffers = None
    n = len(data.children)
    out.n_children = n
    if n:
        arr_t = ctypes.POINTER(ArrowArrayStruct) * n
        cptrs = arr_t()
        keep.append(cptrs)
        for i, c in enumerate(data.children):
            child = ArrowArrayStruct()
            keep.append(child)
            _export_array_into(c, child, keep)
            cptrs[i] = ctypes.pointer(child)
        out.children = ctypes.cast(cptrs,
                                   ctypes.POINTER(
                                       ctypes.POINTER(ArrowArrayStruct)))
    else:
        out.children = None
    if data.dictionary is not None:
        d = ArrowArrayStruct()
        keep.append(d)
        _export_array_into(data.dictionary, d, keep)
        out.dictionary = ctypes.pointer(d)
    else:
        out.dictionary = None
    out.release = _release_array
    out.private_data = None


def export_array(arr: Array, array_ptr: int, schema_ptr: int):
    """Export to caller-allocated ArrowArray/ArrowSchema structs (addresses
    as ints, matching pyarrow's _export_to_c convention)."""
    schema = ctypes.cast(schema_ptr,
                         ctypes.POINTER(ArrowSchemaStruct)).contents
    array = ctypes.cast(array_ptr,
                        ctypes.POINTER(ArrowArrayStruct)).contents
    # SEPARATE keepalives: consumers may release the schema while the
    # array's zero-copied buffers are still in use
    schema_keep: list = []
    array_keep: list = []
    _export_schema_into(Field("", arr.type, nullable=True), schema,
                        schema_keep)
    _export_array_into(arr.data, array, array_keep)
    schema.private_data = _keepalive(schema_keep)
    array.private_data = _keepalive(array_keep)


# --- import ----------------------------------------------------------------

def _import_field(s: ArrowSchemaStruct) -> Field:
    fmt = s.format.decode()
    children = []
    for i in range(s.n_children):
        children.append(_import_field(s.children[i].contents))
    t = type_for_format(fmt, children)
    if s.dictionary:
        vt = _import_field(s.dictionary.contents).type
        t = T.dictionary(t, vt,
                         bool(s.flags & ARROW_FLAG_DICTIONARY_ORDERED))
    name = s.name.decode() if s.name else ""
    return Field(name, t, bool(s.flags & ARROW_FLAG_NULLABLE))


def _buffer_from_ptr(ptr, nbytes: int) -> Optional[Buffer]:
    if not ptr or nbytes == 0:
        return None
    raw = (ctypes.c_uint8 * nbytes).from_address(ptr)
    return Buffer(np.frombuffer(raw, dtype=np.uint8).copy())


def _expected_buffer_sizes(t: DataType, a) -> List[int]:
    """Byte sizes to copy for each buffer given length/offset."""
    n = a.length + a.offset
    tid = t.id
    validity = (n + 7) // 8
    if tid == TypeId.NA:
        return []
    if tid == TypeId.BOOL:
        return [validity, (n + 7) // 8]
    if tid == TypeId.DICTIONARY:
        return [validity, n * (t.index_type.bit_width // 8)]
    if t.is_primitive:
        return [validity, n * max(t.bit_width // 8, 1)]
    if tid in (TypeId.STRING, TypeId.BINARY):
        return [validity, (n + 1) * 4, -1]
    if tid in (TypeId.LARGE_STRING, TypeId.LARGE_BINARY):
        return [validity, (n + 1) * 8, -1]
    if tid in (TypeId.LIST, TypeId.MAP):
        return [validity, (n + 1) * 4]
    if tid == TypeId.LARGE_LIST:
        return [validity, (n + 1) * 8]
    if tid in (TypeId.STRUCT, TypeId.FIXED_SIZE_LIST):
        return [validity]
    if tid == TypeId.SPARSE_UNION:
        return [n]
    if tid == TypeId.DENSE_UNION:
        return [n, n * 4]
    if tid == TypeId.RUN_END_ENCODED:
        return []
    raise NotImplementedError(f"import sizes for {t!r}")


def _import_array_data(a: ArrowArrayStruct, t: DataType) -> ArrayData:
    sizes = _expected_buffer_sizes(t, a)
    bufs: List[Optional[Buffer]] = []
    var_data_size = None
    for i, size in enumerate(sizes):
        ptr = a.buffers[i] if a.buffers else None
        if size == -1:
            # data buffer of a varbinary: size = last offset
            offsets = bufs[-1]
            if offsets is None:
                bufs.append(None)
                continue
            dt = np.int32 if t.id in (TypeId.STRING, TypeId.BINARY) \
                else np.int64
            end = int(offsets.view(dt)[a.offset + a.length])
            bufs.append(_buffer_from_ptr(ptr, end))
        else:
            bufs.append(_buffer_from_ptr(ptr, size))
    children = []
    child_types = (t.value_type.fields if t.id == TypeId.DICTIONARY
                   else t.fields)
    for i in range(a.n_children):
        ct = _child_type(t, i)
        children.append(_import_array_data(a.children[i].contents, ct))
    dictionary = None
    if a.dictionary and t.id == TypeId.DICTIONARY:
        dictionary = _import_array_data(a.dictionary.contents,
                                        t.value_type)
    return ArrayData(t, a.length, bufs, children,
                     null_count=a.null_count, offset=a.offset,
                     dictionary=dictionary)


def _child_type(t: DataType, i: int) -> DataType:
    if t.id in (TypeId.LIST, TypeId.LARGE_LIST, TypeId.MAP):
        return t.value_type if t.id == TypeId.MAP else t.value_field.type
    if t.id == TypeId.FIXED_SIZE_LIST:
        return t.value_type
    return t.fields[i].type


def import_array(array_ptr: int, schema_ptr: int) -> Array:
    """Import from ArrowArray/ArrowSchema struct addresses. Buffers are
    copied (the source may release them after import); call the source's
    release through us afterwards."""
    s = ctypes.cast(schema_ptr, ctypes.POINTER(ArrowSchemaStruct)).contents
    a = ctypes.cast(array_ptr, ctypes.POINTER(ArrowArrayStruct)).contents
    field = _import_field(s)
    data = _import_array_data(a, field.type)
    out = Array(data)
    # release the exporter's structures
    if a.release:
        a.release(ctypes.cast(array_ptr,
                              ctypes.POINTER(ArrowArrayStruct)))
    if s.release:
        s.release(ctypes.cast(schema_ptr,
                              ctypes.POINTER(ArrowSchemaStruct)))
    return out


# --- PyCapsule protocol (__arrow_c_schema__/__arrow_c_array__/stream) ------

_PyCapsule_New = ctypes.pythonapi.PyCapsule_New
_PyCapsule_New.restype = ctypes.py_object
_PyCapsule_New.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                           ctypes.c_void_p]
_PyCapsule_GetPointer = ctypes.pythonapi.PyCapsule_GetPointer
_PyCapsule_GetPointer.restype = ctypes.c_void_p
_PyCapsule_GetPointer.argtypes = [ctypes.py_object, ctypes.c_char_p]


def _capsule(struct_obj, name: bytes):
    # the struct object itself is kept alive through the keepalive registry
    # until the consumer calls release
    _EXPORT_KEEPALIVE[id(struct_obj)] = struct_obj
    return _PyCapsule_New(ctypes.addressof(struct_obj), name, None)


def array_capsules(arr: Array):
    """Returns (schema_capsule, array_capsule) per the Arrow PyCapsule
    interface (consumed by pyarrow/pandas/polars)."""
    sch = ArrowSchemaStruct()
    a = ArrowArrayStruct()
    export_array(arr, ctypes.addressof(a), ctypes.addressof(sch))
    return (_capsule(sch, b"arrow_schema"), _capsule(a, b"arrow_array"))


class ArrowArrayStreamStruct(ctypes.Structure):
    pass


ArrowArrayStreamStruct._fields_ = [
    ("get_schema", ctypes.CFUNCTYPE(
        ctypes.c_int, ctypes.POINTER(ArrowArrayStreamStruct),
        ctypes.POINTER(ArrowSchemaStruct))),
    ("get_next", ctypes.CFUNCTYPE(
        ctypes.c_int, ctypes.POINTER(ArrowArrayStreamStruct),
        ctypes.POINTER(ArrowArrayStruct))),
    ("get_last_error", ctypes.CFUNCTYPE(
        ctypes.c_char_p, ctypes.POINTER(ArrowArrayStreamStruct))),
    ("release", ctypes.CFUNCTYPE(
        None, ctypes.POINTER(ArrowArrayStreamStruct))),
    ("private_data", ctypes.c_void_p),
]


_STREAM_STATE: dict = {}


@ctypes.CFUNCTYPE(ctypes.c_int, ctypes.POINTER(ArrowArrayStreamStruct),
                  ctypes.POINTER(ArrowSchemaStruct))
def _stream_get_schema(stream_ptr, schema_out):
    state = _STREAM_STATE.get(stream_ptr.contents.private_data)
    if state is None:
        return 5  # EIO
    keep: list = []
    _export_schema_into(state["schema_field"], schema_out.contents, keep)
    schema_out.contents.private_data = _keepalive(keep)
    return 0


@ctypes.CFUNCTYPE(ctypes.c_int, ctypes.POINTER(ArrowArrayStreamStruct),
                  ctypes.POINTER(ArrowArrayStruct))
def _stream_get_next(stream_ptr, array_out):
    state = _STREAM_STATE.get(stream_ptr.contents.private_data)
    if state is None:
        return 5
    if state["pos"] >= len(state["batches"]):
        array_out.contents.release = ctypes.cast(
            None, type(array_out.contents.release))
        return 0  # end of stream
    data = state["batches"][state["pos"]]
    state["pos"] += 1
    keep: list = []
    _export_array_into(data, array_out.contents, keep)
    array_out.contents.private_data = _keepalive(keep)
    return 0


@ctypes.CFUNCTYPE(ctypes.c_char_p,
                  ctypes.POINTER(ArrowArrayStreamStruct))
def _stream_get_last_error(stream_ptr):
    return None


@ctypes.CFUNCTYPE(None, ctypes.POINTER(ArrowArrayStreamStruct))
def _stream_release(stream_ptr):
    s = stream_ptr.contents
    _STREAM_STATE.pop(s.private_data, None)
    s.release = ctypes.cast(None, type(s.release))


def stream_capsule(batches, schema_field: Field):
    """ArrowArrayStream capsule over struct-wrapped record batches.

    batches: list of ArrayData of STRUCT type (one per RecordBatch)."""
    stream = ArrowArrayStreamStruct()
    stream.get_schema = _stream_get_schema
    stream.get_next = _stream_get_next
    stream.get_last_error = _stream_get_last_error
    stream.release = _stream_release
    _next_export_id[0] += 1
    key = _next_export_id[0]
    stream.private_data = key
    _STREAM_STATE[key] = {"schema_field": schema_field,
                          "batches": list(batches), "pos": 0}
    return _capsule(stream, b"arrow_array_stream")


def batch_to_struct_data(rb) -> "ArrayData":
    """RecordBatch -> struct-typed ArrayData (C stream representation)."""
    fields = list(rb.schema.fields)
    st = T.StructType(fields)
    return ArrayData(st, rb.num_rows, [None],
                     [c.data for c in rb.columns], null_count=0)


def import_stream_capsule(capsule):
    """Consume an ``arrow_array_stream`` PyCapsule into a
    RecordBatchReader (c/bridge.cc ImportRecordBatchReader analogue)."""
    from .table import RecordBatch, RecordBatchReader
    ptr = _PyCapsule_GetPointer(capsule, b"arrow_array_stream")
    stream = ctypes.cast(ptr,
                         ctypes.POINTER(ArrowArrayStreamStruct)).contents

    sch = ArrowSchemaStruct()
    rc = stream.get_schema(ctypes.pointer(stream),
                           ctypes.pointer(sch))
    if rc != 0:
        raise OSError(f"ArrowArrayStream.get_schema failed: {rc}")
    root = _import_field(sch)
    if sch.release:
        sch.release(ctypes.pointer(sch))
    fields = list(root.type.fields)
    schema = T.Schema(fields)
    struct_t = root.type

    def gen(_keep_capsule=capsule):
        # `_keep_capsule` pins the PyCapsule (and thus the producer's
        # ArrowArrayStream) for the generator's lifetime; the capsule's
        # own destructor performs the release.
        while True:
            a = ArrowArrayStruct()
            rc2 = stream.get_next(ctypes.pointer(stream),
                                  ctypes.pointer(a))
            if rc2 != 0:
                raise OSError(
                    f"ArrowArrayStream.get_next failed: {rc2}")
            if not a.release:
                break
            data = _import_array_data(a, struct_t)
            a.release(ctypes.pointer(a))
            cols = [Array(ch) for ch in data.children]
            yield RecordBatch(schema, cols)

    return RecordBatchReader(schema, gen())
