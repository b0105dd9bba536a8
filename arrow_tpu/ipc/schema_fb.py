"""DataType/Field/Schema ⇄ IPC flatbuffer conversion (format/Schema.fbs)."""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flatbuffers

from .. import types as T
from ..types import DataType, Field, Schema, TypeId
from . import fb
from .fb import Reader, _kv_vector, _offset_vector, _table, read_kv

_TIMEUNIT_TO_CODE = {"s": 0, "ms": 1, "us": 2, "ns": 3}


class DictionaryFieldMapper:
    """Assigns dictionary ids to dictionary-typed fields by pre-order schema
    position (reference: cpp/src/arrow/ipc/dictionary.h)."""

    def __init__(self):
        self.id_to_type: Dict[int, DataType] = {}
        # dictionary ids in schema pre-order; batch readers/writers traverse
        # columns in the same order to pair fields with dictionaries
        self.ordered_ids: List[int] = []
        self._next = 0

    def next_id(self, type: DataType) -> int:
        i = self._next
        self._next += 1
        self.id_to_type[i] = type
        self.ordered_ids.append(i)
        return i


def _write_type(b: flatbuffers.Builder, t: DataType) -> Tuple[int, int]:
    """Returns (type_discriminant, type_table_offset)."""
    tid = t.id
    if tid == TypeId.NA:
        return fb.TYPE_NULL, _table(b, 0, [])
    if t.is_integer:
        return fb.TYPE_INT, _table(b, 2, [
            (1, "bool", t.is_signed_integer, False),
            (0, "i32", t.bit_width, 0)])
    if t.is_floating:
        prec = {TypeId.HALF_FLOAT: 0, TypeId.FLOAT: 1, TypeId.DOUBLE: 2}[tid]
        return fb.TYPE_FLOATINGPOINT, _table(b, 1, [(0, "i16", prec, 0)])
    if tid == TypeId.BOOL:
        return fb.TYPE_BOOL, _table(b, 0, [])
    if tid == TypeId.STRING:
        return fb.TYPE_UTF8, _table(b, 0, [])
    if tid == TypeId.BINARY:
        return fb.TYPE_BINARY, _table(b, 0, [])
    if tid == TypeId.LARGE_STRING:
        return fb.TYPE_LARGEUTF8, _table(b, 0, [])
    if tid == TypeId.LARGE_BINARY:
        return fb.TYPE_LARGEBINARY, _table(b, 0, [])
    if tid in (TypeId.DECIMAL128, TypeId.DECIMAL256, TypeId.DECIMAL32, TypeId.DECIMAL64):
        return fb.TYPE_DECIMAL, _table(b, 3, [
            (2, "i32", t.bit_width, 128),
            (1, "i32", t.scale, 0),
            (0, "i32", t.precision, 0)])
    if tid == TypeId.FIXED_SIZE_BINARY:
        return fb.TYPE_FIXEDSIZEBINARY, _table(b, 1, [(0, "i32", t.byte_width, 0)])
    if tid == TypeId.DATE32:
        return fb.TYPE_DATE, _table(b, 1, [(0, "i16", 0, 1)])
    if tid == TypeId.DATE64:
        return fb.TYPE_DATE, _table(b, 1, [(0, "i16", 1, 1)])
    if tid in (TypeId.TIME32, TypeId.TIME64):
        return fb.TYPE_TIME, _table(b, 2, [
            (1, "i32", t.bit_width, 32),
            (0, "i16", _TIMEUNIT_TO_CODE[t.unit], 1)])
    if tid == TypeId.TIMESTAMP:
        tz = b.CreateString(t.tz) if t.tz else 0
        return fb.TYPE_TIMESTAMP, _table(b, 2, [
            (1, "off", tz, 0),
            (0, "i16", _TIMEUNIT_TO_CODE[t.unit], 0)])
    if tid == TypeId.DURATION:
        return fb.TYPE_DURATION, _table(b, 1, [
            (0, "i16", _TIMEUNIT_TO_CODE[t.unit], 1)])
    if tid == TypeId.INTERVAL_MONTHS:
        return fb.TYPE_INTERVAL, _table(b, 1, [(0, "i16", 0, 0)])
    if tid == TypeId.INTERVAL_DAY_TIME:
        return fb.TYPE_INTERVAL, _table(b, 1, [(0, "i16", 1, 0)])
    if tid == TypeId.INTERVAL_MONTH_DAY_NANO:
        return fb.TYPE_INTERVAL, _table(b, 1, [(0, "i16", 2, 0)])
    if tid == TypeId.LIST:
        return fb.TYPE_LIST, _table(b, 0, [])
    if tid == TypeId.LARGE_LIST:
        return fb.TYPE_LARGELIST, _table(b, 0, [])
    if tid == TypeId.FIXED_SIZE_LIST:
        return fb.TYPE_FIXEDSIZELIST, _table(b, 1, [(0, "i32", t.list_size, 0)])
    if tid == TypeId.MAP:
        return fb.TYPE_MAP, _table(b, 1, [(0, "bool", t.keys_sorted, False)])
    if tid == TypeId.STRUCT:
        return fb.TYPE_STRUCT, _table(b, 0, [])
    if tid in (TypeId.SPARSE_UNION, TypeId.DENSE_UNION):
        b.StartVector(4, len(t.type_codes), 4)
        for c in reversed(t.type_codes):
            b.PrependInt32(c)
        codes = b.EndVector()
        mode = 0 if tid == TypeId.SPARSE_UNION else 1
        return fb.TYPE_UNION, _table(b, 2, [
            (1, "off", codes, 0), (0, "i16", mode, 0)])
    if tid == TypeId.RUN_END_ENCODED:
        return fb.TYPE_RUNENDENCODED, _table(b, 0, [])
    if tid == TypeId.STRING_VIEW:
        return fb.TYPE_UTF8VIEW, _table(b, 0, [])
    if tid == TypeId.BINARY_VIEW:
        return fb.TYPE_BINARYVIEW, _table(b, 0, [])
    if tid == TypeId.LIST_VIEW:
        return fb.TYPE_LISTVIEW, _table(b, 0, [])
    if tid == TypeId.LARGE_LIST_VIEW:
        return fb.TYPE_LARGELISTVIEW, _table(b, 0, [])
    if tid == TypeId.DICTIONARY:
        # wire type is the VALUE type; encoding goes in Field.dictionary
        return _write_type(b, t.value_type)
    raise NotImplementedError(f"IPC write for {t!r}")


def write_field(b: flatbuffers.Builder, f: Field,
                mapper: DictionaryFieldMapper) -> int:
    t = f.type
    # extension types serialize as their storage type + metadata keys
    # (ARROW:extension:name / :metadata), reference extension_type.h
    if t.id == TypeId.EXTENSION:
        md = dict(f.metadata or {})
        md[b"ARROW:extension:name"] = t.extension_name.encode()
        md[b"ARROW:extension:metadata"] = t.extension_metadata()
        f = Field(f.name, t.storage_type, f.nullable, md)
        t = f.type
    dict_off = 0
    if t.id == TypeId.DICTIONARY:
        did = mapper.next_id(t)
        idx_t = t.index_type
        int_off = _table(b, 2, [
            (1, "bool", idx_t.is_signed_integer, False),
            (0, "i32", idx_t.bit_width, 0)])
        dict_off = _table(b, 4, [
            (3, "i16", 0, 0),
            (2, "bool", t.ordered, False),
            (1, "off", int_off, 0),
            (0, "i64", did, 0)])
        child_source = t.value_type
    else:
        child_source = t
    children = [write_field(b, cf, mapper) for cf in child_source.fields]
    children_vec = _offset_vector(b, children) if children else 0
    type_disc, type_off = _write_type(b, t)
    name_off = b.CreateString(f.name) if f.name is not None else 0
    md_off = _kv_vector(b, f.metadata)
    return _table(b, 7, [
        (6, "off", md_off, 0),
        (5, "off", children_vec, 0),
        (4, "off", dict_off, 0),
        (3, "off", type_off, 0),
        (2, "u8", type_disc, 0),
        (1, "bool", f.nullable, False),
        (0, "off", name_off, 0),
    ])


def write_schema(b: flatbuffers.Builder, schema: Schema,
                 mapper: DictionaryFieldMapper) -> int:
    fields = [write_field(b, f, mapper) for f in schema.fields]
    fields_vec = _offset_vector(b, fields)
    md_off = _kv_vector(b, schema.metadata)
    return _table(b, 4, [
        (2, "off", md_off, 0),
        (1, "off", fields_vec, 0),
        (0, "i16", 0, 0),  # endianness = Little
    ])


# --- reading ---------------------------------------------------------------

def _read_type(disc: int, r: Optional[Reader],
               children: List[Field]) -> DataType:
    if disc == fb.TYPE_NULL:
        return T.null()
    if disc == fb.TYPE_INT:
        bw, signed = r.i32(0), r.bool_(1)
        return {
            (8, True): T.int8(), (16, True): T.int16(),
            (32, True): T.int32(), (64, True): T.int64(),
            (8, False): T.uint8(), (16, False): T.uint16(),
            (32, False): T.uint32(), (64, False): T.uint64(),
        }[(bw, signed)]
    if disc == fb.TYPE_FLOATINGPOINT:
        return [T.float16(), T.float32(), T.float64()][r.i16(0)]
    if disc == fb.TYPE_BOOL:
        return T.bool_()
    if disc == fb.TYPE_UTF8:
        return T.string()
    if disc == fb.TYPE_BINARY:
        return T.binary()
    if disc == fb.TYPE_LARGEUTF8:
        return T.large_string()
    if disc == fb.TYPE_LARGEBINARY:
        return T.large_binary()
    if disc == fb.TYPE_DECIMAL:
        bw = r.i32(2, 128)
        mk = {32: T.decimal32, 64: T.decimal64, 128: T.decimal128,
              256: T.decimal256}[bw]
        return mk(r.i32(0), r.i32(1))
    if disc == fb.TYPE_FIXEDSIZEBINARY:
        return T.fixed_size_binary(r.i32(0))
    if disc == fb.TYPE_DATE:
        return T.date32() if r.i16(0, 1) == 0 else T.date64()
    if disc == fb.TYPE_TIME:
        unit = fb.TIMEUNIT[r.i16(0, 1)]
        return T.time32(unit) if r.i32(1, 32) == 32 else T.time64(unit)
    if disc == fb.TYPE_TIMESTAMP:
        tz = r.string(1)
        return T.timestamp(fb.TIMEUNIT[r.i16(0)],
                           tz.decode() if tz else None)
    if disc == fb.TYPE_DURATION:
        return T.duration(fb.TIMEUNIT[r.i16(0, 1)])
    if disc == fb.TYPE_INTERVAL:
        u = r.i16(0)
        return [T.month_interval(), T.day_time_interval(),
                T.month_day_nano_interval()][u]
    if disc == fb.TYPE_LIST:
        return T.ListType(children[0])
    if disc == fb.TYPE_LARGELIST:
        return T.ListType(children[0], TypeId.LARGE_LIST)
    if disc == fb.TYPE_FIXEDSIZELIST:
        return T.FixedSizeListType(children[0], r.i32(0))
    if disc == fb.TYPE_MAP:
        entries = children[0].type
        mt = T.map_(entries.fields[0].type, entries.fields[1].type,
                    r.bool_(0))
        return mt
    if disc == fb.TYPE_STRUCT:
        return T.StructType(children)
    if disc == fb.TYPE_UNION:
        mode = "sparse" if r.i16(0) == 0 else "dense"
        codes = r.vector_i32(1) or list(range(len(children)))
        return T.UnionType(children, codes, mode)
    if disc == fb.TYPE_RUNENDENCODED:
        return T.RunEndEncodedType(children[0].type, children[1].type)
    if disc == fb.TYPE_UTF8VIEW:
        return T.string_view()
    if disc == fb.TYPE_BINARYVIEW:
        return T.binary_view()
    if disc == fb.TYPE_LISTVIEW:
        return T.ListType(children[0], TypeId.LIST_VIEW)
    if disc == fb.TYPE_LARGELISTVIEW:
        return T.ListType(children[0], TypeId.LARGE_LIST_VIEW)
    raise NotImplementedError(f"IPC read for type discriminant {disc}")


def read_field(r: Reader, mapper: DictionaryFieldMapper) -> Field:
    name = r.string(0)
    nullable = r.bool_(1)
    disc = r.u8(2)
    type_r = r.table(3)
    nchildren = r.vector_len(5)
    children = [read_field(r.vector_table(5, i), mapper)
                for i in range(nchildren)]
    t = _read_type(disc, type_r, children)
    enc = r.table(4)
    if enc is not None:
        did = enc.i64(0)
        idx_r = enc.table(1)
        if idx_r is None:
            index_type = T.int32()
        else:
            index_type = _read_type(fb.TYPE_INT, idx_r, [])
        t = T.dictionary(index_type, t, enc.bool_(2))
        mapper.id_to_type[did] = t
        mapper.ordered_ids.append(did)
    md = read_kv(r, 6)
    if md and b"ARROW:extension:name" in md:
        from ..extension import reconstruct
        ext_name = md.get(b"ARROW:extension:name", b"").decode()
        ext_md = md.get(b"ARROW:extension:metadata", b"")
        t = reconstruct(t, ext_name, ext_md)
        md = {k: v for k, v in md.items()
              if not k.startswith(b"ARROW:extension:")} or None
    return Field(name.decode() if name else "", t, nullable, md)


def read_schema(r: Reader, mapper: DictionaryFieldMapper) -> Schema:
    n = r.vector_len(1)
    fields = [read_field(r.vector_table(1, i), mapper) for i in range(n)]
    md = read_kv(r, 2)
    return Schema(fields, md)
