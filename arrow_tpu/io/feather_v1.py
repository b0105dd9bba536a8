"""Feather V1 (legacy pre-IPC format).

Reference analogue: cpp/src/arrow/ipc/feather.cc (ReaderV1/WriterV1 paths;
the V1 flatbuffer schema the reference vendors as fbs/feather.fbs).

Wire layout (verified against pyarrow's V1 writer):
  "FEA1" + 4 pad | per-column 8-aligned blocks | CTable flatbuffer |
  uint32 metadata_len | "FEA1"

CTable  {0: description str, 1: num_rows i64, 2: columns [Column],
         3: version i32, 4: metadata str}
Column  {0: name str, 1: values PrimitiveArray}
PrimitiveArray {0: type i8, 1: encoding i8, 2: offset i64, 3: length i64,
                4: null_count i64, 5: total_bytes i64}
Column block: [null bitmap, LSB-first, padded to 8] [values; UTF8/BINARY =
int32 offsets then data; BOOL = packed bits] — each section 8-aligned.
"""

from __future__ import annotations

import struct
from typing import List

import flatbuffers
import numpy as np

from .. import types as T
from ..array.array import Array
from ..buffer import Buffer
from ..array.data import ArrayData
from ..ipc.fb import Reader, _table
from ..table import Table
from ..types import Field, Schema, TypeId
from ..utils import bits as bitutil

MAGIC = b"FEA1"

_TYPE_TO_V1 = {
    TypeId.BOOL: 0, TypeId.INT8: 1, TypeId.INT16: 2, TypeId.INT32: 3,
    TypeId.INT64: 4, TypeId.UINT8: 5, TypeId.UINT16: 6, TypeId.UINT32: 7,
    TypeId.UINT64: 8, TypeId.FLOAT: 9, TypeId.DOUBLE: 10,
    TypeId.STRING: 11, TypeId.BINARY: 12,
}
_V1_TO_TYPE = {
    0: T.bool_(), 1: T.int8(), 2: T.int16(), 3: T.int32(), 4: T.int64(),
    5: T.uint8(), 6: T.uint16(), 7: T.uint32(), 8: T.uint64(),
    9: T.float32(), 10: T.float64(), 11: T.string(), 12: T.binary(),
}


def _pad8(n: int) -> int:
    return (n + 7) & ~7


def write_feather_v1(table: Table, sink) -> None:
    close = False
    if isinstance(sink, str):
        sink = open(sink, "wb")
        close = True
    sink.write(MAGIC + b"\x00" * 4)
    pos = 8
    cols_meta = []
    for f, col in zip(table.schema, table.columns):
        arr = col.combine() if hasattr(col, "combine") else col
        v1t = _TYPE_TO_V1.get(f.type.id)
        if v1t is None:
            raise NotImplementedError(
                f"feather v1 cannot store {f.type!r}")
        d = arr.data
        n = len(arr)
        nulls = arr.null_count
        block = bytearray()
        if nulls > 0:
            bm = bitutil.pack_bits(d.validity_mask()).tobytes()
            block += bm + b"\x00" * (_pad8(len(bm)) - len(bm))
        if f.type.id in (TypeId.STRING, TypeId.BINARY):
            offs = d.offsets().astype(np.int32)
            ob = offs.tobytes()
            block += ob + b"\x00" * (_pad8(len(ob)) - len(ob))
            db = d.data_bytes().tobytes()
            block += db + b"\x00" * (_pad8(len(db)) - len(db))
        elif f.type.id == TypeId.BOOL:
            vb = bitutil.pack_bits(d.values()).tobytes()
            block += vb + b"\x00" * (_pad8(len(vb)) - len(vb))
        else:
            vb = np.ascontiguousarray(d.values()).tobytes()
            block += vb + b"\x00" * (_pad8(len(vb)) - len(vb))
        sink.write(bytes(block))
        cols_meta.append((f.name, v1t, pos, n, nulls, len(block)))
        pos += len(block)

    b = flatbuffers.Builder(512)
    col_offs = []
    for name, v1t, off, n, nulls, nbytes in cols_meta:
        arr_off = _table(b, 6, [
            (5, "i64", nbytes, 0), (4, "i64", nulls, 0),
            (3, "i64", n, 0), (2, "i64", off, 0),
            (1, "i8", 0, 0), (0, "i8", v1t, 0)])
        name_off = b.CreateString(name)
        col_offs.append(_table(b, 2, [(1, "off", arr_off, 0),
                                      (0, "off", name_off, 0)]))
    b.StartVector(4, len(col_offs), 4)
    for off in reversed(col_offs):
        b.PrependUOffsetTRelative(off)
    cols_vec = b.EndVector()
    ct = _table(b, 5, [
        (3, "i32", 2, 0),                 # version
        (2, "off", cols_vec, 0),
        (1, "i64", table.num_rows, 0)])
    b.Finish(ct)
    meta = bytes(b.Output())
    sink.write(meta)
    sink.write(struct.pack("<I", len(meta)))
    sink.write(MAGIC)
    if close:
        sink.close()


def is_feather_v1(raw: bytes) -> bool:
    return len(raw) > 12 and raw[:4] == MAGIC and raw[-4:] == MAGIC


def read_feather_v1(raw: bytes) -> Table:
    if not is_feather_v1(raw):
        raise ValueError("not a feather v1 file")
    (meta_len,) = struct.unpack("<I", raw[-8:-4])
    meta = raw[len(raw) - 8 - meta_len:-8]
    ct = Reader.root(meta)
    num_rows = ct.i64(1)
    fields: List[Field] = []
    arrays: List[Array] = []
    for i in range(ct.vector_len(2)):
        col = ct.vector_table(2, i)
        name = (col.string(0) or b"").decode()
        pa_ = col.table(1)
        v1t = pa_.i8(0)
        off = pa_.i64(2)
        n = pa_.i64(3)
        nulls = pa_.i64(4)
        t = _V1_TO_TYPE.get(v1t)
        if t is None:
            raise NotImplementedError(f"feather v1 type {v1t}")
        pos = off
        vbuf = None
        null_count = 0
        if nulls > 0:
            bm_len = (n + 7) // 8
            vbuf = Buffer(raw[pos:pos + bm_len])
            null_count = nulls
            pos += _pad8(bm_len)
        if t.id in (TypeId.STRING, TypeId.BINARY):
            ob_len = 4 * (n + 1)
            offs = np.frombuffer(raw[pos:pos + ob_len], np.int32)
            pos += _pad8(ob_len)
            nbytes = int(offs[-1])
            data = raw[pos:pos + nbytes]
            ad = ArrayData(t, n, [vbuf, Buffer(offs.copy()),
                                  Buffer(data)], null_count=null_count)
        elif t.id == TypeId.BOOL:
            vb_len = (n + 7) // 8
            ad = ArrayData(t, n, [vbuf, Buffer(raw[pos:pos + vb_len])],
                           null_count=null_count)
        else:
            w = np.dtype(t.to_numpy_dtype()).itemsize
            vals = np.frombuffer(raw[pos:pos + n * w],
                                 t.to_numpy_dtype())
            ad = ArrayData(t, n, [vbuf, Buffer(vals.copy())],
                           null_count=null_count)
        fields.append(Field(name, t, nullable=True))
        arrays.append(Array(ad))
    from ..table import RecordBatch
    rb = RecordBatch(Schema(fields), arrays)
    tbl = Table.from_batches([rb])
    assert tbl.num_rows == num_rows
    return tbl
