"""Hand-written flatbuffers codec for the Arrow IPC metadata schemas.

Covers the subset of format/Schema.fbs, format/Message.fbs, format/File.fbs
needed for record-batch interchange. Built directly on the ``flatbuffers``
runtime (no generated code). Field slot numbers are the declaration indices
in the .fbs files (the wire contract); see reference format/*.fbs.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flatbuffers
from flatbuffers import number_types as N
from flatbuffers.table import Table as _Tab

# --- Type union discriminants (format/Schema.fbs `union Type`) -------------
TYPE_NULL = 1
TYPE_INT = 2
TYPE_FLOATINGPOINT = 3
TYPE_BINARY = 4
TYPE_UTF8 = 5
TYPE_BOOL = 6
TYPE_DECIMAL = 7
TYPE_DATE = 8
TYPE_TIME = 9
TYPE_TIMESTAMP = 10
TYPE_INTERVAL = 11
TYPE_LIST = 12
TYPE_STRUCT = 13
TYPE_UNION = 14
TYPE_FIXEDSIZEBINARY = 15
TYPE_FIXEDSIZELIST = 16
TYPE_MAP = 17
TYPE_DURATION = 18
TYPE_LARGEBINARY = 19
TYPE_LARGEUTF8 = 20
TYPE_LARGELIST = 21
TYPE_RUNENDENCODED = 22
TYPE_BINARYVIEW = 23
TYPE_UTF8VIEW = 24
TYPE_LISTVIEW = 25
TYPE_LARGELISTVIEW = 26

# MessageHeader union (format/Message.fbs)
MSG_SCHEMA = 1
MSG_DICTIONARY_BATCH = 2
MSG_RECORD_BATCH = 3

METADATA_V5 = 4  # MetadataVersion.V5

COMPRESSION_LZ4_FRAME = 0
COMPRESSION_ZSTD = 1

TIMEUNIT = ["s", "ms", "us", "ns"]  # SECOND, MILLISECOND, MICROSECOND, NANOSECOND


class Reader:
    """Minimal vtable-walking reader over a flatbuffer table."""

    __slots__ = ("t",)

    def __init__(self, buf, pos: int):
        self.t = _Tab(buf, pos)

    @classmethod
    def root(cls, buf: bytes, offset: int = 0) -> "Reader":
        n = flatbuffers.encode.Get(N.UOffsetTFlags.packer_type, buf, offset)
        return cls(buf, n + offset)

    def _off(self, slot: int) -> int:
        return self.t.Offset(4 + 2 * slot)

    def scalar(self, slot: int, flags, default):
        o = self._off(slot)
        if o == 0:
            return default
        return self.t.Get(flags, o + self.t.Pos)

    def i16(self, slot, default=0):
        return int(self.scalar(slot, N.Int16Flags, default))

    def i32(self, slot, default=0):
        return int(self.scalar(slot, N.Int32Flags, default))

    def i64(self, slot, default=0):
        return int(self.scalar(slot, N.Int64Flags, default))

    def u8(self, slot, default=0):
        return int(self.scalar(slot, N.Uint8Flags, default))

    def i8(self, slot, default=0):
        return int(self.scalar(slot, N.Int8Flags, default))

    def bool_(self, slot, default=False):
        return bool(self.scalar(slot, N.BoolFlags, default))

    def string(self, slot) -> Optional[bytes]:
        o = self._off(slot)
        if o == 0:
            return None
        return self.t.String(o + self.t.Pos)

    def table(self, slot) -> Optional["Reader"]:
        o = self._off(slot)
        if o == 0:
            return None
        return Reader(self.t.Bytes, self.t.Indirect(o + self.t.Pos))

    def union(self, slot) -> Optional["Reader"]:
        """Payload of a union field (slot = the value slot, not _type)."""
        o = self._off(slot)
        if o == 0:
            return None
        t2 = _Tab(bytearray(), 0)
        self.t.Union(t2, o)
        return Reader(self.t.Bytes, t2.Pos)

    def vector_len(self, slot) -> int:
        o = self._off(slot)
        return 0 if o == 0 else self.t.VectorLen(o)

    def vector_table(self, slot, i: int) -> "Reader":
        o = self._off(slot)
        x = self.t.Vector(o) + i * 4
        return Reader(self.t.Bytes, self.t.Indirect(x))

    def vector_structs(self, slot, stride: int, fields: Sequence[Tuple[int, object]]):
        """Read a vector of fixed structs; fields = [(byte_off, flags), ...].
        Returns list of tuples."""
        o = self._off(slot)
        if o == 0:
            return []
        n = self.t.VectorLen(o)
        base = self.t.Vector(o)
        out = []
        for i in range(n):
            pos = base + i * stride
            out.append(tuple(self.t.Get(fl, pos + fo) for fo, fl in fields))
        return out

    def vector_i64(self, slot) -> List[int]:
        o = self._off(slot)
        if o == 0:
            return []
        n = self.t.VectorLen(o)
        base = self.t.Vector(o)
        return [self.t.Get(N.Int64Flags, base + 8 * i) for i in range(n)]

    def vector_i32(self, slot) -> List[int]:
        o = self._off(slot)
        if o == 0:
            return []
        n = self.t.VectorLen(o)
        base = self.t.Vector(o)
        return [self.t.Get(N.Int32Flags, base + 4 * i) for i in range(n)]


# --- generic builder helpers ----------------------------------------------

def _table(b: flatbuffers.Builder, nslots: int, writes) -> int:
    """writes = list of (slot, kind, value, default) applied in reverse slot
    order (flatbuffers prepends)."""
    b.StartObject(nslots)
    for slot, kind, value, default in writes:
        if kind == "i16":
            b.PrependInt16Slot(slot, value, default)
        elif kind == "i32":
            b.PrependInt32Slot(slot, value, default)
        elif kind == "i64":
            b.PrependInt64Slot(slot, value, default)
        elif kind == "u8":
            b.PrependUint8Slot(slot, value, default)
        elif kind == "i8":
            b.PrependInt8Slot(slot, value, default)
        elif kind == "bool":
            b.PrependBoolSlot(slot, value, default)
        elif kind == "off":
            if value:
                b.PrependUOffsetTRelativeSlot(slot, value, 0)
        elif kind == "struct":
            if value:
                b.PrependStructSlot(slot, value, 0)
        else:
            raise AssertionError(kind)
    return b.EndObject()


def _offset_vector(b: flatbuffers.Builder, offsets: Sequence[int]) -> int:
    b.StartVector(4, len(offsets), 4)
    for off in reversed(offsets):
        b.PrependUOffsetTRelative(off)
    return b.EndVector()


def _kv_vector(b: flatbuffers.Builder, metadata) -> int:
    """custom_metadata: [KeyValue] (slots: key=0, value=1)."""
    if not metadata:
        return 0
    offs = []
    for k, v in metadata.items():
        ko = b.CreateString(k)
        vo = b.CreateString(v)
        offs.append(_table(b, 2, [(1, "off", vo, 0), (0, "off", ko, 0)]))
    return _offset_vector(b, offs)


def read_kv(r: Reader, slot: int) -> Optional[dict]:
    n = r.vector_len(slot)
    if n == 0:
        return None
    out = {}
    for i in range(n):
        kv = r.vector_table(slot, i)
        k = kv.string(0)
        v = kv.string(1)
        out[k if k is not None else b""] = v if v is not None else b""
    return out
