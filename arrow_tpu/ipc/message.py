"""IPC message assembly/parsing: record-batch serialization and framing.

Framing (reference ipc/message.h:577, SURVEY A.5):
  <0xFFFFFFFF continuation><int32 metadata_size><flatbuffer metadata
  padded to 8><body with each buffer padded to 8>
EOS marker = continuation + zero length.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Sequence, Tuple

import flatbuffers
import numpy as np

from ..array.data import ArrayData
from ..buffer import Buffer
from ..types import DataType, TypeId
from ..utils import bits as bitutil
from . import fb
from .fb import Reader, _table

CONTINUATION = 0xFFFFFFFF
ALIGNMENT = 8

try:
    import zstandard as _zstd
except ImportError:  # pragma: no cover
    _zstd = None


def _pad_to(n: int, align: int = ALIGNMENT) -> int:
    return (n + align - 1) // align * align


class BufferedBody:
    """Accumulates body buffers, assigning padded offsets."""

    def __init__(self, codec: Optional[str] = None):
        self.parts: List[bytes] = []
        self.layout: List[Tuple[int, int]] = []  # (offset, length)
        self.pos = 0
        self.codec = codec
        self.variadic_counts: List[int] = []
        if codec == "zstd" and _zstd is None:
            raise ValueError("zstandard not available")
        if codec == "lz4":
            from ..utils import lz4frame as _lz4check  # noqa: F401

    def add(self, data):
        """Accepts bytes, memoryview or numpy arrays; uncompressed
        bodies keep zero-copy views (copied only once, into the sink)."""
        if isinstance(data, np.ndarray):
            data = memoryview(
                np.ascontiguousarray(data).view(np.uint8).reshape(-1))
        if data is None or len(data) == 0:
            # zero-length placeholder buffer
            self.layout.append((self.pos, 0))
            return
        if self.codec is not None and not isinstance(data, bytes):
            data = bytes(data)
        if self.codec == "zstd":
            comp = _zstd.ZstdCompressor().compress(data)
            if len(comp) < len(data):
                data = struct.pack("<q", len(data)) + comp
            else:
                data = struct.pack("<q", -1) + data
        elif self.codec == "lz4":
            from ..utils.lz4frame import compress as _lz4c
            comp = _lz4c(data)
            if len(comp) < len(data):
                data = struct.pack("<q", len(data)) + comp
            else:
                data = struct.pack("<q", -1) + data
        ln = len(data)
        self.layout.append((self.pos, ln))
        padded = _pad_to(ln)
        self.parts.append(data)
        if padded > ln:
            self.parts.append(b"\x00" * (padded - ln))
        self.pos += padded

    def body(self) -> bytes:
        return b"".join(self.parts)


def _validity_bytes(d: ArrayData) -> Optional[bytes]:
    if d.null_count == 0:
        return None
    mask = d.validity_mask()
    return bitutil.pack_bits(mask)


def serialize_array(d: ArrayData, nodes: List[Tuple[int, int]],
                    body: BufferedBody):
    """Pre-order walk appending FieldNodes and body buffers
    (reference: RecordBatchSerializer::VisitArray, ipc/writer.cc:146)."""
    t = d.type
    if t.id == TypeId.EXTENSION:
        storage = d.copy()
        storage.type = t.storage_type
        serialize_array(storage, nodes, body)
        return
    tid = t.id
    nodes.append((d.length, d.null_count))

    if tid == TypeId.NA:
        return

    if tid in (TypeId.SPARSE_UNION, TypeId.DENSE_UNION):
        body.add(d.type_ids())
        if tid == TypeId.DENSE_UNION:
            offs = d.buffers[1].view(np.int32)[d.offset:d.offset + d.length]
            body.add(offs)
            for c in d.children:
                serialize_array(c, nodes, body)
        else:
            for c in d.children:
                serialize_array(c.slice(d.offset, d.length), nodes, body)
        return

    if tid == TypeId.RUN_END_ENCODED:
        for c in d.children:
            serialize_array(c, nodes, body)
        return

    body.add(_validity_bytes(d))

    if tid == TypeId.BOOL:
        body.add(bitutil.pack_bits(d.values()))
        return

    if t.is_primitive or tid == TypeId.INTERVAL_DAY_TIME or \
            tid == TypeId.INTERVAL_MONTH_DAY_NANO:
        if tid in (TypeId.INTERVAL_DAY_TIME, TypeId.INTERVAL_MONTH_DAY_NANO):
            w = t.bit_width // 8
            raw = d.buffers[1].to_numpy()
            body.add(raw[d.offset * w:(d.offset + d.length) * w])
        else:
            body.add(d.values())
        return

    if tid == TypeId.DICTIONARY:
        body.add(d.values())
        return

    if tid in (TypeId.STRING_VIEW, TypeId.BINARY_VIEW):
        views = d.buffers[1].to_numpy().reshape(-1, 16)
        body.add(views[d.offset:d.offset + d.length].tobytes())
        data_bufs = d.buffers[2:]
        body.variadic_counts.append(len(data_bufs))
        for db in data_bufs:
            body.add(db.to_numpy().tobytes() if db is not None else b"")
        return

    if tid in (TypeId.LIST_VIEW, TypeId.LARGE_LIST_VIEW):
        w = 8 if tid == TypeId.LARGE_LIST_VIEW else 4
        dt = np.int64 if tid == TypeId.LARGE_LIST_VIEW else np.int32
        body.add(d.buffers[1].view(dt)[d.offset:
                                       d.offset + d.length].tobytes())
        body.add(d.buffers[2].view(dt)[d.offset:
                                       d.offset + d.length].tobytes())
        serialize_array(d.children[0], nodes, body)
        return

    if tid in (TypeId.STRING, TypeId.BINARY, TypeId.LARGE_STRING,
               TypeId.LARGE_BINARY):
        offs = d.offsets()
        start = int(offs[0])
        rebased = (offs - start) if start else offs
        body.add(rebased)
        body.add(d.data_bytes()[start:int(offs[-1])])
        return

    if tid in (TypeId.LIST, TypeId.MAP, TypeId.LARGE_LIST):
        offs = d.offsets()
        start, end = int(offs[0]), int(offs[-1])
        rebased = (offs - start) if start else offs
        body.add(rebased)
        serialize_array(d.children[0].slice(start, end - start), nodes, body)
        return

    if tid == TypeId.FIXED_SIZE_LIST:
        sz = t.list_size
        serialize_array(d.children[0].slice(d.offset * sz, d.length * sz),
                        nodes, body)
        return

    if tid == TypeId.STRUCT:
        for c in d.children:
            serialize_array(c.slice(d.offset, d.length), nodes, body)
        return

    raise NotImplementedError(f"IPC serialize for {t!r}")


def _write_record_batch_fb(b: flatbuffers.Builder, length: int,
                           nodes: Sequence[Tuple[int, int]],
                           layout: Sequence[Tuple[int, int]],
                           codec: Optional[str],
                           variadic_counts: Sequence[int] = ()) -> int:
    # nodes: vector of FieldNode structs (16 bytes: length i64, null_count i64)
    b.StartVector(16, len(nodes), 8)
    for ln, nc in reversed(nodes):
        b.Prep(8, 16)
        b.PrependInt64(nc)
        b.PrependInt64(ln)
    nodes_vec = b.EndVector()
    # buffers: vector of Buffer structs (16 bytes: offset i64, length i64)
    b.StartVector(16, len(layout), 8)
    for off, ln in reversed(layout):
        b.Prep(8, 16)
        b.PrependInt64(ln)
        b.PrependInt64(off)
    buffers_vec = b.EndVector()
    comp_off = 0
    if codec == "zstd":
        comp_off = _table(b, 2, [(1, "i8", 0, 0),
                                 (0, "i8", fb.COMPRESSION_ZSTD, 0)])
    elif codec == "lz4":
        comp_off = _table(b, 2, [(1, "i8", 0, 0),
                                 (0, "i8", fb.COMPRESSION_LZ4_FRAME, 0)])
    var_vec = 0
    if variadic_counts:
        b.StartVector(8, len(variadic_counts), 8)
        for c in reversed(variadic_counts):
            b.PrependInt64(c)
        var_vec = b.EndVector()
    return _table(b, 5, [
        (4, "off", var_vec, 0),
        (3, "off", comp_off, 0),
        (2, "off", buffers_vec, 0),
        (1, "off", nodes_vec, 0),
        (0, "i64", length, 0),
    ])


def _finish_message(b: flatbuffers.Builder, header_type: int,
                    header_off: int, body_length: int) -> bytes:
    msg = _table(b, 5, [
        (3, "i64", body_length, 0),
        (2, "off", header_off, 0),
        (1, "u8", header_type, 0),
        (0, "i16", fb.METADATA_V5, 0),
    ])
    b.Finish(msg)
    return bytes(b.Output())


def encapsulate(metadata: bytes) -> bytes:
    """Wrap flatbuffer metadata in the stream framing."""
    total = _pad_to(4 + 4 + len(metadata))
    padded_meta_len = total - 8
    return (struct.pack("<II", CONTINUATION, padded_meta_len)
            + metadata + b"\x00" * (padded_meta_len - len(metadata)))


EOS = struct.pack("<II", CONTINUATION, 0)


def serialize_schema_message(schema, mapper) -> bytes:
    from .schema_fb import write_schema
    b = flatbuffers.Builder(1024)
    off = write_schema(b, schema, mapper)
    return encapsulate(_finish_message(b, fb.MSG_SCHEMA, off, 0))


def serialize_record_batch_parts(
        columns: Sequence[ArrayData], num_rows: int,
        codec: Optional[str] = None) -> Tuple[bytes, List]:
    """Returns (framed metadata, list of body buffer views). The parts
    stay zero-copy views over the columns' buffers so a file/socket
    writer can copy each exactly once (reference: WriteIpcPayload
    writes per-buffer, ipc/writer.cc:773)."""
    nodes: List[Tuple[int, int]] = []
    body = BufferedBody(codec)
    for col in columns:
        serialize_array(col, nodes, body)
    b = flatbuffers.Builder(1024)
    rb_off = _write_record_batch_fb(b, num_rows, nodes, body.layout, codec,
                                    body.variadic_counts)
    meta = _finish_message(b, fb.MSG_RECORD_BATCH, rb_off, body.pos)
    return encapsulate(meta), body.parts


def serialize_record_batch(columns: Sequence[ArrayData], num_rows: int,
                           codec: Optional[str] = None) -> Tuple[bytes, bytes]:
    """Returns (framed metadata, body bytes)."""
    meta, parts = serialize_record_batch_parts(columns, num_rows, codec)
    return meta, b"".join(parts)


def serialize_dictionary_batch(dict_id: int, dictionary: ArrayData,
                               codec: Optional[str] = None,
                               is_delta: bool = False) -> Tuple[bytes, bytes]:
    nodes: List[Tuple[int, int]] = []
    body = BufferedBody(codec)
    serialize_array(dictionary, nodes, body)
    body_bytes = body.body()
    b = flatbuffers.Builder(1024)
    rb_off = _write_record_batch_fb(b, dictionary.length, nodes, body.layout,
                                    codec, body.variadic_counts)
    db_off = _table(b, 3, [
        (2, "bool", is_delta, False),
        (1, "off", rb_off, 0),
        (0, "i64", dict_id, 0),
    ])
    meta = _finish_message(b, fb.MSG_DICTIONARY_BATCH, db_off, len(body_bytes))
    return encapsulate(meta), body_bytes


# --- parsing ---------------------------------------------------------------

class Message:
    __slots__ = ("header_type", "header", "body_length", "body")

    def __init__(self, header_type, header, body_length, body):
        self.header_type = header_type
        self.header = header
        self.body_length = body_length
        self.body = body


def parse_message_meta(meta: bytes) -> Tuple[int, Reader, int]:
    """Returns (header_type, header reader, body_length)."""
    r = Reader.root(meta)
    htype = r.u8(1)
    header = r.union(2)
    body_length = r.i64(3)
    return htype, header, body_length


class RecordBatchMeta:
    __slots__ = ("length", "nodes", "buffers", "codec", "variadic_counts")

    def __init__(self, r: Reader):
        from flatbuffers import number_types as _N
        i64f = _N.Int64Flags
        self.length = r.i64(0)
        self.nodes = r.vector_structs(1, 16, [(0, i64f), (8, i64f)])
        self.buffers = r.vector_structs(2, 16, [(0, i64f), (8, i64f)])
        comp = r.table(3)
        self.codec = None
        if comp is not None:
            self.codec = {0: "lz4", 1: "zstd"}[comp.i8(0)]
        self.variadic_counts = r.vector_i64(4)


class ArrayLoader:
    """Walks a schema type tree assigning nodes/buffers from a record batch
    body (reference: ipc/reader.cc:173 ``ArrayLoader``)."""

    def __init__(self, meta: RecordBatchMeta, body: bytes):
        self.meta = meta
        self.body = body
        self.node_i = 0
        self.buf_i = 0
        self.variadic_i = 0

    def _next_node(self) -> Tuple[int, int]:
        n = self.meta.nodes[self.node_i]
        self.node_i += 1
        return n

    def _next_buffer(self) -> Optional[Buffer]:
        off, ln = self.meta.buffers[self.buf_i]
        self.buf_i += 1
        if ln == 0:
            return None
        raw = self.body[off:off + ln]
        if self.meta.codec is not None:
            (uncomp_len,) = struct.unpack_from("<q", raw, 0)
            payload = raw[8:]
            if uncomp_len == -1:
                raw = payload
            elif self.meta.codec == "zstd":
                raw = _zstd.ZstdDecompressor().decompress(
                    payload, max_output_size=uncomp_len)
            elif self.meta.codec == "lz4":
                from ..utils.lz4frame import decompress as _lz4d
                raw = _lz4d(payload, uncomp_len)
            else:
                raise NotImplementedError(
                    f"codec {self.meta.codec} not available")
        return Buffer(raw)

    def load(self, t: DataType) -> ArrayData:
        tid = t.id
        if tid == TypeId.EXTENSION:
            out = self.load(t.storage_type)
            out.type = t
            return out
        length, null_count = self._next_node()

        if tid == TypeId.NA:
            return ArrayData(t, length, [], null_count=length)

        if tid in (TypeId.SPARSE_UNION, TypeId.DENSE_UNION):
            bufs = [self._next_buffer()]
            if tid == TypeId.DENSE_UNION:
                bufs.append(self._next_buffer())
            children = [self.load(f.type) for f in t.fields]
            return ArrayData(t, length, bufs, children, null_count=0)

        if tid == TypeId.RUN_END_ENCODED:
            children = [self.load(f.type) for f in t.fields]
            return ArrayData(t, length, [], children, null_count=null_count)

        validity = self._next_buffer()

        if tid == TypeId.DICTIONARY:
            data = self._next_buffer()
            return ArrayData(t, length, [validity, data],
                             null_count=null_count)

        if tid == TypeId.BOOL or t.is_primitive or tid in (
                TypeId.INTERVAL_DAY_TIME, TypeId.INTERVAL_MONTH_DAY_NANO):
            data = self._next_buffer()
            return ArrayData(t, length, [validity, data],
                             null_count=null_count)

        if tid in (TypeId.STRING_VIEW, TypeId.BINARY_VIEW):
            views = self._next_buffer()
            nvar = self.meta.variadic_counts[self.variadic_i] \
                if self.variadic_i < len(self.meta.variadic_counts) else 0
            self.variadic_i += 1
            data = [self._next_buffer() or Buffer(b"")
                    for _ in range(nvar)]
            return ArrayData(t, length, [validity, views] + data,
                             null_count=null_count)

        if tid in (TypeId.LIST_VIEW, TypeId.LARGE_LIST_VIEW):
            offsets = self._next_buffer()
            sizes = self._next_buffer()
            child = self.load(t.value_field.type)
            return ArrayData(t, length, [validity, offsets, sizes],
                             [child], null_count=null_count)

        if tid in (TypeId.STRING, TypeId.BINARY, TypeId.LARGE_STRING,
                   TypeId.LARGE_BINARY):
            offsets = self._next_buffer()
            data = self._next_buffer()
            return ArrayData(t, length, [validity, offsets, data],
                             null_count=null_count)

        if tid in (TypeId.LIST, TypeId.MAP, TypeId.LARGE_LIST):
            offsets = self._next_buffer()
            child = self.load(t.value_field.type if tid != TypeId.MAP
                              else t.value_type)
            return ArrayData(t, length, [validity, offsets], [child],
                             null_count=null_count)

        if tid == TypeId.FIXED_SIZE_LIST:
            child = self.load(t.value_type)
            return ArrayData(t, length, [validity], [child],
                             null_count=null_count)

        if tid == TypeId.STRUCT:
            children = [self.load(f.type) for f in t.fields]
            return ArrayData(t, length, [validity], children,
                             null_count=null_count)

        raise NotImplementedError(f"IPC load for {t!r}")
