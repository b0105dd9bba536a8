"""IPC stream/file readers and writers.

Reference analogues: ipc/writer.h:143,167 and ipc/reader.h:74,109. The wire
bytes follow the Arrow columnar format so files interoperate with any Arrow
implementation (this is the engine's validation contract, SURVEY §2.3).
"""

from __future__ import annotations

import io
import struct
from typing import BinaryIO, Dict, List, Optional, Union

import flatbuffers

from ..array.array import Array
from ..array.data import ArrayData
from ..table import RecordBatch, Table
from ..types import Schema, TypeId
from . import fb
from .fb import Reader, _table
from .message import CONTINUATION, EOS, ArrayLoader, RecordBatchMeta, parse_message_meta, serialize_dictionary_batch, serialize_record_batch, serialize_record_batch_parts, serialize_schema_message
from .schema_fb import DictionaryFieldMapper, read_schema, write_schema

MAGIC = b"ARROW1"


def _collect_dictionaries(d: ArrayData, out: List[ArrayData]):
    """Pre-order dictionary collection matching the id assignment order of
    schema_fb.write_field."""
    if d.type.id == TypeId.DICTIONARY:
        out.append(d.dictionary)
        if d.dictionary is not None:
            for c in d.dictionary.children:
                _collect_dictionaries(c, out)
    else:
        for c in d.children:
            _collect_dictionaries(c, out)


def _attach_dictionaries(d: ArrayData, ids: List[int],
                         memo: Dict[int, ArrayData], pos: List[int]):
    if d.type.id == TypeId.DICTIONARY:
        did = ids[pos[0]]
        pos[0] += 1
        d.dictionary = memo.get(did)
        if d.dictionary is not None:
            for c in d.dictionary.children:
                _attach_dictionaries(c, ids, memo, pos)
    else:
        for c in d.children:
            _attach_dictionaries(c, ids, memo, pos)


class RecordBatchStreamWriter:
    def __init__(self, sink: BinaryIO, schema: Schema,
                 codec: Optional[str] = None):
        self.sink = sink
        self.schema = schema
        self.codec = codec
        self.mapper = DictionaryFieldMapper()
        self._dicts_written: Dict[int, ArrayData] = {}
        self._closed = False
        self.sink.write(serialize_schema_message(schema, self.mapper))

    def _write_dictionaries(self, batch: RecordBatch):
        dicts: List[ArrayData] = []
        for col in batch.columns:
            _collect_dictionaries(col.data, dicts)
        ids = self.mapper.ordered_ids
        if len(dicts) != len(ids):
            raise ValueError("dictionary count mismatch vs schema")
        for did, dd in zip(ids, dicts):
            prev = self._dicts_written.get(did)
            if prev is dd:
                continue
            if prev is not None and _same_dict(prev, dd):
                continue
            meta, body = serialize_dictionary_batch(did, dd, self.codec)
            self.sink.write(meta)
            self.sink.write(body)
            self._dicts_written[did] = dd

    def write_batch(self, batch: RecordBatch):
        if not batch.schema.equals(self.schema):
            raise ValueError(
                f"batch schema {batch.schema.names} does not match stream "
                f"schema {self.schema.names}")
        self._write_dictionaries(batch)
        meta, parts = serialize_record_batch_parts(
            [c.data for c in batch.columns], batch.num_rows, self.codec)
        self.sink.write(meta)
        for part in parts:
            self.sink.write(part)

    write = write_batch

    def write_table(self, tbl: Table, max_chunksize: Optional[int] = None):
        for b in tbl.to_batches(max_chunksize):
            self.write_batch(b)

    def close(self):
        if not self._closed:
            self.sink.write(EOS)
            self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _same_dict(a: ArrayData, b: ArrayData) -> bool:
    if a.length != b.length or a.type != b.type:
        return False
    return Array(a).to_pylist() == Array(b).to_pylist()


class RecordBatchFileWriter(RecordBatchStreamWriter):
    def __init__(self, sink: BinaryIO, schema: Schema,
                 codec: Optional[str] = None):
        self._start = sink.tell()
        sink.write(MAGIC + b"\x00\x00")
        self._dict_blocks: List[tuple] = []
        self._batch_blocks: List[tuple] = []
        super().__init__(sink, schema, codec)

    def _write_dictionaries(self, batch: RecordBatch):
        dicts: List[ArrayData] = []
        for col in batch.columns:
            _collect_dictionaries(col.data, dicts)
        ids = self.mapper.ordered_ids
        for did, dd in zip(ids, dicts):
            prev = self._dicts_written.get(did)
            if prev is not None:
                if not _same_dict(prev, dd):
                    raise ValueError(
                        "IPC file format does not support dictionary "
                        "replacement; re-encode with a unified dictionary")
                continue
            offset = self.sink.tell() - self._start
            meta, body = serialize_dictionary_batch(did, dd, self.codec)
            self.sink.write(meta)
            self.sink.write(body)
            self._dict_blocks.append((offset, len(meta), len(body)))
            self._dicts_written[did] = dd

    def write_batch(self, batch: RecordBatch):
        if not batch.schema.equals(self.schema):
            raise ValueError(
                f"batch schema {batch.schema.names} does not match file "
                f"schema {self.schema.names}")
        self._write_dictionaries(batch)
        offset = self.sink.tell() - self._start
        meta, parts = serialize_record_batch_parts(
            [c.data for c in batch.columns], batch.num_rows, self.codec)
        self.sink.write(meta)
        body_len = 0
        for part in parts:
            self.sink.write(part)
            body_len += len(part)
        self._batch_blocks.append((offset, len(meta), body_len))

    write = write_batch

    def close(self):
        if self._closed:
            return
        self.sink.write(EOS)
        b = flatbuffers.Builder(1024)
        footer_mapper = DictionaryFieldMapper()
        schema_off = write_schema(b, self.schema, footer_mapper)

        def _block_vector(blocks):
            b.StartVector(24, len(blocks), 8)
            for off, metalen, bodylen in reversed(blocks):
                b.Prep(8, 24)
                b.PrependInt64(bodylen)
                b.Pad(4)
                b.PrependInt32(metalen)
                b.PrependInt64(off)
            return b.EndVector()

        rb_vec = _block_vector(self._batch_blocks)
        dict_vec = _block_vector(self._dict_blocks)
        footer = _table(b, 5, [
            (3, "off", rb_vec, 0),
            (2, "off", dict_vec, 0),
            (1, "off", schema_off, 0),
            (0, "i16", fb.METADATA_V5, 0),
        ])
        b.Finish(footer)
        footer_bytes = bytes(b.Output())
        self.sink.write(footer_bytes)
        self.sink.write(struct.pack("<i", len(footer_bytes)))
        self.sink.write(MAGIC)
        self._closed = True


class _BufferSource:
    """Zero-copy file-like over bytes/memoryview: read() returns
    memoryview slices (the reference's BufferReader, io/memory.h:145)."""

    def __init__(self, data):
        self._mv = memoryview(data)
        self._pos = 0

    def read(self, n=-1):
        if n is None or n < 0:
            n = len(self._mv) - self._pos
        out = self._mv[self._pos:self._pos + n]
        self._pos += len(out)
        return out

    def seek(self, off, whence=0):
        if whence == 0:
            self._pos = off
        elif whence == 1:
            self._pos += off
        else:
            self._pos = len(self._mv) + off
        return self._pos

    def tell(self):
        return self._pos


class MessageStream:
    """Incremental message parser (reference: ipc/message.h:239).

    In-memory sources hand out zero-copy memoryview bodies (the
    reference's ArrayLoader assigns buffer slices "zero copy from
    source if possible", ipc/reader.cc:173)."""

    def __init__(self, source: BinaryIO):
        self.src = source
        self._zc = None
        if isinstance(source, io.BytesIO):
            try:
                self._zc = source.getbuffer()
            except Exception:
                self._zc = None

    def next_message(self):
        """Returns (header_type, header Reader, body bytes) or None at EOS."""
        first = self.src.read(4)
        if len(first) < 4:
            return None
        (word,) = struct.unpack("<I", first)
        if word == CONTINUATION:
            ln_bytes = self.src.read(4)
            if len(ln_bytes) < 4:
                return None
            (meta_len,) = struct.unpack("<I", ln_bytes)
        else:
            meta_len = word  # legacy pre-0.15 framing
        if meta_len == 0:
            return None
        meta = self.src.read(meta_len)
        if len(meta) < meta_len:
            raise ValueError("truncated IPC message metadata")
        htype, header, body_len = parse_message_meta(meta)
        if body_len and self._zc is not None:
            pos = self.src.tell()
            body = self._zc[pos:pos + body_len]
            self.src.seek(pos + body_len)
        else:
            body = self.src.read(body_len) if body_len else b""
        if len(body) < body_len:
            raise ValueError(
                f"truncated IPC message body: expected {body_len} bytes, "
                f"got {len(body)}")
        return htype, header, body


class RecordBatchStreamReader:
    def __init__(self, source: Union[BinaryIO, bytes, bytearray]):
        if isinstance(source, (bytes, bytearray, memoryview)):
            source = _BufferSource(source)
        self.stream = MessageStream(source)
        self.mapper = DictionaryFieldMapper()
        self.memo: Dict[int, ArrayData] = {}
        msg = self.stream.next_message()
        if msg is None or msg[0] != fb.MSG_SCHEMA:
            raise ValueError("expected schema message")
        self.schema = read_schema(msg[1], self.mapper)

    def _load_batch(self, header: Reader, body: bytes) -> RecordBatch:
        meta = RecordBatchMeta(header)
        loader = ArrayLoader(meta, body)
        cols = [loader.load(f.type) for f in self.schema.fields]
        ids, pos = self.mapper.ordered_ids, [0]
        for c in cols:
            _attach_dictionaries(c, ids, self.memo, pos)
        return RecordBatch(self.schema, [Array(c) for c in cols])

    def _load_dictionary(self, header: Reader, body: bytes):
        did = header.i64(0)
        is_delta = header.bool_(2)
        data_r = header.table(1)
        meta = RecordBatchMeta(data_r)
        loader = ArrayLoader(meta, body)
        vtype = self.mapper.id_to_type[did].value_type
        dd = loader.load(vtype)
        if is_delta and did in self.memo:
            from ..compute.host_concat import concat_arrays
            dd = concat_arrays([Array(self.memo[did]), Array(dd)], vtype).data
        self.memo[did] = dd

    def __iter__(self):
        return self

    def __next__(self) -> RecordBatch:
        while True:
            msg = self.stream.next_message()
            if msg is None:
                raise StopIteration
            htype, header, body = msg
            if htype == fb.MSG_DICTIONARY_BATCH:
                self._load_dictionary(header, body)
                continue
            if htype == fb.MSG_RECORD_BATCH:
                return self._load_batch(header, body)
            raise ValueError(f"unexpected message type {htype}")

    def read_all(self) -> Table:
        batches = list(self)
        return Table.from_batches(batches, self.schema)


class RecordBatchFileReader:
    def __init__(self, source: Union[BinaryIO, bytes, bytearray]):
        if isinstance(source, (bytes, bytearray, memoryview)):
            source = _BufferSource(source)
        self.src = source
        src = self.src
        src.seek(0, 2)
        size = src.tell()
        src.seek(size - len(MAGIC) - 4)
        tail = src.read(len(MAGIC) + 4)
        if tail[4:] != MAGIC:
            raise ValueError("not an Arrow file")
        (footer_len,) = struct.unpack("<i", tail[:4])
        src.seek(size - len(MAGIC) - 4 - footer_len)
        footer = src.read(footer_len)
        fr = Reader.root(footer)
        self.mapper = DictionaryFieldMapper()
        self.schema = read_schema(fr.table(1), self.mapper)
        from flatbuffers import number_types as _N
        blocks = lambda slot: fr.vector_structs(
            slot, 24, [(0, _N.Int64Flags), (8, _N.Int32Flags),
                       (16, _N.Int64Flags)])
        self._dict_blocks = blocks(2)
        self._batch_blocks = blocks(3)
        self.memo: Dict[int, ArrayData] = {}
        self._dicts_loaded = False

    @property
    def num_record_batches(self) -> int:
        return len(self._batch_blocks)

    def _read_message_at(self, offset: int):
        self.src.seek(offset)
        return MessageStream(self.src).next_message()

    def _ensure_dictionaries(self):
        if self._dicts_loaded:
            return
        for off, metalen, bodylen in self._dict_blocks:
            htype, header, body = self._read_message_at(off)
            assert htype == fb.MSG_DICTIONARY_BATCH
            did = header.i64(0)
            meta = RecordBatchMeta(header.table(1))
            loader = ArrayLoader(meta, body)
            vtype = self.mapper.id_to_type[did].value_type
            self.memo[did] = loader.load(vtype)
        self._dicts_loaded = True

    def get_batch(self, i: int) -> RecordBatch:
        self._ensure_dictionaries()
        off, metalen, bodylen = self._batch_blocks[i]
        htype, header, body = self._read_message_at(off)
        assert htype == fb.MSG_RECORD_BATCH
        meta = RecordBatchMeta(header)
        loader = ArrayLoader(meta, body)
        cols = [loader.load(f.type) for f in self.schema.fields]
        ids, pos = self.mapper.ordered_ids, [0]
        for c in cols:
            _attach_dictionaries(c, ids, self.memo, pos)
        return RecordBatch(self.schema, [Array(c) for c in cols])

    get_record_batch = get_batch

    def read_all(self) -> Table:
        return Table.from_batches(
            [self.get_batch(i) for i in range(self.num_record_batches)],
            self.schema)


# --- convenience ----------------------------------------------------------

def new_stream(sink, schema, codec=None) -> RecordBatchStreamWriter:
    return RecordBatchStreamWriter(sink, schema, codec)


def new_file(sink, schema, codec=None) -> RecordBatchFileWriter:
    return RecordBatchFileWriter(sink, schema, codec)


def open_stream(source) -> RecordBatchStreamReader:
    return RecordBatchStreamReader(source)


def open_file(source) -> RecordBatchFileReader:
    return RecordBatchFileReader(source)


def serialize_table(tbl: Table, codec=None) -> bytes:
    buf = io.BytesIO()
    with new_stream(buf, tbl.schema, codec) as w:
        w.write_table(tbl)
    return buf.getvalue()


def deserialize_table(data: bytes) -> Table:
    return open_stream(data).read_all()
