"""pyarrow.ipc-parity helpers over the core stream/file machinery
(reference: ipc/options.h IpcWriteOptions/IpcReadOptions, ipc/message.h
Message/MessageReader, ipc/reader.h ReadStats, writer.h WriteStats).
"""

from __future__ import annotations

import io as _io
from typing import Optional

from ..table import RecordBatch, Table
from .message import Message, parse_message_meta
from .reader_writer import (MessageStream, RecordBatchStreamReader,
                            open_stream, serialize_table)

_HEADER_NAMES = {1: "schema", 2: "dictionary batch", 3: "record batch",
                 4: "tensor", 5: "sparse tensor"}


class MetadataVersion:
    """format/Schema.fbs MetadataVersion — this engine writes V5."""
    V1, V2, V3, V4, V5 = 1, 2, 3, 4, 5


class IpcWriteOptions:
    """ipc/options.h:54 IpcWriteOptions. ``compression`` is a codec name
    ('zstd'/'lz4') or None; alignment is fixed at the spec's 8 bytes."""

    def __init__(self, metadata_version: int = MetadataVersion.V5,
                 allow_64bit: bool = True, use_legacy_format: bool = False,
                 compression: Optional[str] = None,
                 use_threads: bool = True,
                 emit_dictionary_deltas: bool = False,
                 unify_dictionaries: bool = False):
        if use_legacy_format:
            raise NotImplementedError("legacy (pre-0.15) IPC framing")
        self.metadata_version = metadata_version
        self.allow_64bit = allow_64bit
        self.compression = compression
        self.use_threads = use_threads
        self.emit_dictionary_deltas = emit_dictionary_deltas
        self.unify_dictionaries = unify_dictionaries


class IpcReadOptions:
    """ipc/options.h IpcReadOptions."""

    def __init__(self, ensure_native_endian: bool = True,
                 use_threads: bool = True, included_fields=None):
        self.ensure_native_endian = ensure_native_endian
        self.use_threads = use_threads
        self.included_fields = included_fields


class ReadStats:
    """ipc/reader.h ReadStats counters."""

    def __init__(self):
        self.num_messages = 0
        self.num_record_batches = 0
        self.num_dictionary_batches = 0
        self.num_dictionary_deltas = 0
        self.num_replaced_dictionaries = 0


class WriteStats:
    """ipc/writer.h WriteStats counters."""

    def __init__(self):
        self.num_messages = 0
        self.num_record_batches = 0
        self.num_dictionary_batches = 0
        self.num_dictionary_deltas = 0
        self.num_replaced_dictionaries = 0


class MessageReader:
    """ipc/message.h MessageReader: iterate raw IPC messages."""

    def __init__(self, source):
        if isinstance(source, (bytes, bytearray, memoryview)):
            source = _io.BytesIO(source)
        self._stream = MessageStream(source)

    @classmethod
    def open_stream(cls, source) -> "MessageReader":
        return cls(source)

    def read_next_message(self) -> Optional[Message]:
        nxt = self._stream.next_message()
        if nxt is None:
            return None
        htype, header, body = nxt
        return Message(htype, header, len(body), body)

    def __iter__(self):
        while True:
            m = self.read_next_message()
            if m is None:
                return
            yield m


def read_message(source) -> Optional[Message]:
    """Read one encapsulated IPC message (pyarrow.ipc.read_message)."""
    return MessageReader(source).read_next_message()


def read_schema(source):
    """Read the schema from an IPC stream/buffer
    (pyarrow.ipc.read_schema)."""
    if isinstance(source, (bytes, bytearray, memoryview)):
        source = _io.BytesIO(source)
    return open_stream(source).schema


def read_record_batch(obj, schema) -> RecordBatch:
    """Reconstruct one record batch from a standalone message/buffer
    given its schema (pyarrow.ipc.read_record_batch)."""
    if isinstance(obj, Message):
        meta_stream = None
        body = obj.body
        header = obj.header
        htype = obj.header_type
    else:
        m = read_message(bytes(obj))
        if m is None:
            raise ValueError("no IPC message in buffer")
        htype, header, body = m.header_type, m.header, m.body
    if htype != 3:
        raise ValueError(
            f"expected a record batch message, got "
            f"{_HEADER_NAMES.get(htype, htype)}")
    from .message import ArrayLoader, RecordBatchMeta
    meta = RecordBatchMeta(header)
    loader = ArrayLoader(meta, body)
    cols = [loader.load(f.type) for f in schema]
    return RecordBatch(schema, [_as_array(c) for c in cols])


def _as_array(data):
    from ..array.array import Array
    return Array(data)


def get_record_batch_size(batch: RecordBatch) -> int:
    """Size of the batch's serialized message(s), excluding the schema
    message and end-of-stream marker (pyarrow.ipc analogue)."""
    raw = serialize_table(Table.from_batches([batch], batch.schema))
    sink = _io.BytesIO()
    from .reader_writer import new_stream
    with new_stream(sink, batch.schema):
        pass
    return len(raw) - len(sink.getvalue())
