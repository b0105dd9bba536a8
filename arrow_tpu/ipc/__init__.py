"""Arrow IPC interchange (stream + file format)."""

from .reader_writer import (  # noqa: F401
    RecordBatchFileReader, RecordBatchFileWriter, RecordBatchStreamReader,
    RecordBatchStreamWriter, deserialize_table, new_file, new_stream,
    open_file, open_stream, serialize_table,
)
