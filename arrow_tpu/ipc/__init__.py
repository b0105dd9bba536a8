"""Arrow IPC interchange (stream + file format)."""

from .reader_writer import (  # noqa: F401
    RecordBatchFileReader, RecordBatchFileWriter, RecordBatchStreamReader,
    RecordBatchStreamWriter, deserialize_table, new_file, new_stream,
    open_file, open_stream, serialize_table,
)
from .compat import (  # noqa: F401
    IpcReadOptions, IpcWriteOptions, Message, MessageReader,
    MetadataVersion, ReadStats, WriteStats, get_record_batch_size,
    read_message, read_record_batch, read_schema,
)
from ..tensor import read_tensor, write_tensor  # noqa: F401
