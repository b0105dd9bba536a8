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


# pyarrow.ipc name parity
from ..table import RecordBatchReader  # noqa: F401,E402
from ..api import deserialize_pandas, serialize_pandas  # noqa: F401,E402


class Alignment:
    """IPC buffer alignment choices (ipc/options.h default 8,
    64 recommended for flatbuffers-level alignment)."""
    Any = 0
    At8Byte = 8
    At64Byte = 64


def get_tensor_size(tensor) -> int:
    """Serialized IPC size of a tensor (ipc/writer.h GetTensorSize)."""
    import io as _io
    buf = _io.BytesIO()
    write_tensor(tensor, buf)
    return buf.tell()
