"""arrow_tpu: a TPU-native columnar data engine.

The data model follows the Arrow columnar specification (validated against
the reference implementation via IPC round-trips); the execution engine is a
fresh JAX/XLA/Pallas design: columns live as padded device arrays with byte
validity masks, operators are jitted kernels, distribution is mesh
collectives (shard_map / all_to_all), not RPC.
"""

from .types import (  # noqa: F401
    TypeId, DataType, Field, Schema,
    null, bool_, int8, int16, int32, int64,
    uint8, uint16, uint32, uint64,
    float16, float32, float64,
    string, large_string, binary, large_binary, fixed_size_binary,
    date32, date64, timestamp, time32, time64, duration,
    month_interval, day_time_interval, month_day_nano_interval,
    decimal32, decimal64, decimal128, decimal256,
    list_, large_list, fixed_size_list, struct, map_,
    string_view, binary_view, list_view, large_list_view,
    dictionary, sparse_union, dense_union, run_end_encoded,
    field, schema, from_numpy_dtype,
)
from .buffer import Buffer, allocate_buffer, as_buffer  # noqa: F401
from .array.data import ArrayData  # noqa: F401
from .array.array import Array, array  # noqa: F401
from .array.builder import (  # noqa: F401
    AdaptiveIntBuilder, ArrayBuilder, BinaryBuilder, BooleanBuilder,
    DictionaryBuilder, DoubleBuilder, FloatBuilder, Int8Builder,
    Int16Builder, Int32Builder, Int64Builder, ListBuilder, StringBuilder,
    StructBuilder, UInt8Builder, UInt16Builder, UInt32Builder,
    UInt64Builder, builder_for)
from .table import (  # noqa: F401
    ChunkedArray, ChunkResolver, Datum, RecordBatch, RecordBatchReader,
    Table, chunked_array, record_batch, table,
)

from .memory import (  # noqa: F401
    CappedMemoryPool, LoggingMemoryPool, MemoryPool, ProxyMemoryPool,
    default_memory_pool, device_memory_stats, log_memory_allocations,
    supported_memory_backends, system_memory_pool, total_allocated_bytes,
)
from .errors import (  # noqa: F401
    ArrowCancelled, ArrowCapacityError, ArrowException, ArrowIOError,
    ArrowIndexError, ArrowInvalid, ArrowKeyError, ArrowMemoryError,
    ArrowNotImplementedError, ArrowSerializationError, ArrowTypeError,
)
from .api import (  # noqa: F401
    concat_arrays, concat_batches, concat_tables, deserialize_pandas,
    infer_type, nulls, repeat, scalar, serialize_pandas, show_info,
    show_versions, type_for_alias, unify_schemas,
)
from .io_streams import (  # noqa: F401
    BufferedInputStream, BufferedOutputStream, BufferOutputStream,
    BufferReader, Codec, CompressedInputStream, CompressedOutputStream,
    FixedSizeBufferWriter, MemoryMappedFile, MockOutputStream, NativeFile,
    OSFile, PythonFile, ResizableBuffer, TransformInputStream, compress,
    create_memory_map, decompress, foreign_buffer, input_stream,
    memory_map, output_stream, py_buffer, transcoding_input_stream,
)
from .extension import (  # noqa: F401
    Bool8Type, ExtensionArray, ExtensionType, FixedShapeTensorArray,
    FixedShapeTensorType, JsonType, OpaqueType, UuidType,
    VariableShapeTensorType, bool8, fixed_shape_tensor, json_, opaque,
    register_extension_type, unregister_extension_type, uuid,
    variable_shape_tensor,
)
from .compute.registry import Scalar  # noqa: F401
from .table import TableGroupBy  # noqa: F401
from .types import (  # noqa: F401
    string as utf8, large_string as large_utf8,
)
from .types import (  # noqa: F401
    DictionaryType, DurationType, FixedSizeBinaryType, FixedSizeListType,
    ListType, MapType, RunEndEncodedType, StructType, TimestampType,
    UnionType,
)
from .config import build_info, runtime_info  # noqa: F401

from . import compute  # noqa: F401
from . import ipc  # noqa: F401
from .compat_names import *  # noqa: F401,F403
from .ipc import (  # noqa: F401
    Message, MessageReader, MetadataVersion, RecordBatchFileReader,
    RecordBatchFileWriter, RecordBatchStreamReader,
    RecordBatchStreamWriter,
)
from .tensor import (  # noqa: F401
    SparseCOOTensor, SparseCSCMatrix, SparseCSFTensor, SparseCSRMatrix,
    Tensor,
)
from .config import (  # noqa: F401
    BuildInfo, RuntimeInfo,
)
from .device import (  # noqa: F401
    Device, DeviceAllocationType, MemoryManager,
    default_cpu_memory_manager,
)

# pyarrow lib.pyx misc aliases
CppBuildInfo = BuildInfo
VersionInfo = tuple


def cpp_build_info():
    return build_info()


def cpp_version():
    return build_info().version


def cpp_version_info():
    v = build_info().version.split(".")
    return tuple(int(x) for x in v[:3])


def set_memory_pool(pool) -> None:
    from . import memory as _memory
    _memory._default_pool = pool


def logging_memory_pool(parent):
    from .memory import LoggingMemoryPool
    return LoggingMemoryPool(parent)


def proxy_memory_pool(parent):
    from .memory import ProxyMemoryPool
    return ProxyMemoryPool(parent)


def jemalloc_memory_pool():
    raise NotImplementedError(
        "jemalloc backend not available (memory is managed by XLA's "
        "BFC allocator; use system_memory_pool)")


def mimalloc_memory_pool():
    raise NotImplementedError(
        "mimalloc backend not available (memory is managed by XLA's "
        "BFC allocator; use system_memory_pool)")


# null sentinel (pyarrow.NA)
NA = Scalar(None, null())
NULL = NA

# pyarrow.lib / pyarrow.util module aliases
import sys as _sys
lib = _sys.modules[__name__]
from . import utils as util  # noqa: F401,E402


def __getattr__(name):
    # heavier subsystems load lazily
    import importlib
    lazy = {"acero": ".acero", "dataset": ".dataset", "fs": ".fs",
            "flight": ".flight", "parallel": ".parallel",
            "tensor": ".tensor", "c_data": ".c_data",
            "gandiva": ".gandiva", "device": ".device",
            "pretty": ".pretty", "substrait": ".substrait",
            "config": ".config", "orc": ".io.orc",
            "compare": ".compare", "interchange": ".interchange"}
    if name in lazy:
        return importlib.import_module(lazy[name], __name__)
    raise AttributeError(name)


__version__ = "0.1.0"


# --- runtime info / global options ------------------------------------------
# Reference analogue: cpp/src/arrow/util/cpu_info.h, io/interfaces.h thread
# pools, config.h RuntimeInfo. Thread counts here size HOST-side pools
# (IPC/Parquet IO, dictionary encode); device compute is XLA-scheduled.

_cpu_count = [None]
_io_thread_count = [8]


def cpu_count() -> int:
    if _cpu_count[0] is None:
        import os
        _cpu_count[0] = os.cpu_count() or 1
    return _cpu_count[0]


def set_cpu_count(count: int):
    if count < 1:
        raise ValueError("cpu_count must be strictly positive")
    _cpu_count[0] = int(count)


def io_thread_count() -> int:
    return _io_thread_count[0]


def set_io_thread_count(count: int):
    if count < 1:
        raise ValueError("io_thread_count must be strictly positive")
    _io_thread_count[0] = int(count)


def runtime_info() -> dict:
    """Build/runtime facts (reference: config.h RuntimeInfo)."""
    import jax
    return {
        "version": __version__,
        "backend": jax.default_backend(),
        "device_count": jax.device_count(),
        "cpu_count": cpu_count(),
        "io_thread_count": io_thread_count(),
    }
