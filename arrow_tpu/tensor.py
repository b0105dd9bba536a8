"""Dense + sparse tensors with IPC interchange.

Reference analogues: cpp/src/arrow/tensor.h, sparse_tensor.h,
format/Tensor.fbs. Dense tensors round-trip through the Tensor IPC message
(interoperable with other Arrow implementations); sparse formats support
COO/CSR conversion from/to dense (host-side numpy).
"""

from __future__ import annotations

import struct
from typing import Optional, Sequence, Tuple

import flatbuffers
import numpy as np

from . import types as T
from .ipc import fb
from .ipc.fb import Reader, _table
from .ipc.message import _pad_to, encapsulate
from .ipc.schema_fb import _read_type, _write_type
from .types import DataType


class Tensor:
    """Dense n-dimensional tensor over a contiguous buffer."""

    def __init__(self, data: np.ndarray,
                 dim_names: Optional[Sequence[str]] = None):
        self.data = np.ascontiguousarray(data)
        self.dim_names = list(dim_names) if dim_names else None

    @classmethod
    def from_numpy(cls, arr, dim_names=None) -> "Tensor":
        return cls(np.asarray(arr), dim_names)

    def to_numpy(self) -> np.ndarray:
        return self.data

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.data.shape

    @property
    def strides(self) -> Tuple[int, ...]:
        return self.data.strides

    @property
    def ndim(self) -> int:
        return self.data.ndim

    @property
    def size(self) -> int:
        return self.data.size

    @property
    def type(self) -> DataType:
        return T.from_numpy_dtype(self.data.dtype)

    def equals(self, other: "Tensor") -> bool:
        return (self.shape == other.shape
                and bool(np.array_equal(self.data, other.data,
                                        equal_nan=True)))

    def __repr__(self):
        return f"Tensor({self.data.dtype}, shape={self.shape})"


def write_tensor(tensor: Tensor, sink) -> int:
    """Serialize as a Tensor IPC message (format/Tensor.fbs); returns bytes
    written."""
    b = flatbuffers.Builder(256)
    arr = tensor.data
    body = arr.tobytes()

    # strides vector (in bytes)
    b.StartVector(8, arr.ndim, 8)
    for s in reversed(arr.strides):
        b.PrependInt64(s)
    strides_vec = b.EndVector()

    # shape: [TensorDim {size, name}]
    dims = []
    for i, sz in enumerate(arr.shape):
        name_off = 0
        if tensor.dim_names:
            name_off = b.CreateString(tensor.dim_names[i])
        dims.append(_table(b, 2, [(1, "off", name_off, 0),
                                  (0, "i64", sz, 0)]))
    b.StartVector(4, len(dims), 4)
    for off in reversed(dims):
        b.PrependUOffsetTRelative(off)
    shape_vec = b.EndVector()

    disc, type_off = _write_type(b, tensor.type)
    # Tensor table: type_type(0), type(1), shape(2), strides(3), data(4)
    b.StartObject(5)
    # Buffer struct {offset: i64, length: i64} written inline
    b.Prep(8, 16)
    b.PrependInt64(len(body))   # length (later field prepended first)
    b.PrependInt64(0)           # offset within body
    b.PrependStructSlot(4, b.Offset(), 0)
    b.PrependUOffsetTRelativeSlot(3, strides_vec, 0)
    b.PrependUOffsetTRelativeSlot(2, shape_vec, 0)
    b.PrependUOffsetTRelativeSlot(1, type_off, 0)
    b.PrependUint8Slot(0, disc, 0)
    tensor_off = b.EndObject()

    msg = _table(b, 5, [
        (3, "i64", _pad_to(len(body)), 0),
        (2, "off", tensor_off, 0),
        (1, "u8", 4, 0),           # MessageHeader.Tensor
        (0, "i16", fb.METADATA_V5, 0),
    ])
    b.Finish(msg)
    meta = encapsulate(bytes(b.Output()))
    sink.write(meta)
    sink.write(body)
    pad = _pad_to(len(body)) - len(body)
    if pad:
        sink.write(b"\x00" * pad)
    return len(meta) + _pad_to(len(body))


def read_tensor(source) -> Tensor:
    """Read a Tensor IPC message (accepts bytes or a readable)."""
    if isinstance(source, (bytes, bytearray, memoryview)):
        import io
        source = io.BytesIO(source)
    head = source.read(8)
    (cont, meta_len) = struct.unpack("<II", head)
    if cont != 0xFFFFFFFF:
        meta_len = cont
        source.seek(4)
        meta = source.read(meta_len)
    else:
        meta = source.read(meta_len)
    r = Reader.root(meta)
    assert r.u8(1) == 4, "not a Tensor message"
    body_len = r.i64(3)
    tr = r.union(2)
    disc = tr.u8(0)
    type_r = tr.table(1)
    dtype = _read_type(disc, type_r, [])
    nd = tr.vector_len(2)
    shape, names = [], []
    for i in range(nd):
        dim = tr.vector_table(2, i)
        shape.append(dim.i64(0))
        nm = dim.string(1)
        names.append(nm.decode() if nm else None)
    strides = tr.vector_i64(3)
    # data buffer struct (offset,length) at slot 4
    o = tr._off(4)
    from flatbuffers import number_types as N
    data_off = tr.t.Get(N.Int64Flags, o + tr.t.Pos)
    data_len = tr.t.Get(N.Int64Flags, o + tr.t.Pos + 8)
    body = source.read(body_len)
    raw = body[data_off:data_off + data_len]
    arr = np.frombuffer(raw, dtype=dtype.to_numpy_dtype())
    arr = np.lib.stride_tricks.as_strided(
        arr, shape=shape, strides=strides) if strides else \
        arr.reshape(shape)
    names_out = names if any(n is not None for n in names) else None
    return Tensor(np.ascontiguousarray(arr), names_out)


class SparseCOOTensor:
    """COO sparse tensor (reference: sparse_tensor.h SparseCOOIndex)."""

    def __init__(self, data: np.ndarray, coords: np.ndarray,
                 shape: Sequence[int]):
        self.data = np.asarray(data)
        self.coords = np.asarray(coords)
        self.shape = tuple(shape)

    @classmethod
    def from_dense_numpy(cls, arr: np.ndarray) -> "SparseCOOTensor":
        arr = np.asarray(arr)
        coords = np.argwhere(arr != 0)
        data = arr[tuple(coords.T)]
        return cls(data, coords, arr.shape)

    def to_dense(self) -> np.ndarray:
        out = np.zeros(self.shape, dtype=self.data.dtype)
        out[tuple(self.coords.T)] = self.data
        return out

    @property
    def non_zero_length(self) -> int:
        return len(self.data)


class SparseCSRMatrix:
    """CSR sparse matrix (reference: sparse_tensor.h SparseCSRIndex)."""

    def __init__(self, data, indptr, indices, shape):
        self.data = np.asarray(data)
        self.indptr = np.asarray(indptr)
        self.indices = np.asarray(indices)
        self.shape = tuple(shape)

    @classmethod
    def from_dense_numpy(cls, arr: np.ndarray) -> "SparseCSRMatrix":
        arr = np.asarray(arr)
        assert arr.ndim == 2
        rows, cols = np.nonzero(arr)
        data = arr[rows, cols]
        indptr = np.zeros(arr.shape[0] + 1, dtype=np.int64)
        np.add.at(indptr, rows + 1, 1)
        indptr = np.cumsum(indptr)
        return cls(data, indptr, cols.astype(np.int64), arr.shape)

    def to_dense(self) -> np.ndarray:
        out = np.zeros(self.shape, dtype=self.data.dtype)
        for r in range(self.shape[0]):
            sl = slice(self.indptr[r], self.indptr[r + 1])
            out[r, self.indices[sl]] = self.data[sl]
        return out

    @property
    def non_zero_length(self) -> int:
        return len(self.data)
