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


class SparseCSCMatrix(SparseCSRMatrix):
    """CSC sparse matrix (reference: sparse_tensor.h SparseCSCIndex) —
    CSR over the transpose, compressedAxis=Column on the wire."""

    @classmethod
    def from_dense_numpy(cls, arr: np.ndarray) -> "SparseCSCMatrix":
        arr = np.asarray(arr)
        assert arr.ndim == 2
        t = SparseCSRMatrix.from_dense_numpy(arr.T)
        out = cls(t.data, t.indptr, t.indices, arr.shape)
        return out

    def to_dense(self) -> np.ndarray:
        t = SparseCSRMatrix(self.data, self.indptr, self.indices,
                            (self.shape[1], self.shape[0]))
        return t.to_dense().T


class SparseCSFTensor:
    """Compressed-sparse-fiber N-dim tensor (reference:
    sparse_tensor.h SparseCSFIndex; format/SparseTensor.fbs
    SparseTensorIndexCSF). A prefix tree over the non-zero coordinates:
    indices[k] holds node values at depth k, indptr[k] the child ranges
    from depth k into depth k+1; the leaf level aligns with `data`."""

    def __init__(self, data, indptr, indices, axis_order, shape):
        self.data = np.asarray(data)
        self.indptr = [np.asarray(p, dtype=np.int64) for p in indptr]
        self.indices = [np.asarray(i, dtype=np.int64) for i in indices]
        self.axis_order = list(axis_order)
        self.shape = tuple(int(s) for s in shape)

    @property
    def non_zero_length(self) -> int:
        return len(self.data)

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @classmethod
    def from_dense_numpy(cls, arr: np.ndarray) -> "SparseCSFTensor":
        arr = np.asarray(arr)
        nd = arr.ndim
        nz = np.argwhere(arr != 0)  # lexicographic in axes 0..nd-1
        data = arr[tuple(nz.T)]
        indices, indptr = [], []
        prev_starts = None
        for k in range(nd):
            pref = nz[:, :k + 1]
            if len(pref):
                change = np.any(np.diff(pref, axis=0) != 0, axis=1)
                starts = np.concatenate([[True], change])
            else:
                starts = np.zeros(0, dtype=bool)
            uniq = np.nonzero(starts)[0]
            indices.append(pref[uniq, k].astype(np.int64))
            if k > 0:
                # children per unique (k-1)-prefix, as an offsets array
                parent_id = np.cumsum(prev_starts) - 1
                counts = np.bincount(parent_id[uniq],
                                     minlength=int(prev_starts.sum()))
                ptr = np.zeros(len(counts) + 1, dtype=np.int64)
                np.cumsum(counts, out=ptr[1:])
                indptr.append(ptr)
            prev_starts = starts
        return cls(data, indptr, indices, list(range(nd)), arr.shape)

    def to_dense(self) -> np.ndarray:
        nd = self.ndim
        coords = self.indices[0].reshape(-1, 1)
        for k in range(1, nd):
            counts = np.diff(self.indptr[k - 1])
            coords = np.repeat(coords, counts, axis=0)
            coords = np.concatenate(
                [coords, self.indices[k].reshape(-1, 1)], axis=1)
        out = np.zeros(self.shape, dtype=self.data.dtype)
        full = np.empty_like(coords)
        full[:, self.axis_order] = coords
        if len(coords):
            out[tuple(full.T)] = self.data
        return out

    def equals(self, other) -> bool:
        return (self.shape == other.shape
                and np.array_equal(self.to_dense(), other.to_dense()))


# --- sparse tensor IPC (format/SparseTensor.fbs) ---------------------------
# MessageHeader.SparseTensor = 5; SparseTensorIndex union:
# COO=1, CSX=2, CSF=3.

_SPARSE_COO, _SPARSE_CSX, _SPARSE_CSF = 1, 2, 3


def _int64_type(b: flatbuffers.Builder) -> int:
    """Int table {bitWidth=64, is_signed=true} for index buffers."""
    return _table(b, 2, [(1, "bool", True, False), (0, "i32", 64, 0)])


def _body_parts(parts):
    """8-align each raw part; return (offsets, lengths, joined bytes)."""
    offs, lens, chunks, pos = [], [], [], 0
    for p in parts:
        offs.append(pos)
        lens.append(len(p))
        pad = _pad_to(len(p)) - len(p)
        chunks.append(p + b"\x00" * pad)
        pos += len(p) + pad
    return offs, lens, b"".join(chunks)


def write_sparse_tensor(st, sink) -> int:
    """Serialize a SparseCOOTensor / SparseCSRMatrix / SparseCSCMatrix as a
    SparseTensor IPC message (format/SparseTensor.fbs; writer analogue:
    cpp/src/arrow/ipc/writer.cc WriteSparseTensor)."""
    b = flatbuffers.Builder(256)
    data = np.ascontiguousarray(st.data)
    vtype = T.from_numpy_dtype(data.dtype)

    if isinstance(st, SparseCOOTensor):
        coords = np.ascontiguousarray(st.coords.astype(np.int64))
        offs, lens, body = _body_parts([coords.tobytes(), data.tobytes()])
        ityp = _int64_type(b)
        b.StartVector(8, 2, 8)
        b.PrependInt64(8)                    # innermost stride
        b.PrependInt64(coords.shape[1] * 8)  # row stride (row-major)
        strides_vec = b.EndVector()
        b.StartObject(4)
        b.PrependBoolSlot(3, True, False)    # rows sorted = canonical
        b.Prep(8, 16)
        b.PrependInt64(lens[0])
        b.PrependInt64(offs[0])
        b.PrependStructSlot(2, b.Offset(), 0)
        b.PrependUOffsetTRelativeSlot(1, strides_vec, 0)
        b.PrependUOffsetTRelativeSlot(0, ityp, 0)
        idx_off, idx_disc = b.EndObject(), _SPARSE_COO
        data_off_pos, data_len = offs[1], lens[1]
    elif isinstance(st, SparseCSFTensor):
        nd = st.ndim
        parts = [np.ascontiguousarray(p).tobytes() for p in st.indptr] + \
            [np.ascontiguousarray(i).tobytes() for i in st.indices] + \
            [data.tobytes()]
        offs, lens, body = _body_parts(parts)
        ptyp = _int64_type(b)
        ityp = _int64_type(b)
        b.StartVector(16, nd - 1, 8)
        for j in reversed(range(nd - 1)):
            b.Prep(8, 16)
            b.PrependInt64(lens[j])
            b.PrependInt64(offs[j])
        indptr_vec = b.EndVector()
        b.StartVector(16, nd, 8)
        for j in reversed(range(nd - 1, 2 * nd - 1)):
            b.Prep(8, 16)
            b.PrependInt64(lens[j])
            b.PrependInt64(offs[j])
        indices_vec = b.EndVector()
        b.StartVector(4, nd, 4)
        for a in reversed(st.axis_order):
            b.PrependInt32(a)
        axis_vec = b.EndVector()
        # SparseTensorIndexCSF: indptrType(0) indptrBuffers(1)
        # indicesType(2) indicesBuffers(3) axisOrder(4)
        b.StartObject(5)
        b.PrependUOffsetTRelativeSlot(4, axis_vec, 0)
        b.PrependUOffsetTRelativeSlot(3, indices_vec, 0)
        b.PrependUOffsetTRelativeSlot(2, ityp, 0)
        b.PrependUOffsetTRelativeSlot(1, indptr_vec, 0)
        b.PrependUOffsetTRelativeSlot(0, ptyp, 0)
        idx_off, idx_disc = b.EndObject(), _SPARSE_CSF
        data_off_pos, data_len = offs[-1], lens[-1]
    else:
        axis = 1 if isinstance(st, SparseCSCMatrix) else 0
        indptr = np.ascontiguousarray(st.indptr.astype(np.int64))
        indices = np.ascontiguousarray(st.indices.astype(np.int64))
        offs, lens, body = _body_parts([indptr.tobytes(), indices.tobytes(),
                                        data.tobytes()])
        ityp1 = _int64_type(b)
        ityp2 = _int64_type(b)
        b.StartObject(5)
        b.Prep(8, 16)
        b.PrependInt64(lens[1])
        b.PrependInt64(offs[1])
        b.PrependStructSlot(4, b.Offset(), 0)
        b.PrependUOffsetTRelativeSlot(3, ityp2, 0)
        b.Prep(8, 16)
        b.PrependInt64(lens[0])
        b.PrependInt64(offs[0])
        b.PrependStructSlot(2, b.Offset(), 0)
        b.PrependUOffsetTRelativeSlot(1, ityp1, 0)
        b.PrependInt16Slot(0, axis, 0)
        idx_off, idx_disc = b.EndObject(), _SPARSE_CSX
        data_off_pos, data_len = offs[2], lens[2]

    dims = []
    for sz in st.shape:
        dims.append(_table(b, 2, [(0, "i64", sz, 0)]))
    b.StartVector(4, len(dims), 4)
    for off in reversed(dims):
        b.PrependUOffsetTRelative(off)
    shape_vec = b.EndVector()

    disc, type_off = _write_type(b, vtype)
    # SparseTensor: type_type(0) type(1) shape(2) non_zero_length(3)
    # sparseIndex_type(4) sparseIndex(5) data(6)
    b.StartObject(7)
    b.Prep(8, 16)
    b.PrependInt64(data_len)
    b.PrependInt64(data_off_pos)
    b.PrependStructSlot(6, b.Offset(), 0)
    b.PrependUOffsetTRelativeSlot(5, idx_off, 0)
    b.PrependUint8Slot(4, idx_disc, 0)
    b.PrependInt64Slot(3, st.non_zero_length, 0)
    b.PrependUOffsetTRelativeSlot(2, shape_vec, 0)
    b.PrependUOffsetTRelativeSlot(1, type_off, 0)
    b.PrependUint8Slot(0, disc, 0)
    st_off = b.EndObject()

    msg = _table(b, 5, [
        (3, "i64", len(body), 0),
        (2, "off", st_off, 0),
        (1, "u8", 5, 0),           # MessageHeader.SparseTensor
        (0, "i16", fb.METADATA_V5, 0),
    ])
    b.Finish(msg)
    meta = encapsulate(bytes(b.Output()))
    sink.write(meta)
    sink.write(body)
    return len(meta) + len(body)


def _buffer_struct(r: Reader, slot: int):
    from flatbuffers import number_types as N
    o = r._off(slot)
    off = r.t.Get(N.Int64Flags, o + r.t.Pos)
    ln = r.t.Get(N.Int64Flags, o + r.t.Pos + 8)
    return off, ln


def read_sparse_tensor(source):
    """Read a SparseTensor IPC message; returns SparseCOOTensor,
    SparseCSRMatrix or SparseCSCMatrix."""
    if isinstance(source, (bytes, bytearray, memoryview)):
        import io
        source = io.BytesIO(source)
    head = source.read(8)
    (cont, meta_len) = struct.unpack("<II", head)
    if cont != 0xFFFFFFFF:
        meta_len = cont
        source.seek(4)
    meta = source.read(meta_len)
    r = Reader.root(meta)
    assert r.u8(1) == 5, "not a SparseTensor message"
    body = source.read(r.i64(3))
    tr = r.union(2)
    dtype = _read_type(tr.u8(0), tr.table(1), []).to_numpy_dtype()
    nd = tr.vector_len(2)
    shape = [tr.vector_table(2, i).i64(0) for i in range(nd)]
    nnz = tr.i64(3)
    idx_disc = tr.u8(4)
    ir = tr.union(5)
    doff, dlen = _buffer_struct(tr, 6)
    data = np.frombuffer(body[doff:doff + dlen], dtype=dtype).copy()

    if idx_disc == _SPARSE_COO:
        ioff, ilen = _buffer_struct(ir, 2)
        coords = np.frombuffer(body[ioff:ioff + ilen],
                               dtype=np.int64).reshape(nnz, nd)
        strides = ir.vector_i64(1)
        if strides and strides[0] == 8 and nd > 1:
            # column-major coords (other writers): transpose back
            coords = np.frombuffer(body[ioff:ioff + ilen],
                                   dtype=np.int64).reshape(nd, nnz).T
        return SparseCOOTensor(data, np.ascontiguousarray(coords), shape)
    if idx_disc == _SPARSE_CSX:
        axis = ir.i16(0)
        poff, plen = _buffer_struct(ir, 2)
        ioff, ilen = _buffer_struct(ir, 4)
        indptr = np.frombuffer(body[poff:poff + plen], np.int64).copy()
        indices = np.frombuffer(body[ioff:ioff + ilen], np.int64).copy()
        cls = SparseCSCMatrix if axis == 1 else SparseCSRMatrix
        return cls(data, indptr, indices, shape)
    if idx_disc == _SPARSE_CSF:
        from flatbuffers import number_types as N
        i64f = N.Int64Flags
        bufs = ir.vector_structs(1, 16, [(0, i64f), (8, i64f)])
        indptr = [np.frombuffer(body[o:o + ln], np.int64).copy()
                  for o, ln in bufs]
        ibufs = ir.vector_structs(3, 16, [(0, i64f), (8, i64f)])
        indices = [np.frombuffer(body[o:o + ln], np.int64).copy()
                   for o, ln in ibufs]
        axis_order = ir.vector_i32(4)
        return SparseCSFTensor(data, indptr, indices, axis_order, shape)
    raise NotImplementedError(f"sparse index discriminant {idx_disc}")
