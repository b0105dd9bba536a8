"""Device-resident columnar data.

This is the engine's execution representation — the TPU-native redesign of
ArrayData (SURVEY §7 stage 1):

* values: a padded, fixed-capacity ``jax.Array`` (static shape for XLA)
* validity: an optional bool mask array (byte mask, NOT packed bits — the
  packed representation only exists at the host/IPC boundary)
* variable-length strings/binary are dictionary-encoded at upload; kernels
  see int32 codes, the dictionary stays host-side and is only consulted at
  plan boundaries (literal binding, download)
* a DeviceBatch carries a dynamic ``row_count`` scalar alongside static
  ``capacity`` so data-dependent sizes (filter/join output) never change
  compiled shapes.

DeviceColumn/DeviceBatch are registered pytrees and can be passed directly
through ``jax.jit`` / ``shard_map``.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import types as T
from ..array.array import Array, array as make_array
from ..array.data import ArrayData
from ..buffer import Buffer
from ..table import RecordBatch, Table
from ..types import DataType, Field, Schema, TypeId
from ..utils import bits as bitutil

# Row blocks are padded to a multiple of this (TPU lane width ×8 sublanes).
BLOCK = 1024


def round_up(n: int, m: int = BLOCK) -> int:
    return max(m, (n + m - 1) // m * m)


def capacity_class(n: int) -> int:
    """Round a data-dependent output size up to its power-of-two capacity
    class (min BLOCK). Data-dependent capacities (join matches, filtered
    counts) are part of every jit cache key; classing them bounds the
    number of distinct compiled programs to log2(rows) instead of one per
    observed size — on the tunneled TPU platform each extra program costs
    a 60-90 s remote compile. ARROW_TPU_CAP_CLASS=exact opts out (wastes
    no gather lanes, recompiles per size)."""
    import os
    if os.environ.get("ARROW_TPU_CAP_CLASS", "pow2") == "exact":
        return round_up(n)
    return max(BLOCK, 1 << (max(n, 1) - 1).bit_length())


_JNP_DTYPES = {
    TypeId.BOOL: jnp.bool_,
    TypeId.INT8: jnp.int8, TypeId.INT16: jnp.int16,
    TypeId.INT32: jnp.int32, TypeId.INT64: jnp.int64,
    TypeId.UINT8: jnp.uint8, TypeId.UINT16: jnp.uint16,
    TypeId.UINT32: jnp.uint32, TypeId.UINT64: jnp.uint64,
    TypeId.HALF_FLOAT: jnp.float16,
    TypeId.FLOAT: jnp.float32, TypeId.DOUBLE: jnp.float64,
    TypeId.DATE32: jnp.int32, TypeId.DATE64: jnp.int64,
    TypeId.TIMESTAMP: jnp.int64, TypeId.TIME32: jnp.int32,
    TypeId.TIME64: jnp.int64, TypeId.DURATION: jnp.int64,
    TypeId.INTERVAL_MONTHS: jnp.int32,
}


def jnp_dtype_for(t: DataType):
    if t.id == TypeId.DICTIONARY:
        return _JNP_DTYPES[t.index_type.id]
    if t.id in (TypeId.STRING, TypeId.BINARY, TypeId.LARGE_STRING,
                TypeId.LARGE_BINARY):
        return jnp.int32  # dictionary codes
    if t.id == TypeId.NA:
        return jnp.int8  # all-null column: dummy zeros + all-false validity
    if t.id in (TypeId.DECIMAL128, TypeId.DECIMAL256, TypeId.DECIMAL32, TypeId.DECIMAL64):
        # device decimal = unscaled int64 (SURVEY §2.2 "decimals → int64
        # on TPU"); wider precisions ride as dictionary codes (see
        # upload_column)
        if t.precision > 18:
            return jnp.int32
        return jnp.int64
    if t.id == TypeId.FIXED_SIZE_BINARY:
        return jnp.int32  # dictionary codes
    if t.id in _JNP_DTYPES:
        return _JNP_DTYPES[t.id]
    raise NotImplementedError(f"no device representation for {t!r}")


class _HostRef:
    """Identity-hashable wrapper so host-side payloads (dictionaries) can sit
    in pytree aux data. Equality is object identity: reuse the same
    dictionary object across batches to keep jit caches warm."""

    __slots__ = ("obj",)

    def __init__(self, obj):
        self.obj = obj

    def __hash__(self):
        return id(self.obj)

    def __eq__(self, other):
        return isinstance(other, _HostRef) and self.obj is other.obj

    def __repr__(self):
        return f"_HostRef({type(self.obj).__name__})"


@jax.tree_util.register_pytree_node_class
class DeviceColumn:
    """A single padded device column. ``dictionary`` (host Array) is aux
    data: identity-stable per table, never read inside kernels."""

    __slots__ = ("values", "validity", "type", "dictionary")

    def __init__(self, values: jax.Array, validity: Optional[jax.Array],
                 type: DataType, dictionary: Optional[Array] = None):
        self.values = values
        self.validity = validity
        self.type = type
        self.dictionary = dictionary

    @property
    def capacity(self) -> int:
        return self.values.shape[0]

    def with_values(self, values, validity="keep") -> "DeviceColumn":
        v = self.validity if validity == "keep" else validity
        return DeviceColumn(values, v, self.type, self.dictionary)

    def valid_mask(self, row_mask: Optional[jax.Array] = None) -> jax.Array:
        """bool[capacity]; combines validity with the batch row mask."""
        m = self.validity
        if m is None:
            m = jnp.ones(self.capacity, dtype=jnp.bool_)
        if row_mask is not None:
            m = jnp.logical_and(m, row_mask)
        return m

    def tree_flatten(self):
        if self.validity is None:
            return (self.values,), (self.type, False,
                                    _HostRef(self.dictionary))
        return (self.values, self.validity), (self.type, True,
                                              _HostRef(self.dictionary))

    @classmethod
    def tree_unflatten(cls, aux, children):
        type_, has_validity, dict_ref = aux
        if has_validity:
            values, validity = children
        else:
            (values,), validity = children, None
        return cls(values, validity, type_, dict_ref.obj)

    def __repr__(self):
        return (f"DeviceColumn({self.type!r}, cap={self.capacity}, "
                f"validity={'yes' if self.validity is not None else 'no'})")


@jax.tree_util.register_pytree_node_class
class DeviceBatch:
    """An ordered set of equal-capacity DeviceColumns + dynamic row count.

    The TPU-native ExecBatch (reference: compute/exec.h:174): static
    capacity keeps XLA shapes stable, ``row_count`` carries the true
    length."""

    __slots__ = ("schema", "columns", "row_count")

    def __init__(self, schema: Schema, columns: Sequence[DeviceColumn],
                 row_count: jax.Array):
        self.schema = schema
        self.columns = list(columns)
        self.row_count = row_count

    @property
    def capacity(self) -> int:
        return self.columns[0].capacity if self.columns else 0

    @property
    def num_columns(self) -> int:
        return len(self.columns)

    def column(self, i: Union[int, str]) -> DeviceColumn:
        if isinstance(i, str):
            idx = self.schema.get_field_index(i)
            if idx < 0:
                raise KeyError(f"no column named {i!r}")
            i = idx
        return self.columns[i]

    def row_mask(self) -> jax.Array:
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.row_count

    def with_columns(self, schema: Schema,
                     columns: Sequence[DeviceColumn],
                     row_count=None) -> "DeviceBatch":
        rc = self.row_count if row_count is None else row_count
        return DeviceBatch(schema, columns, rc)

    def select(self, names: Sequence[str]) -> "DeviceBatch":
        idxs = [self.schema.get_field_index(n) for n in names]
        return DeviceBatch(
            Schema([self.schema.fields[i] for i in idxs]),
            [self.columns[i] for i in idxs], self.row_count)

    def tree_flatten(self):
        return (self.columns, self.row_count), self.schema

    @classmethod
    def tree_unflatten(cls, schema, children):
        columns, row_count = children
        return cls(schema, columns, row_count)

    def __repr__(self):
        return (f"DeviceBatch(cap={self.capacity}, "
                f"cols={self.schema.names})")


# --- upload ---------------------------------------------------------------

def _dictionary_encode_host(arr: Array) -> Tuple[np.ndarray, Optional[np.ndarray], Array]:
    """Host-side dictionary encode of string/binary values -> (codes,
    valid_mask, dictionary). Native C++ hash-map encoder when available
    (arrow_tpu.native), numpy fallback otherwise."""
    d = arr.data
    mask = d.validity_mask()
    offs = d.offsets().astype(np.int64)
    raw = d.data_bytes()
    is_str = arr.type.id in (TypeId.STRING, TypeId.LARGE_STRING)

    from ..native import dict_encode_binary
    native = dict_encode_binary(
        raw, offs, None if mask is None else mask.astype(np.uint8))
    if native is not None:
        codes, uoffs, ubytes = native
        dict_type = T.string() if is_str else T.binary()
        dict_arr = Array(ArrayData(dict_type, len(uoffs) - 1,
                                   [None, Buffer(uoffs), Buffer(ubytes)],
                                   null_count=0))
        return codes, mask, dict_arr

    # numpy fallback
    vals = np.empty(d.length, dtype=object)
    rawb = raw.tobytes()
    for i in range(d.length):
        vals[i] = rawb[offs[i]:offs[i + 1]]
    if mask is not None:
        vals[~mask] = b""
    uniq, codes = np.unique(vals.astype(object), return_inverse=True)
    # reorder uniques by first appearance for determinism
    first_pos = np.full(len(uniq), d.length, dtype=np.int64)
    np.minimum.at(first_pos, codes, np.arange(d.length))
    order = np.argsort(first_pos, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    codes = rank[codes].astype(np.int32)
    uniq = uniq[order]
    dict_vals = [u.decode() if is_str else bytes(u) for u in uniq]
    dict_arr = make_array(dict_vals,
                          T.string() if is_str else T.binary())
    return codes, mask, dict_arr


class HostColumn:
    """Host-side prepared device representation of a column: unpadded
    numpy values + optional bool mask + type + (identity-stable)
    dictionary. Separating preparation from the device_put lets chunked
    execution slice ONE prepared column into many uploads that all share
    the same dictionary object (comparable codes + warm jit caches)."""

    __slots__ = ("values", "mask", "type", "dictionary")

    def __init__(self, values: np.ndarray, mask: Optional[np.ndarray],
                 type: DataType, dictionary: Optional[Array] = None):
        self.values = values
        self.mask = mask
        self.type = type
        self.dictionary = dictionary

    def __len__(self):
        return len(self.values)

    def slice_upload(self, start: int, length: int,
                     capacity: int) -> DeviceColumn:
        vals = np.zeros(capacity, dtype=self.values.dtype)
        vals[:length] = self.values[start:start + length]
        validity = None
        if self.mask is not None:
            m = np.zeros(capacity, dtype=np.bool_)
            m[:length] = self.mask[start:start + length]
            validity = jnp.asarray(m)
        return DeviceColumn(jnp.asarray(vals), validity, self.type,
                            self.dictionary)


def host_column_repr(arr: Array) -> HostColumn:
    """Prepare a column's device representation on the host (unpadded)."""
    t = arr.type
    n = len(arr)
    tid = t.id

    if tid in (TypeId.STRING_VIEW, TypeId.BINARY_VIEW):
        # views flatten to their plain counterpart at upload: the device
        # representation is dictionary codes either way
        flat_t = T.string() if tid == TypeId.STRING_VIEW else T.binary()
        arr = make_array(arr.to_pylist(), flat_t)
        t = flat_t
        tid = t.id

    if tid in (TypeId.STRING, TypeId.BINARY, TypeId.LARGE_STRING,
               TypeId.LARGE_BINARY):
        codes, mask, dict_arr = _dictionary_encode_host(arr)
        return HostColumn(codes.astype(np.int32, copy=False),
                          _mask_or_none(mask, arr.null_count), t, dict_arr)

    if tid == TypeId.DICTIONARY:
        d = arr.data
        mask = d.validity_mask()
        codes = d.values()
        return HostColumn(codes, _mask_or_none(mask, arr.null_count), t,
                          Array(d.dictionary) if d.dictionary else None)

    if tid == TypeId.NA:
        return HostColumn(np.zeros(n, dtype=np.int8),
                          np.zeros(n, dtype=np.bool_), t)

    if tid in (TypeId.DECIMAL128, TypeId.DECIMAL256, TypeId.DECIMAL32, TypeId.DECIMAL64):
        if t.precision <= 18:
            d = arr.data
            w = t.byte_width
            raw = d.buffers[1].to_numpy().reshape(-1, w)[d.offset:d.offset + n]
            # two's-complement little-endian truncated to the low limb is
            # the value itself whenever it fits in int64 (precision <= 18
            # does)
            low = raw[:, :8].copy().view(np.int64).reshape(-1)
            return HostColumn(low, _mask_or_none(arr.data.validity_mask(),
                                                 arr.null_count), t)
        # precision > 18: dictionary-encode the 16/32-byte two's-complement
        # values — codes give exact equality for group/join keys; order-by
        # ranks the (Decimal-valued) dictionary host-side like strings
        codes, mask, dict_arr = _dictionary_encode_fixed(arr)
        return HostColumn(codes.astype(np.int32, copy=False),
                          _mask_or_none(mask, arr.null_count), t, dict_arr)

    if tid == TypeId.FIXED_SIZE_BINARY:
        codes, mask, dict_arr = _dictionary_encode_fixed(arr)
        return HostColumn(codes.astype(np.int32, copy=False),
                          _mask_or_none(mask, arr.null_count), t, dict_arr)

    try:
        dtype = jnp_dtype_for(t)
    except NotImplementedError:
        # host passthrough: nested/union/REE/interval columns have no
        # fixed-width device representation; they ride plans as row-id
        # codes with the host Array in the dictionary slot. Row movement
        # (filter/sort payloads/take/join carry) works on the ids; the
        # values are rehydrated at download. Compute ON such a column
        # stays host-tier (reference precedent: Acero's Grouper/joins
        # don't accept nested keys either).
        codes = np.arange(n, dtype=np.int32)
        mask = arr.data.validity_mask()
        return HostColumn(codes, _mask_or_none(mask, arr.null_count), t,
                          arr)

    host_vals = np.asarray(arr.data.values(), dtype=np.dtype(dtype))
    mask = arr.data.validity_mask()
    return HostColumn(host_vals, _mask_or_none(mask, arr.null_count), t)


def _mask_or_none(mask: Optional[np.ndarray],
                  null_count: int) -> Optional[np.ndarray]:
    if null_count == 0 or mask is None:
        return None
    return mask


def upload_column(arr: Array, capacity: Optional[int] = None) -> DeviceColumn:
    n = len(arr)
    cap = capacity if capacity is not None else round_up(n)
    return host_column_repr(arr).slice_upload(0, n, cap)


def _dictionary_encode_fixed(arr: Array) -> Tuple[np.ndarray,
                                                  Optional[np.ndarray],
                                                  Array]:
    """Dictionary-encode a fixed-width byte type (fixed-size binary or
    decimal wider than 18 digits): (codes, valid_mask, dictionary Array of
    the same type). Null rows are zeroed before encoding so every row has
    uniform width; validity hides them.

    The dictionary is VALUE-SORTED (bytes lexicographic for FSB, signed
    numeric for decimals), so code order == value order: comparisons,
    sorts, and min/max on codes are exact without a rank transform."""
    d = arr.data
    t = arr.type
    w = t.byte_width
    n = d.length
    mask = d.validity_mask()
    raw = np.ascontiguousarray(d.values()).reshape(n, w)
    if mask is not None:
        raw = raw.copy()
        raw[~mask] = 0
    if n == 0:
        dict_arr = Array(ArrayData(t, 0,
                                   [None, Buffer(np.zeros(0, np.uint8))],
                                   null_count=0))
        return np.zeros(0, dtype=np.int32), mask, dict_arr
    is_decimal = t.id in (TypeId.DECIMAL128, TypeId.DECIMAL256,
                          TypeId.DECIMAL32, TypeId.DECIMAL64)
    if is_decimal:
        # order by signed value: flip the two's-complement sign bit and
        # reverse to big-endian so lexicographic row order == numeric order
        keys = raw[:, ::-1].copy()
        keys[:, 0] ^= 0x80
    else:
        keys = raw
    uniq_keys, inv = np.unique(keys, axis=0, return_inverse=True)
    codes = inv.reshape(-1).astype(np.int32)
    if is_decimal:
        uniq = uniq_keys.copy()
        uniq[:, 0] ^= 0x80
        uniq = uniq[:, ::-1]
    else:
        uniq = uniq_keys
    ubytes = np.ascontiguousarray(uniq).reshape(-1)
    dict_arr = Array(ArrayData(t, len(uniq), [None, Buffer(ubytes)],
                               null_count=0))
    return codes, mask, dict_arr


def _upload_mask(mask: Optional[np.ndarray], n: int, cap: int,
                 null_count: int) -> Optional[jax.Array]:
    if null_count == 0 or mask is None:
        return None
    m = np.zeros(cap, dtype=np.bool_)
    m[:n] = mask
    return jnp.asarray(m)


_SYNC_UPLOADS = None


def _sync_uploads() -> bool:
    """Serialize host->device column transfers on the tunneled platform:
    the relay deadlocks on deep concurrent transfer queues (observed
    round 3: SF1 lineitem's ~16 parallel 64 MB uploads hang FOREVER
    while strictly sequential puts stream at 75 MB/s — same failure
    family as the per-node execution queue wedge, exec.py _sync_nodes).
    Override with ARROW_TPU_SYNC_UPLOADS=on|off."""
    global _SYNC_UPLOADS
    mode = os.environ.get("ARROW_TPU_SYNC_UPLOADS", "auto")
    if mode == "on":
        return True
    if mode == "off":
        return False
    if _SYNC_UPLOADS is None:
        try:
            from ..platform_check import platform_kind
            _SYNC_UPLOADS = platform_kind() == "axon"
        except Exception:
            _SYNC_UPLOADS = False
    return _SYNC_UPLOADS


def _gate_column(col: DeviceColumn) -> None:
    """Force completion of one column's transfers (readback of a single
    element is the only reliable barrier on the tunnel)."""
    np.asarray(col.values[:1])
    if col.validity is not None:
        np.asarray(col.validity[:1])


def upload_batch(batch: RecordBatch,
                 capacity: Optional[int] = None) -> DeviceBatch:
    cap = capacity if capacity is not None else round_up(batch.num_rows)
    gate = _sync_uploads()
    cols = []
    for c in batch.columns:
        dc = upload_column(c, cap)
        if gate:
            _gate_column(dc)
        cols.append(dc)
    return DeviceBatch(batch.schema, cols,
                       jnp.asarray(batch.num_rows, dtype=jnp.int32))


def upload_table(tbl: Table, capacity: Optional[int] = None) -> DeviceBatch:
    """Upload a whole table as one DeviceBatch (combining chunks so each
    column gets a single, identity-stable dictionary)."""
    batches = tbl.to_batches()
    rb = batches[0] if len(batches) == 1 else \
        RecordBatch(tbl.schema, [c.combine() for c in tbl.columns])
    return upload_batch(rb, capacity)


# --- download -------------------------------------------------------------

def download_column(col: DeviceColumn, n: int,
                    decode_strings: bool = True) -> Array:
    t = col.type
    if t.id == TypeId.NA:
        return Array(ArrayData(t, n, [], null_count=n))
    vals = np.asarray(col.values[:n])
    mask = None if col.validity is None else np.asarray(col.validity[:n])
    null_count = 0 if mask is None else int(n - mask.sum())
    vbuf = None if null_count == 0 else Buffer(bitutil.pack_bits(mask))
    if null_count == 0:
        mask = None

    if t.id in (TypeId.STRING, TypeId.BINARY, TypeId.LARGE_STRING,
                TypeId.LARGE_BINARY):
        dict_arr = col.dictionary
        if dict_arr is None:
            raise ValueError("string column missing dictionary")
        if not decode_strings:
            data = ArrayData(T.dictionary(T.int32(), dict_arr.type),
                             n, [vbuf, Buffer(vals.astype(np.int32))],
                             null_count=null_count,
                             dictionary=dict_arr.data)
            return Array(data)
        return _decode_strings(vals, mask, dict_arr, t, null_count, vbuf)

    if t.id == TypeId.DICTIONARY:
        data = ArrayData(t, n, [vbuf, Buffer(vals)], null_count=null_count,
                         dictionary=col.dictionary.data
                         if col.dictionary else None)
        return Array(data)

    if t.id == TypeId.BOOL:
        return Array(ArrayData(
            t, n, [vbuf, Buffer(bitutil.pack_bits(vals.astype(np.bool_)))],
            null_count=null_count))

    if col.dictionary is not None:
        # generic dictionary decode (fixed-size binary / wide decimal /
        # host-passthrough nested columns)
        codes = vals.astype(np.int64)
        if mask is not None:
            codes = np.where(mask, codes, 0)
        nd = len(col.dictionary)
        codes = np.clip(codes, 0, max(nd - 1, 0))
        if t.id in (TypeId.FIXED_SIZE_BINARY, TypeId.DECIMAL128,
                    TypeId.DECIMAL256, TypeId.DECIMAL32, TypeId.DECIMAL64):
            w = t.byte_width
            draw = col.dictionary.data.values().reshape(nd, w) if nd \
                else np.zeros((1, w), dtype=np.uint8)
            rows = draw[codes] if nd else np.zeros((n, w), dtype=np.uint8)
            return Array(ArrayData(t, n,
                                   [vbuf, Buffer(
                                       np.ascontiguousarray(rows)
                                       .reshape(-1))],
                                   null_count=null_count))
        dvals = col.dictionary.to_pylist()
        out = [None if (mask is not None and not mask[i])
               else dvals[int(codes[i])] for i in range(n)]
        return make_array(out, t)

    if t.id in (TypeId.DECIMAL128, TypeId.DECIMAL256, TypeId.DECIMAL32, TypeId.DECIMAL64):
        w = t.byte_width
        low = vals.astype(np.int64)
        raw = np.zeros((n, w), dtype=np.uint8)
        raw[:, :8] = low.view(np.uint8).reshape(n, 8)
        # sign-extend the upper limbs
        raw[:, 8:] = np.where(low[:, None] < 0, 0xFF, 0).astype(np.uint8)
        return Array(ArrayData(t, n, [vbuf, Buffer(raw.reshape(-1))],
                               null_count=null_count))

    target = t.to_numpy_dtype()
    if vals.dtype != target:
        vals = vals.astype(target)
    return Array(ArrayData(t, n, [vbuf, Buffer(vals)],
                           null_count=null_count))


def _decode_strings(codes: np.ndarray, mask: Optional[np.ndarray],
                    dict_arr: Array, t: DataType, null_count: int,
                    vbuf) -> Array:
    dd = dict_arr.data
    doffs = dd.offsets().astype(np.int64)
    draw = dd.data_bytes()
    codes = codes.astype(np.int64)
    if mask is not None:
        codes = np.where(mask, codes, 0)
    lens = doffs[codes + 1] - doffs[codes]
    if mask is not None:
        lens = np.where(mask, lens, 0)
    large = t.id in (TypeId.LARGE_STRING, TypeId.LARGE_BINARY)
    off_dt = np.int64 if large else np.int32
    out_offs = np.zeros(len(codes) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_offs[1:])
    total = int(out_offs[-1])
    out = np.zeros(total, dtype=np.uint8)
    # vectorized gather of byte ranges via repeat+cumsum trick
    if total > 0:
        starts = doffs[codes]
        nz = lens > 0
        if nz.any():
            idx_starts = np.repeat(starts[nz], lens[nz])
            within = np.arange(total) - np.repeat(out_offs[:-1][nz], lens[nz])
            out = draw[idx_starts + within]
    return Array(ArrayData(t, len(codes),
                           [vbuf, Buffer(out_offs.astype(off_dt)),
                            Buffer(out)], null_count=null_count))


def download_batch(batch: DeviceBatch,
                   decode_strings: bool = True) -> RecordBatch:
    n = int(batch.row_count)
    cols = [download_column(c, n, decode_strings) for c in batch.columns]
    schema = Schema([Field(f.name, c.type, f.nullable)
                     for f, c in zip(batch.schema.fields, cols)],
                    batch.schema.metadata)
    return RecordBatch(schema, cols)


def download_table(batch: DeviceBatch, decode_strings: bool = True) -> Table:
    return Table.from_batches([download_batch(batch, decode_strings)])
