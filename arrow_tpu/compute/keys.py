"""Order- and equality-preserving key normalization.

The device adaptation of the reference's row encoding
(compute/row/encode_internal.h): instead of byte-comparable row strings, each
key column becomes a (class, word) pair of device arrays:

* word: uint64 whose unsigned order equals the column's value order
* class: small int separating values / NaN / null / padding so null
  placement and NaN ordering (vector_sort.cc:527-583) are explicit

Multi-column keys feed XLA's multi-operand stable sort (lax.sort) — the
vectorized replacement for the reference's comparator-based stable sorts.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from ..device.column import DeviceColumn

SIGN64 = jnp.uint64(0x8000000000000000)

_QNAN_BITS = jnp.uint64(0x7FF8000000000000)


def _native_bitcast64() -> bool:
    """True where 64-bit bitcast_convert lowers (CPU). On TPU the x64
    rewriter emulates f64 as an (hi, lo) float32 pair (~49-bit significand,
    f32 exponent range) and cannot lower 64-bit bitcasts — nor frexp/ldexp,
    which bitcast internally."""
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def _f64_pair_words(f: jax.Array):
    """(hi_bits, lo_bits) uint32 pair for an f64 array via its float-float
    decomposition — the TPU's native representation. hi = round32(f),
    lo = round32(f - hi): canonical, so the pair is injective over
    device-representable values, and (hi, lo) ordered lexicographically
    as reals reproduces the value order."""
    hi = f.astype(jnp.float32)
    lo = (f - hi.astype(jnp.float64)).astype(jnp.float32)
    hb = jax.lax.bitcast_convert_type(hi, jnp.uint32)
    lb = jax.lax.bitcast_convert_type(lo, jnp.uint32)
    return hb, lb


def f64_bits(f: jax.Array) -> jax.Array:
    """uint64 word that is equality-preserving for f64 values as the device
    represents them. On CPU this is the exact IEEE-754 bit pattern; on TPU
    it is the packed (hi, lo) float-float pair (bit-identical values map to
    bit-identical words; -0.0 keeps a distinct word, matching the
    reference's memcmp-able row encoding). NaNs canonicalize to one word."""
    if _native_bitcast64():
        word = jax.lax.bitcast_convert_type(f, jnp.uint64)
    else:
        hb, lb = _f64_pair_words(f)
        word = (hb.astype(jnp.uint64) << 32) | lb.astype(jnp.uint64)
    return jnp.where(jnp.isnan(f), _QNAN_BITS, word)


def _order_u32(b: jax.Array) -> jax.Array:
    """Map f32 bit patterns to unsigned-order-preserving u32."""
    neg = (b & jnp.uint32(0x80000000)) != 0
    return jnp.where(neg, ~b, b | jnp.uint32(0x80000000))


def f64_order_bits(f: jax.Array) -> jax.Array:
    """uint64 word whose unsigned order equals the f64 value order (NaNs
    excluded — the sort-class array handles them)."""
    if _native_bitcast64():
        bits = jax.lax.bitcast_convert_type(f, jnp.uint64)
        neg = (bits & SIGN64) != 0
        return jnp.where(neg, ~bits, bits | SIGN64)
    hb, lb = _f64_pair_words(f)
    return ((_order_u32(hb).astype(jnp.uint64) << 32)
            | _order_u32(lb).astype(jnp.uint64))


def order_word(col: DeviceColumn) -> jax.Array:
    """uint64 word whose unsigned order == value order (nulls/NaN ignored
    here; the class array handles them)."""
    v = col.values
    dt = v.dtype
    if dt == jnp.bool_:
        return v.astype(jnp.uint64)
    if jnp.issubdtype(dt, jnp.unsignedinteger):
        return v.astype(jnp.uint64)
    if jnp.issubdtype(dt, jnp.integer):
        # two's-complement reinterpret (astype wraps mod 2^64: bit-identical
        # to a bitcast, which the x64 rewriter can't lower)
        return v.astype(jnp.int64).astype(jnp.uint64) ^ SIGN64
    if jnp.issubdtype(dt, jnp.floating):
        return f64_order_bits(v.astype(jnp.float64))
    raise TypeError(f"no order word for dtype {dt}")


def equality_word(col: DeviceColumn) -> jax.Array:
    """uint64 word with value equality == word equality (bit-level, like the
    reference's memcmp-able row encoding)."""
    v = col.values
    dt = v.dtype
    if dt == jnp.bool_:
        return v.astype(jnp.uint64)
    if jnp.issubdtype(dt, jnp.unsignedinteger):
        return v.astype(jnp.uint64)
    if jnp.issubdtype(dt, jnp.integer):
        return v.astype(jnp.int64).astype(jnp.uint64)
    if jnp.issubdtype(dt, jnp.floating):
        return f64_bits(v.astype(jnp.float64))
    raise TypeError(f"no equality word for dtype {dt}")


def sort_class(col: DeviceColumn, row_mask: jax.Array, ascending: bool,
               null_placement: str) -> jax.Array:
    """uint8 class: orders value/NaN/null per Arrow semantics; padding rows
    always last (class 3)."""
    cap = col.capacity
    is_null = (~col.validity if col.validity is not None
               else jnp.zeros(cap, jnp.bool_))
    is_nan = (jnp.isnan(col.values)
              if jnp.issubdtype(col.values.dtype, jnp.floating)
              else jnp.zeros(cap, jnp.bool_))
    # NaNs partition next to nulls regardless of direction (reference
    # vector_sort.cc:527-583: NaN is placement, not comparison)
    if null_placement == "at_end":   # values, nan, null
        cls_val, cls_nan, cls_null = 0, 1, 2
    else:                            # null, nan, values
        cls_val, cls_nan, cls_null = 2, 1, 0
    cls = jnp.full(cap, cls_val, jnp.uint8)
    cls = jnp.where(is_nan, jnp.uint8(cls_nan), cls)
    cls = jnp.where(is_null, jnp.uint8(cls_null), cls)
    cls = jnp.where(row_mask, cls, jnp.uint8(3))
    return cls


def sort_key_arrays(cols: Sequence[DeviceColumn],
                    orders: Sequence[str],
                    null_placement: str,
                    row_mask: jax.Array) -> List[jax.Array]:
    """Flattened [class0, word0, class1, word1, ...] for lax.sort."""
    keys = []
    for col, order in zip(cols, orders):
        asc = order == "ascending"
        cls = sort_class(col, row_mask, asc, null_placement)
        word = order_word(col)
        if not asc:
            word = ~word
        keys.append(cls)
        keys.append(word)
    return keys


def stable_sort_indices(keys: List[jax.Array], capacity: int) -> jax.Array:
    """Multi-key stable sort; returns the permutation (int64)."""
    iota = jnp.arange(capacity, dtype=jnp.int64)
    out = jax.lax.sort(tuple(keys) + (iota,), dimension=0,
                       is_stable=True, num_keys=len(keys))
    return out[-1]


def group_key_arrays(cols: Sequence[DeviceColumn],
                     row_mask: jax.Array) -> List[jax.Array]:
    """Equality keys for grouping: ONE packed class word + one bits word
    per column. Nulls form their own group (reference Grouper
    semantics); NaN bit patterns group bitwise like the reference's
    memcmp rows.

    The per-column null classes pack into a single uint64 bitmask
    operand (bit i = column i is null; dead/padding rows = all-ones —
    distinct from every live pattern for < 64 keys). Grouping only
    needs EQUALITY runs, so any total order over the packed word is
    fine, and the packing halves the lax.sort operand count: a 3-key
    group sort drops from 7 operands to 4, below the >6-operand shape
    that wedges the tunneled remote compiler (docs/TUNNEL.md)."""
    cap = cols[0].capacity if cols else row_mask.shape[0]
    if len(cols) > 63:
        # bitmask would overflow: one class word per 63-column block
        parts: List[jax.Array] = []
        for start in range(0, len(cols), 63):
            parts.extend(group_key_arrays(cols[start:start + 63],
                                          row_mask))
        return parts
    cls_bits = jnp.zeros(cap, jnp.uint64)
    keys: List[jax.Array] = []
    for i, col in enumerate(cols):
        is_null = (~col.validity if col.validity is not None
                   else jnp.zeros(cap, jnp.bool_))
        cls_bits = cls_bits | (is_null.astype(jnp.uint64)
                               << jnp.uint64(i))
        word = jnp.where(is_null, jnp.uint64(0), equality_word(col))
        keys.append(word)
    cls_bits = jnp.where(row_mask, cls_bits,
                         jnp.uint64(0xFFFFFFFFFFFFFFFF))
    return [cls_bits] + keys


GROUP_KEY_DEAD = 0xFFFFFFFFFFFFFFFF  # packed-class word of padding rows
