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
        return jax.lax.bitcast_convert_type(
            v.astype(jnp.int64), jnp.uint64) ^ SIGN64
    if jnp.issubdtype(dt, jnp.floating):
        f = v.astype(jnp.float64)
        bits = jax.lax.bitcast_convert_type(f, jnp.uint64)
        neg = (bits & SIGN64) != 0
        return jnp.where(neg, ~bits, bits | SIGN64)
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
        return jax.lax.bitcast_convert_type(v.astype(jnp.int64), jnp.uint64)
    if jnp.issubdtype(dt, jnp.floating):
        return jax.lax.bitcast_convert_type(v.astype(jnp.float64),
                                            jnp.uint64)
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
    """Equality keys for grouping: per column [null_class, bits]. Nulls form
    their own group (reference Grouper semantics); NaN bit patterns group
    bitwise like the reference's memcmp rows."""
    keys = []
    for col in cols:
        cap = col.capacity
        is_null = (~col.validity if col.validity is not None
                   else jnp.zeros(cap, jnp.bool_))
        cls = jnp.where(row_mask, is_null.astype(jnp.uint8), jnp.uint8(2))
        word = jnp.where(is_null, jnp.uint64(0), equality_word(col))
        keys.append(cls)
        keys.append(word)
    return keys
