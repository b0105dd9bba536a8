"""Selection kernels: filter, take, drop_null.

Reference analogues: compute/kernels/vector_selection.cc (filter/take via
bit-block counters). TPU redesign (SURVEY §7 hard-part 1): output sizes are
data-dependent, so results keep the input's static capacity plus a dynamic
``count``; compaction is a cumsum + scatter (one fused XLA pass), not a
byte-copy loop.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..device.column import DeviceBatch, DeviceColumn
from .elementwise import ErrGuard
from .registry import ExecContext, register


@jax.tree_util.register_pytree_node_class
class Compacted:
    """A vector-kernel result: column(s) at static capacity + live count."""

    __slots__ = ("column", "count")

    def __init__(self, column, count):
        self.column = column
        self.count = count

    def tree_flatten(self):
        return (self.column, self.count), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def selection_mask(ctx: ExecContext, mask_col: DeviceColumn,
                   null_selection: str = "drop"):
    """bool keep-mask per Arrow FilterOptions semantics: nulls in the mask
    drop (default) or emit null rows."""
    mv = mask_col.values.astype(jnp.bool_)
    if mask_col.validity is None or null_selection == "drop":
        keep = mv
        if mask_col.validity is not None:
            keep = jnp.logical_and(keep, mask_col.validity)
        emit_null = None
    else:  # emit_null: null mask slots produce null output rows
        keep = jnp.logical_or(jnp.logical_and(mv, mask_col.validity),
                              ~mask_col.validity)
        emit_null = ~mask_col.validity
    keep = jnp.logical_and(keep, ctx.row_mask())
    return keep, emit_null


def compaction_indices(keep: jax.Array):
    """Returns (positions, count): positions[i] is the output slot of row i
    (or capacity, dropped)."""
    cap = keep.shape[0]
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    count = jnp.sum(keep, dtype=jnp.int32)
    positions = jnp.where(keep, pos, cap)
    return positions, count


def compact_columns(cols: Sequence[DeviceColumn], keep: jax.Array,
                    extra_null: Optional[jax.Array] = None):
    """Move kept rows to the front across ALL columns with ONE stable sort
    carrying every buffer as a payload (TPU-linear for any dtype; element
    scatters of 64-bit values lower quadratically, see compute/move.py)."""
    from .move import compact_by_mask
    arrays = []
    spec = []
    for c in cols:
        arrays.append(c.values)
        validity = c.validity
        if extra_null is not None:
            base = validity if validity is not None \
                else jnp.ones(c.capacity, dtype=jnp.bool_)
            validity = jnp.logical_and(base, ~extra_null)
        has_v = validity is not None
        if has_v:
            arrays.append(validity)
        spec.append(has_v)
    outs, count = compact_by_mask(keep, arrays)
    out_cols = []
    i = 0
    for c, has_v in zip(cols, spec):
        vals = outs[i]
        i += 1
        validity = None
        if has_v:
            validity = outs[i]
            i += 1
        out_cols.append(DeviceColumn(vals, validity, c.type, c.dictionary))
    return out_cols, count


def compact_column(col: DeviceColumn, positions: jax.Array,
                   extra_null: Optional[jax.Array] = None) -> DeviceColumn:
    """Single-column compaction via int32 positions scatter — ONLY safe for
    <=32-bit payloads on TPU; prefer compact_columns."""
    cap = col.capacity
    out_vals = jnp.zeros_like(col.values).at[positions].set(
        col.values, mode="drop")
    validity = col.validity
    if extra_null is not None:
        base = validity if validity is not None \
            else jnp.ones(cap, dtype=jnp.bool_)
        validity = jnp.logical_and(base, ~extra_null)
    if validity is not None:
        out_valid = jnp.zeros(cap, dtype=jnp.bool_).at[positions].set(
            validity, mode="drop")
    else:
        out_valid = None
    return DeviceColumn(out_vals, out_valid, col.type, col.dictionary)


@register("filter", "vector")
def _filter(ctx, values: DeviceColumn, mask: DeviceColumn,
            null_selection_behavior: str = "drop"):
    keep, emit_null = selection_mask(ctx, mask, null_selection_behavior)
    (out,), count = compact_columns([values], keep, emit_null)
    return Compacted(out, count)


@register("drop_null", "vector")
def _drop_null(ctx, values: DeviceColumn):
    keep = values.valid_mask(ctx.row_mask())
    (out,), count = compact_columns([values], keep)
    return Compacted(out, count)


@register("take", "vector", ctx_arg=1)
def _take(ctx, values: DeviceColumn, indices: DeviceColumn,
          n_values=None, boundscheck: bool = True):
    from .move import gather_rows
    idx = indices.values.astype(jnp.int64)
    live = indices.valid_mask(ctx.row_mask())
    n_valid_rows = ctx.row_count  # of the indices column
    limit = values.capacity if n_values is None else n_values
    in_range = jnp.logical_and(idx >= 0, idx < limit)
    safe_idx = jnp.where(jnp.logical_and(live, in_range), idx, 0)
    # route through the linear movement layer (plain 1-D element gathers
    # lower quadratically on TPU — compute/move.py header)
    if values.validity is not None:
        out_vals, v_validity = gather_rows(
            [values.values, values.validity], safe_idx)
    else:
        (out_vals,), v_validity = gather_rows([values.values],
                                              safe_idx), None
    validity = None
    if indices.validity is not None or v_validity is not None:
        validity = jnp.ones(indices.capacity, dtype=jnp.bool_)
        if indices.validity is not None:
            validity = jnp.logical_and(validity, indices.validity)
        if v_validity is not None:
            validity = jnp.logical_and(validity, v_validity)
    out = DeviceColumn(out_vals, validity, values.type, values.dictionary)
    if boundscheck:
        bad = jnp.logical_and(live, ~in_range)
        return ErrGuard(Compacted(out, n_valid_rows), jnp.any(bad),
                        "take: index out of bounds")
    return Compacted(out, n_valid_rows)


@register("array_filter", "vector")
def _array_filter(ctx, values, mask, null_selection_behavior: str = "drop"):
    return _filter(ctx, values, mask, null_selection_behavior)


@register("array_take", "vector", ctx_arg=1)
def _array_take(ctx, values, indices, n_values=None,
                boundscheck: bool = True):
    return _take(ctx, values, indices, n_values, boundscheck)


@register("inverse_permutation", "vector")
def _inverse_permutation(ctx, indices: DeviceColumn, max_index=None):
    """reference: compute/kernels/vector_swizzle.cc"""
    cap = indices.capacity
    idx = indices.values.astype(jnp.int64)
    live = indices.valid_mask(ctx.row_mask())
    safe = jnp.where(live, idx, cap)
    pos = jnp.arange(cap, dtype=indices.values.dtype)
    out = jnp.zeros(cap, indices.values.dtype).at[safe].set(pos, mode="drop")
    hit = jnp.zeros(cap, jnp.bool_).at[safe].set(True, mode="drop")
    return Compacted(DeviceColumn(out, hit, indices.type), ctx.row_count)


@register("scatter", "vector")
def _scatter(ctx, values: DeviceColumn, indices: DeviceColumn,
             max_index=None):
    cap = values.capacity
    idx = indices.values.astype(jnp.int64)
    live = indices.valid_mask(ctx.row_mask())
    safe = jnp.where(live, idx, cap)
    out = jnp.zeros_like(values.values).at[safe].set(values.values,
                                                     mode="drop")
    hit = jnp.zeros(cap, jnp.bool_).at[safe].set(
        values.valid_mask(None), mode="drop")
    return Compacted(DeviceColumn(out, hit, values.type, values.dictionary),
                     ctx.row_count)


# --- batch-level helpers used by the plan executor -------------------------

def filter_batch(batch: DeviceBatch, mask_col: DeviceColumn,
                 null_selection: str = "drop") -> DeviceBatch:
    ctx = ExecContext(batch.capacity, batch.row_count)
    keep, emit_null = selection_mask(ctx, mask_col, null_selection)
    cols, count = compact_columns(batch.columns, keep, emit_null)
    return DeviceBatch(batch.schema, cols, count)


def gather_columns(cols: Sequence[DeviceColumn],
                   idx: jax.Array) -> list:
    """Gather rows of several columns by index through ONE shared
    sort-based gather (move.gather_rows): every values/validity buffer
    rides the same key sort, keeping the whole move linear on TPU."""
    from .move import gather_rows
    arrays, spec = [], []
    for c in cols:
        arrays.append(c.values)
        has_v = c.validity is not None
        if has_v:
            arrays.append(c.validity)
        spec.append(has_v)
    outs = gather_rows(arrays, idx)
    res, i = [], 0
    for c, has_v in zip(cols, spec):
        vals = outs[i]
        i += 1
        validity = None
        if has_v:
            validity = outs[i]
            i += 1
        res.append(DeviceColumn(vals, validity, c.type, c.dictionary))
    return res


def take_batch(batch: DeviceBatch, indices: jax.Array,
               count) -> DeviceBatch:
    """Gather whole batch rows by plain index array (no null indices)."""
    cols = gather_columns(batch.columns, indices)
    return DeviceBatch(batch.schema, cols, count)
