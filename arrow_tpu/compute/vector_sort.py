"""Sort family: sort_indices, array_sort_indices, select_k_unstable, rank,
partition_nth_indices, cumulative ops, pairwise_diff.

Reference analogues: compute/kernels/vector_sort.cc, vector_array_sort.cc,
vector_select_k.cc, vector_rank.cc, vector_cumulative_ops.cc.

TPU redesign: one multi-operand stable XLA sort over normalized key words
(keys.py) replaces the comparator machinery; select_k is sort + head (XLA's
sort is already O(n log n) bitonic-style on device and top-k would not beat
it at query sizes).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .. import types as T
from ..device.column import DeviceColumn
from .keys import sort_key_arrays, stable_sort_indices
from .registry import ArrowInvalid, ExecContext, register
from .selection import Compacted


def device_sort_indices(ctx: ExecContext, cols: Sequence[DeviceColumn],
                        orders: Sequence[str],
                        null_placement: str = "at_end") -> jax.Array:
    keys = sort_key_arrays(cols, orders, null_placement, ctx.row_mask())
    return stable_sort_indices(keys, ctx.capacity)


@register("sort_indices", "vector")
def _sort_indices(ctx, *cols, sort_keys=None, null_placement: str = "at_end"):
    orders = [sk[1] if isinstance(sk, (list, tuple)) else sk
              for sk in (sort_keys or ["ascending"] * len(cols))]
    perm = device_sort_indices(ctx, list(cols), orders, null_placement)
    return Compacted(DeviceColumn(perm.astype(jnp.uint64), None, T.uint64()),
                     ctx.row_count)


@register("array_sort_indices", "vector")
def _array_sort_indices(ctx, col, order: str = "ascending",
                        null_placement: str = "at_end"):
    perm = device_sort_indices(ctx, [col], [order], null_placement)
    return Compacted(DeviceColumn(perm.astype(jnp.uint64), None, T.uint64()),
                     ctx.row_count)


@register("select_k_unstable", "vector")
def _select_k(ctx, *cols, k: int = 1, sort_keys=None):
    orders = [sk[1] if isinstance(sk, (list, tuple)) else sk
              for sk in (sort_keys or ["ascending"] * len(cols))]
    perm = device_sort_indices(ctx, list(cols), orders, "at_end")
    count = jnp.minimum(ctx.row_count, jnp.asarray(k, jnp.int32))
    return Compacted(DeviceColumn(perm.astype(jnp.uint64), None, T.uint64()),
                     count)


@register("partition_nth_indices", "vector")
def _partition_nth(ctx, col, pivot: int = 0, null_placement: str = "at_end"):
    # a full sort trivially satisfies the partition contract
    perm = device_sort_indices(ctx, [col], ["ascending"], null_placement)
    return Compacted(DeviceColumn(perm.astype(jnp.uint64), None, T.uint64()),
                     ctx.row_count)


@register("rank", "vector")
def _rank(ctx, col, sort_keys="ascending", null_placement: str = "at_end",
          tiebreaker: str = "first"):
    order = sort_keys if isinstance(sort_keys, str) else \
        (sort_keys[0][1] if isinstance(sort_keys[0], (list, tuple))
         else sort_keys[0])
    cap = ctx.capacity
    perm = device_sort_indices(ctx, [col], [order], null_placement)
    # position of each row in sort order
    pos = jnp.arange(cap, dtype=jnp.int64)
    rank_of_row = jnp.zeros(cap, jnp.int64).at[perm].set(pos)

    if tiebreaker == "first":
        ranks = rank_of_row + 1
        return Compacted(DeviceColumn(ranks.astype(jnp.uint64), None,
                                      T.uint64()), ctx.row_count)

    # tie handling needs equality runs in sorted order
    from .keys import group_key_arrays
    keys = group_key_arrays([col], ctx.row_mask())
    sorted_keys = [k[perm] for k in keys]
    idx = jnp.arange(cap, dtype=jnp.int64)
    neq = jnp.zeros(cap, jnp.bool_)
    for k in sorted_keys:
        neq = jnp.logical_or(neq, k != jnp.roll(k, 1))
    is_new = jnp.logical_or(idx == 0, neq)
    if tiebreaker == "min":
        run_start = jnp.maximum.accumulate(jnp.where(is_new, idx, 0))
        rank_sorted = run_start + 1
    elif tiebreaker == "dense":
        rank_sorted = jnp.cumsum(is_new.astype(jnp.int64))
    elif tiebreaker == "max":
        run_id = jnp.cumsum(is_new.astype(jnp.int64)) - 1
        run_len = jax.ops.segment_sum(jnp.ones(cap, jnp.int64), run_id,
                                      num_segments=cap)
        run_start = jnp.maximum.accumulate(jnp.where(is_new, idx, 0))
        rank_sorted = run_start + run_len[run_id]
    else:
        raise ArrowInvalid(f"bad tiebreaker {tiebreaker!r}")
    ranks = jnp.zeros(cap, jnp.int64).at[perm].set(rank_sorted)
    return Compacted(DeviceColumn(ranks.astype(jnp.uint64), None,
                                  T.uint64()), ctx.row_count)


# --- cumulative / pairwise -------------------------------------------------

def _cumulative(ctx, col, op, identity, start=None, skip_nulls: bool = True):
    live = col.valid_mask(ctx.row_mask())
    v = jnp.where(live, col.values,
                  jnp.asarray(identity, col.values.dtype))
    out = op(v)
    if start is not None:
        out = op(jnp.stack([jnp.full_like(out, start), out]))[-1] \
            if False else out  # start folded below for sum/prod only
    if skip_nulls:
        validity = col.validity
    else:
        # null poisons the rest of the column
        seen_null = jnp.cumsum((~live).astype(jnp.int32)) > 0
        invalid = jnp.logical_and(seen_null, ctx.row_mask())
        base = col.validity if col.validity is not None \
            else jnp.ones(ctx.capacity, jnp.bool_)
        validity = jnp.logical_and(base, ~invalid)
    return DeviceColumn(out, validity, col.type)


@register("cumulative_sum", "elementwise")
def _cumulative_sum(ctx, col, start=None, skip_nulls: bool = False):
    r = _cumulative(ctx, col, jnp.cumsum, 0, None, skip_nulls)
    if start is not None:
        r = DeviceColumn(r.values + jnp.asarray(start, r.values.dtype),
                         r.validity, r.type)
    return r


@register("cumulative_prod", "elementwise")
def _cumulative_prod(ctx, col, start=None, skip_nulls: bool = False):
    r = _cumulative(ctx, col, jnp.cumprod, 1, None, skip_nulls)
    if start is not None:
        r = DeviceColumn(r.values * jnp.asarray(start, r.values.dtype),
                         r.validity, r.type)
    return r


@register("cumulative_min", "elementwise")
def _cumulative_min(ctx, col, start=None, skip_nulls: bool = False):
    from .aggregate import _minmax_identity
    ident = _minmax_identity(col.values.dtype, True)
    r = _cumulative(ctx, col, jnp.minimum.accumulate, ident, None, skip_nulls)
    if start is not None:
        r = DeviceColumn(jnp.minimum(r.values,
                                     jnp.asarray(start, r.values.dtype)),
                         r.validity, r.type)
    return r


@register("cumulative_max", "elementwise")
def _cumulative_max(ctx, col, start=None, skip_nulls: bool = False):
    from .aggregate import _minmax_identity
    ident = _minmax_identity(col.values.dtype, False)
    r = _cumulative(ctx, col, jnp.maximum.accumulate, ident, None, skip_nulls)
    if start is not None:
        r = DeviceColumn(jnp.maximum(r.values,
                                     jnp.asarray(start, r.values.dtype)),
                         r.validity, r.type)
    return r


@register("cumulative_mean", "elementwise")
def _cumulative_mean(ctx, col, skip_nulls: bool = False):
    live = col.valid_mask(ctx.row_mask())
    v = jnp.where(live, col.values.astype(jnp.float64), 0.0)
    sums = jnp.cumsum(v)
    counts = jnp.cumsum(live.astype(jnp.float64))
    out = sums / jnp.maximum(counts, 1.0)
    r = _cumulative(ctx, col, lambda x: x, 0, None, skip_nulls)
    return DeviceColumn(out, r.validity, T.float64())


@register("pairwise_diff", "elementwise")
def _pairwise_diff(ctx, col, period: int = 1):
    cap = ctx.capacity
    shifted = jnp.roll(col.values, period)
    out = col.values - shifted
    idx = jnp.arange(cap, dtype=jnp.int64)
    in_range = (idx >= period) if period >= 0 else \
        (idx < cap + period)
    base = col.validity if col.validity is not None \
        else jnp.ones(cap, jnp.bool_)
    shifted_valid = jnp.roll(base, period)
    validity = jnp.logical_and(jnp.logical_and(base, shifted_valid),
                               in_range)
    return DeviceColumn(out, validity, col.type)


from .registry import register_alias  # noqa: E402

register_alias("pairwise_diff_checked", "pairwise_diff")
