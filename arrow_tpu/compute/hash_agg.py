"""Grouped ("hash_") aggregate kernels.

Reference analogues: compute/kernels/hash_aggregate.cc,
hash_aggregate_numeric.cc — per-group state arrays with
resize/consume/merge/finalize. TPU redesign: group ids come from the sort-
based Grouper; every grouped aggregate is a single XLA segment reduction
(segment_sum/min/max) over the padded column — no mutable state, no merge
phase (SURVEY §2.9 P7 maps to pre-agg + shuffle at the distributed level).

All kernels take (values, group_ids int64[capacity] with `capacity` as the
padding sentinel) and return per-group arrays at static capacity plus the
dynamic group count.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from .. import types as T
from ..device.column import DeviceColumn
from .aggregate import _minmax_identity, _sum_dtype, _sum_type
from .registry import register
from .selection import Compacted


def _prep(ctx, values: DeviceColumn, gids: jax.Array,
          num_segments=None):
    """live mask + in-range segment ids. With `num_segments` (a static
    bound from the planner) reductions run at the bound, not the row
    capacity — and through the TPU-safe paths in compute/move.py."""
    cap = ctx.capacity
    nseg = num_segments if num_segments is not None else cap
    live = values.valid_mask(ctx.row_mask())
    live = jnp.logical_and(live, gids < cap)
    seg = jnp.where(live, gids, 0).astype(jnp.int32)
    return nseg, live, seg


def _segment_reduce(v, live, seg, nseg, op, identity):
    from .move import segment_reduce
    v = jnp.where(live, v, jnp.asarray(identity, v.dtype))
    return segment_reduce(v, seg, nseg, op, identity)


def _group_valid_counts(nseg, live, seg):
    from .move import segment_count
    return segment_count(live, seg, nseg)


def _grp_validity(counts, num_groups, min_count, cap):
    # ScalarAggregateOptions semantics (api_aggregate.h:48-58): result is
    # null when non-null count < min_count; min_count=0 keeps even an
    # all-null group's identity result (e.g. sum -> 0)
    ok = counts >= jnp.asarray(min_count, jnp.int64)
    return ok


@register("hash_sum", "hash_aggregate")
def grouped_sum(ctx, values: DeviceColumn, gids, num_groups,
                skip_nulls: bool = True, min_count: int = 1,
                num_segments=None):
    from .aggregate import decode_numeric_dict
    values = decode_numeric_dict(values)
    nseg, live, seg = _prep(ctx, values, gids, num_segments)
    acc = _sum_dtype(values.values.dtype)
    sums = _segment_reduce(values.values.astype(acc), live, seg, nseg,
                           "sum", 0)
    counts = _group_valid_counts(nseg, live, seg)
    validity = _grp_validity(counts, num_groups, min_count, nseg)
    if not skip_nulls:
        validity = jnp.logical_and(validity, ~_group_has_null(
            ctx, values, gids, nseg))
    return Compacted(DeviceColumn(sums, validity, _sum_type(values.type)),
                     num_groups.astype(jnp.int32))


def _group_has_null(ctx, values, gids, nseg):
    from .move import segment_count
    if values.validity is None:
        return jnp.zeros(nseg, jnp.bool_)
    cap = ctx.capacity
    isnull = jnp.logical_and(~values.validity, ctx.row_mask())
    isnull = jnp.logical_and(isnull, gids < cap)
    seg = jnp.where(isnull, gids, 0).astype(jnp.int32)
    return segment_count(isnull, seg, nseg) > 0


@register("hash_product", "hash_aggregate")
def grouped_product(ctx, values, gids, num_groups, skip_nulls: bool = True,
                    min_count: int = 1, num_segments=None):
    from .aggregate import decode_numeric_dict
    values = decode_numeric_dict(values)
    nseg, live, seg = _prep(ctx, values, gids, num_segments)
    acc = _sum_dtype(values.values.dtype)
    v = jnp.where(live, values.values.astype(acc), jnp.asarray(1, acc))
    prods = jax.ops.segment_prod(v, seg, num_segments=nseg)
    counts = _group_valid_counts(nseg, live, seg)
    validity = _grp_validity(counts, num_groups, min_count, nseg)
    if not skip_nulls:
        validity = jnp.logical_and(validity, ~_group_has_null(
            ctx, values, gids, nseg))
    return Compacted(DeviceColumn(prods, validity, _sum_type(values.type)),
                     num_groups.astype(jnp.int32))


@register("hash_mean", "hash_aggregate")
def grouped_mean(ctx, values, gids, num_groups, skip_nulls: bool = True,
                 min_count: int = 1, num_segments=None):
    from .aggregate import decode_numeric_dict
    values = decode_numeric_dict(values)
    nseg, live, seg = _prep(ctx, values, gids, num_segments)
    counts = _group_valid_counts(nseg, live, seg)
    validity = _grp_validity(counts, num_groups, min_count, nseg)
    if not skip_nulls:
        validity = jnp.logical_and(validity, ~_group_has_null(
            ctx, values, gids, nseg))
    from .aggregate import _dec_factor
    if _dec_factor(values.type) is not None:
        # decimal mean stays decimal at the INPUT type, rounded half away
        # from zero (aggregate_basic.cc decimal MeanImpl); exact in int64
        isums = _segment_reduce(values.values.astype(jnp.int64), live, seg,
                                nseg, "sum", 0)
        c = jnp.maximum(counts, 1)
        mag = (2 * jnp.abs(isums) + c) // (2 * c)
        means_i = jnp.where(isums < 0, -mag, mag)
        return Compacted(DeviceColumn(means_i, validity, values.type),
                         num_groups.astype(jnp.int32))
    fvals = values.values.astype(jnp.float64)
    sums = _segment_reduce(fvals, live, seg,
                           nseg, "sum", 0.0)
    means = sums / jnp.maximum(counts, 1).astype(jnp.float64)
    return Compacted(DeviceColumn(means, validity, T.float64()),
                     num_groups.astype(jnp.int32))


def _grouped_minmax(ctx, values, gids, num_groups, is_min, skip_nulls,
                    min_count, num_segments=None):
    from .aggregate import rank_recode
    values = rank_recode(values)  # dict codes -> value-ordered ranks
    nseg, live, seg = _prep(ctx, values, gids, num_segments)
    ident = _minmax_identity(values.values.dtype, is_min)
    out = _segment_reduce(values.values, live, seg, nseg,
                          "min" if is_min else "max", ident)
    counts = _group_valid_counts(nseg, live, seg)
    # reference (hash_aggregate.cc GroupedMinMaxImpl::Finalize): valid iff
    # the group saw at least one value; min_count does NOT apply
    validity = counts > 0
    if not skip_nulls:
        validity = jnp.logical_and(validity, ~_group_has_null(
            ctx, values, gids, nseg))
    return Compacted(DeviceColumn(out, validity, values.type,
                                  values.dictionary),
                     num_groups.astype(jnp.int32))


@register("hash_min", "hash_aggregate")
def grouped_min(ctx, values, gids, num_groups, skip_nulls: bool = True,
                min_count: int = 1, num_segments=None):
    return _grouped_minmax(ctx, values, gids, num_groups, True, skip_nulls,
                           min_count, num_segments)


@register("hash_max", "hash_aggregate")
def grouped_max(ctx, values, gids, num_groups, skip_nulls: bool = True,
                min_count: int = 1, num_segments=None):
    return _grouped_minmax(ctx, values, gids, num_groups, False, skip_nulls,
                           min_count, num_segments)


@register("hash_min_max", "hash_aggregate")
def grouped_min_max(ctx, values, gids, num_groups, skip_nulls: bool = True,
                    min_count: int = 1, num_segments=None):
    lo = _grouped_minmax(ctx, values, gids, num_groups, True, skip_nulls,
                         min_count, num_segments)
    hi = _grouped_minmax(ctx, values, gids, num_groups, False, skip_nulls,
                         min_count, num_segments)
    return {"min": lo, "max": hi}


@register("hash_count", "hash_aggregate")
def grouped_count(ctx, values, gids, num_groups, mode: str = "only_valid",
                  num_segments=None):
    from .move import segment_count
    cap = ctx.capacity
    nseg = num_segments if num_segments is not None else cap
    if mode == "only_valid":
        live = values.valid_mask(ctx.row_mask())
    elif mode == "only_null":
        base = (~values.validity if values.validity is not None
                else jnp.zeros(cap, jnp.bool_))
        live = jnp.logical_and(base, ctx.row_mask())
    else:
        live = ctx.row_mask()
    live = jnp.logical_and(live, gids < cap)
    seg = jnp.where(live, gids, 0).astype(jnp.int32)
    counts = segment_count(live, seg, nseg)
    return Compacted(DeviceColumn(counts, None, T.int64()),
                     num_groups.astype(jnp.int32))


@register("hash_count_all", "hash_aggregate")
def grouped_count_all(ctx, gids, num_groups, num_segments=None):
    from .move import segment_count
    cap = ctx.capacity
    nseg = num_segments if num_segments is not None else cap
    live = jnp.logical_and(ctx.row_mask(), gids < cap)
    seg = jnp.where(live, gids, 0).astype(jnp.int32)
    counts = segment_count(live, seg, nseg)
    return Compacted(DeviceColumn(counts, None, T.int64()),
                     num_groups.astype(jnp.int32))


@register("hash_any", "hash_aggregate")
def grouped_any(ctx, values, gids, num_groups, skip_nulls: bool = True,
                min_count: int = 0):
    cap, live, seg = _prep(ctx, values, gids)
    trues = jnp.logical_and(values.values.astype(jnp.bool_), live)
    out = jax.ops.segment_max(trues.astype(jnp.int32), seg,
                              num_segments=cap) > 0
    counts = _group_valid_counts(cap, live, seg)
    validity = counts >= jnp.asarray(max(min_count, 0), jnp.int64) \
        if min_count > 0 else None
    return Compacted(DeviceColumn(out, validity, T.bool_()),
                     num_groups.astype(jnp.int32))


@register("hash_all", "hash_aggregate")
def grouped_all(ctx, values, gids, num_groups, skip_nulls: bool = True,
                min_count: int = 0):
    cap, live, seg = _prep(ctx, values, gids)
    falses = jnp.logical_and(~values.values.astype(jnp.bool_), live)
    any_false = jax.ops.segment_max(falses.astype(jnp.int32), seg,
                                    num_segments=cap) > 0
    validity = None
    if min_count > 0:
        counts = _group_valid_counts(cap, live, seg)
        validity = counts >= jnp.asarray(min_count, jnp.int64)
    return Compacted(DeviceColumn(~any_false, validity, T.bool_()),
                     num_groups.astype(jnp.int32))


def _grouped_var_m2(ctx, values, gids, num_groups):
    from .aggregate import decode_numeric_dict
    values = decode_numeric_dict(values)
    cap, live, seg = _prep(ctx, values, gids)
    from .aggregate import _dec_factor
    _f = _dec_factor(values.type)
    _fv = values.values.astype(jnp.float64)
    if _f is not None:
        _fv = _fv * _f
    v = jnp.where(live, _fv, 0.0)
    counts = _group_valid_counts(cap, live, seg)
    sums = jax.ops.segment_sum(v, seg, num_segments=cap)
    means = sums / jnp.maximum(counts, 1).astype(jnp.float64)
    centered = jnp.where(live, v - means[seg], 0.0)
    m2 = jax.ops.segment_sum(centered * centered, seg, num_segments=cap)
    return counts, m2


@register("hash_variance", "hash_aggregate")
def grouped_variance(ctx, values, gids, num_groups, ddof: int = 0,
                     skip_nulls: bool = True, min_count: int = 0):
    counts, m2 = _grouped_var_m2(ctx, values, gids, num_groups)
    denom = counts.astype(jnp.float64) - ddof
    var = m2 / jnp.maximum(denom, 1.0)
    validity = counts > jnp.asarray(ddof, jnp.int64)
    validity = jnp.logical_and(
        validity, counts >= jnp.asarray(min_count, jnp.int64))
    if not skip_nulls:
        nseg = int(counts.shape[0])
        validity = jnp.logical_and(validity, ~_group_has_null(
            ctx, values, gids, nseg))
    return Compacted(DeviceColumn(var, validity, T.float64()),
                     num_groups.astype(jnp.int32))


@register("hash_stddev", "hash_aggregate")
def grouped_stddev(ctx, values, gids, num_groups, ddof: int = 0,
                   skip_nulls: bool = True, min_count: int = 0):
    r = grouped_variance(ctx, values, gids, num_groups, ddof, skip_nulls,
                         min_count)
    return Compacted(DeviceColumn(jnp.sqrt(r.column.values),
                                  r.column.validity, T.float64()), r.count)


def _grouped_first_last(ctx, values, gids, num_groups, is_first, skip_nulls):
    # int32 position segment-reduce + sort-based row gather: both stay
    # LINEAR on TPU (1-D element gathers and 64-bit segment ops lower
    # quadratically in this XLA build — see compute/move.py header).
    from .move import gather_rows, segment_reduce
    cap = ctx.capacity
    live = values.valid_mask(ctx.row_mask()) if skip_nulls else \
        ctx.row_mask()
    live = jnp.logical_and(live, gids < cap)
    seg = jnp.where(live, gids, cap - 1).astype(jnp.int32)
    idx = jnp.arange(cap, dtype=jnp.int32)
    if is_first:
        pos = segment_reduce(jnp.where(live, idx, cap).astype(jnp.int32),
                             seg, cap, "min", cap)
    else:
        pos = segment_reduce(jnp.where(live, idx, -1).astype(jnp.int32),
                             seg, cap, "max", -1)
    has = (pos >= 0) & (pos < cap)
    safe = jnp.where(has, pos, 0).astype(jnp.int32)
    if values.validity is not None and not skip_nulls:
        out, val = gather_rows([values.values, values.validity], safe)
        validity = jnp.logical_and(has, val)
    else:
        (out,) = gather_rows([values.values], safe)
        validity = has
    return Compacted(DeviceColumn(out, validity, values.type,
                                  values.dictionary),
                     num_groups.astype(jnp.int32))


@register("hash_first", "hash_aggregate")
def grouped_first(ctx, values, gids, num_groups, skip_nulls: bool = True,
                  min_count: int = 0, num_segments=None):
    return _grouped_first_last(ctx, values, gids, num_groups, True,
                               skip_nulls)


@register("hash_last", "hash_aggregate")
def grouped_last(ctx, values, gids, num_groups, skip_nulls: bool = True,
                 min_count: int = 0, num_segments=None):
    return _grouped_first_last(ctx, values, gids, num_groups, False,
                               skip_nulls)


@register("hash_one", "hash_aggregate")
def grouped_one(ctx, values, gids, num_groups, num_segments=None):
    return _grouped_first_last(ctx, values, gids, num_groups, True, True)


@register("hash_count_distinct", "hash_aggregate")
def grouped_count_distinct(ctx, values, gids, num_groups,
                           mode: str = "only_valid"):
    """Distinct values per group: stable-sort (gid, value-bits) pairs, count
    pair boundaries per gid."""
    from .keys import equality_word, stable_sort_indices
    cap = ctx.capacity
    live = values.valid_mask(ctx.row_mask())
    live = jnp.logical_and(live, gids < cap)
    gkey = jnp.where(live, gids, cap).astype(jnp.uint64)
    vkey = jnp.where(live, equality_word(values), jnp.uint64(0))
    perm = stable_sort_indices([gkey, vkey], cap)
    sg, sv = gkey[perm], vkey[perm]
    idx = jnp.arange(cap, dtype=jnp.int64)
    new_pair = (idx == 0) | (sg != jnp.roll(sg, 1)) | (sv != jnp.roll(sv, 1))
    slive = live[perm]
    new_pair = jnp.logical_and(new_pair, slive)
    seg = jnp.where(slive, sg.astype(jnp.int64), cap - 1)
    counts = jax.ops.segment_sum(new_pair.astype(jnp.int64), seg,
                                 num_segments=cap)
    if mode in ("only_null", "all"):
        has_null = _group_has_null(ctx, values, gids, cap)
        if mode == "only_null":
            counts = has_null.astype(jnp.int64)
        else:
            counts = counts + has_null.astype(jnp.int64)
    return Compacted(DeviceColumn(counts, None, T.int64()),
                     num_groups.astype(jnp.int32))
