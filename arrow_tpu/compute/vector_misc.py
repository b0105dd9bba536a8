"""Set lookup, null-filling scans, masked replace, run-end encoding.

Reference analogues: kernels/scalar_set_lookup.cc (is_in/index_in),
vector_replace.cc (replace_with_mask, fill_null_forward/backward),
vector_run_end_encode.cc.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from .. import types as T
from ..device.column import DeviceColumn
from .registry import ArrowInvalid, register
from .selection import Compacted


def _value_set_lookup(ctx, col: DeviceColumn, value_set,
                      skip_nulls: bool = False):
    """Returns (found bool[cap], index i32[cap]) of each row in value_set
    (first-occurrence index, reference semantics)."""
    if col.dictionary is not None:
        dvals = col.dictionary.to_pylist()
        # Derived dictionaries (e.g. a slice of a phone column) may hold
        # duplicate values: every slot whose value is in the set must
        # match, not just the first (set-index = first occurrence in
        # value_set, reference semantics).
        first_idx = {}
        for i, v in enumerate(value_set):
            if v is not None and v not in first_idx:
                first_idx[v] = i
        code_index = np.asarray(
            [first_idx.get(v, -1) for v in dvals], dtype=np.int64)
        table = jnp.asarray(code_index)
        idx = table[col.values.astype(jnp.int64)]
        return idx >= 0, idx

    found = jnp.zeros(col.capacity, jnp.bool_)
    idx = jnp.full(col.capacity, -1, jnp.int64)
    for i, v in enumerate(value_set):
        if v is None:
            continue
        hit = col.values == jnp.asarray(v, col.values.dtype)
        newly = jnp.logical_and(hit, ~found)
        idx = jnp.where(newly, i, idx)
        found = jnp.logical_or(found, hit)
    return found, idx


@register("is_in", "elementwise")
def _is_in(ctx, col, value_set=(), skip_nulls: bool = False):
    found, _ = _value_set_lookup(ctx, col, list(value_set))
    null_in_set = any(v is None for v in value_set)
    from .elementwise import _col
    if col.validity is not None and null_in_set and not skip_nulls:
        out = jnp.where(col.validity, found, True)
        return _col(out, None, T.bool_())
    out = found
    if col.validity is not None:
        out = jnp.logical_and(out, col.validity)
    return _col(out, None, T.bool_())


@register("index_in", "elementwise")
def _index_in(ctx, col, value_set=(), skip_nulls: bool = False):
    found, idx = _value_set_lookup(ctx, col, list(value_set))
    null_idx = next((i for i, v in enumerate(value_set) if v is None), -1)
    validity = found
    if col.validity is not None:
        if null_idx >= 0 and not skip_nulls:
            idx = jnp.where(col.validity, idx, null_idx)
            validity = jnp.where(col.validity, found, True)
        else:
            validity = jnp.logical_and(found, col.validity)
    out = jnp.where(validity, idx, 0).astype(jnp.int32)
    return DeviceColumn(out, validity, T.int32())


@register("fill_null_forward", "elementwise")
def _fill_null_forward(ctx, col):
    cap = ctx.capacity
    live = col.valid_mask(ctx.row_mask())
    idx = jnp.arange(cap, dtype=jnp.int64)
    last_valid = jnp.maximum.accumulate(jnp.where(live, idx, -1))
    has = last_valid >= 0
    src = jnp.where(has, last_valid, 0)
    out = col.values[src]
    validity = has
    if col.validity is None and ctx.row_count is None:
        validity = None
    return DeviceColumn(out, jnp.logical_and(validity, ctx.row_mask()),
                        col.type, col.dictionary)


@register("fill_null_backward", "elementwise")
def _fill_null_backward(ctx, col):
    cap = ctx.capacity
    live = col.valid_mask(ctx.row_mask())
    idx = jnp.arange(cap, dtype=jnp.int64)
    rev_next = jnp.minimum.accumulate(
        jnp.where(live, idx, 2 * cap)[::-1])[::-1]
    has = rev_next < cap
    src = jnp.where(has, rev_next, 0)
    out = col.values[src]
    return DeviceColumn(out, jnp.logical_and(has, ctx.row_mask()),
                        col.type, col.dictionary)


@register("replace_with_mask", "vector")
def _replace_with_mask(ctx, col, mask: DeviceColumn,
                       replacements: DeviceColumn):
    """Rows where mask is true take successive values from replacements
    (reference: vector_replace.cc)."""
    mv = jnp.logical_and(mask.values.astype(jnp.bool_), ctx.row_mask())
    if mask.validity is not None:
        mv = jnp.logical_and(mv, mask.validity)
    # k-th true mask row <- replacements[k]
    k = jnp.cumsum(mv.astype(jnp.int64)) - 1
    safe_k = jnp.clip(k, 0, replacements.capacity - 1)
    rep_vals = replacements.values[safe_k].astype(col.values.dtype)
    out = jnp.where(mv, rep_vals, col.values)
    base_valid = (col.validity if col.validity is not None
                  else jnp.ones(ctx.capacity, jnp.bool_))
    rep_valid = (replacements.validity[safe_k]
                 if replacements.validity is not None
                 else jnp.ones(ctx.capacity, jnp.bool_))
    validity = jnp.where(mv, rep_valid, base_valid)
    # null mask slots produce null outputs
    if mask.validity is not None:
        validity = jnp.logical_and(validity, mask.validity)
    return Compacted(DeviceColumn(out, validity, col.type, col.dictionary),
                     ctx.row_count)


@register("run_end_encode", "vector")
def _run_end_encode(ctx, col):
    """Returns dict(run_ends, values) with dynamic run count."""
    cap = ctx.capacity
    live = ctx.row_mask()
    idx = jnp.arange(cap, dtype=jnp.int64)
    valid = (col.validity if col.validity is not None
             else jnp.ones(cap, jnp.bool_))
    prev_vals = jnp.roll(col.values, 1)
    prev_valid = jnp.roll(valid, 1)
    changed = jnp.logical_or(col.values != prev_vals, valid != prev_valid)
    is_new = jnp.logical_and(jnp.logical_or(idx == 0, changed), live)
    run_id = jnp.cumsum(is_new.astype(jnp.int64)) - 1
    n_runs = jnp.sum(is_new, dtype=jnp.int64)
    run_end = jax.ops.segment_max(jnp.where(live, idx + 1, 0),
                                  jnp.where(live, run_id, cap - 1),
                                  num_segments=cap)
    run_start = jax.ops.segment_min(jnp.where(live, idx, cap),
                                    jnp.where(live, run_id, cap - 1),
                                    num_segments=cap)
    safe_start = jnp.clip(run_start, 0, cap - 1)
    out_vals = col.values[safe_start]
    out_valid = valid[safe_start]
    n = n_runs.astype(jnp.int32)
    return {
        "run_ends": Compacted(DeviceColumn(run_end.astype(jnp.int32),
                                           None, T.int32()), n),
        "values": Compacted(DeviceColumn(out_vals, out_valid, col.type,
                                         col.dictionary), n),
    }


@register("list_value_length", "elementwise")
def _list_value_length(ctx, col):
    raise ArrowInvalid(
        "list columns are host-side; use Array-level list accessors")


@register("case_when", "elementwise")
def _case_when(ctx, cond_struct, *cases):
    """cond_struct: list/tuple of bool DeviceColumns (the reference packs
    them in a struct; here the caller passes them positionally before the
    value columns: case_when([c1, c2], v1, v2[, else_value])).

    First true condition selects its value; none true -> else (or null)."""
    conds = list(cond_struct) if isinstance(cond_struct, (list, tuple)) \
        else [cond_struct]
    n_conds = len(conds)
    vals = list(cases)
    has_else = len(vals) == n_conds + 1
    cap = ctx.capacity
    from .elementwise import _as_values

    out_v, out_valid = None, None
    taken = jnp.zeros(cap, jnp.bool_)
    for c, v in zip(conds, vals):
        cv, cvd = _as_values(c)
        cv = cv.astype(jnp.bool_)
        if cvd is not None:
            cv = jnp.logical_and(cv, cvd)
        fire = jnp.logical_and(cv, ~taken)
        vv, vvd = _as_values(v)
        if out_v is None:
            out_v = jnp.where(fire, vv, jnp.zeros_like(vv))
            out_valid = jnp.logical_and(
                fire, vvd if vvd is not None else True)
        else:
            out_v = jnp.where(fire, vv, out_v)
            out_valid = jnp.where(
                fire, vvd if vvd is not None else True, out_valid)
        taken = jnp.logical_or(taken, fire)
    if has_else:
        ev, evd = _as_values(vals[-1])
        out_v = jnp.where(taken, out_v, ev)
        out_valid = jnp.where(taken, out_valid,
                              evd if evd is not None else True)
    t = next((v.type for v in vals if isinstance(v, DeviceColumn)), None)
    return DeviceColumn(out_v, out_valid,
                        t if t is not None else T.float64())


def _register_mode():
    """Most frequent value(s) as a StructArray{mode, count} of the top
    ``n`` modes, ties broken by smallest value (reference:
    kernels/aggregate_mode.cc ModeOptions semantics). Counting runs on
    device via value_counts; the tiny top-n selection is host-side."""
    from .registry import register_host

    @register_host("mode")
    def _mode(arr, n: int = 1, skip_nulls: bool = True,
              min_count: int = 0):
        from ..array.array import array as make_array
        from . import value_counts as _vc
        vc = _vc(arr)
        pairs = []
        n_valid = 0
        has_null = False
        for item in vc.to_pylist():
            v, c = item["values"], item["counts"]
            if v is None:
                has_null = True
                continue
            n_valid += c
            pairs.append((v, c))
        empty = (n_valid < max(min_count, 1) or
                 (not skip_nulls and has_null))
        if empty:
            pairs = []
        else:
            pairs.sort(key=lambda p: (-p[1], p[0]))
            pairs = pairs[:max(int(n), 0)]
        t = T.struct([("mode", arr.type), ("count", T.int64())])
        return make_array(
            [{"mode": v, "count": c} for v, c in pairs], t)


_register_mode()
