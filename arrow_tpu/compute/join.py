"""Equi-join kernels.

Reference analogue: acero/swiss_join.cc (SwissTableForJoin build +
JoinProbeProcessor). TPU redesign: instead of a mutable swiss table, both
sides' keys are mapped to dense ids by ONE shared grouper over the
concatenated key columns (equality by construction), the build side is
sorted by id, and probes find match ranges with two binary searches
(searchsorted). Match expansion — the JoinMatchIterator analogue
(swiss_join_internal.h:834) — is a prefix-sum + searchsorted inversion, all
static-shape XLA.

Two-phase execution (SURVEY §7 hard-part 1): ``join_plan`` (one jit) returns
everything shape-independent incl. the total match count; the host picks a
bucketed output capacity; ``join_gather`` (jit per capacity bucket)
materializes row indices.

Join types: inner, left/right/full outer, left/right semi/anti. Null keys
never match (class sentinel per side) but still surface in outer results.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from ..device.column import DeviceBatch, DeviceColumn
from .keys import equality_word


class JoinPlan(NamedTuple):
    """Shape-independent probe state (everything sized by input caps)."""
    order_b: jax.Array        # build rows sorted by gid
    sorted_gb: jax.Array      # build gids in sorted order (uint64)
    left: jax.Array           # per probe row: start in sorted build
    counts: jax.Array         # per probe row: number of matches
    offsets: jax.Array        # exclusive prefix sum of output counts
    total: jax.Array          # total output rows (int64)
    probe_live: jax.Array     # probe row produces output group
    build_matched: jax.Array  # per build row: participated in a match


def _searchsorted_method() -> str:
    """Join searchsorted lowering: 'sort' (concat + ONE sort — the
    TPU-linear default) or 'scan' (binary search — log n gather steps;
    slower at runtime but a much smaller program for remote compilers
    that wedge on the concat-sort form at large shapes; round-4
    diagnosis, docs/TUNNEL.md). ARROW_TPU_SEARCHSORTED overrides."""
    import os
    v = os.environ.get("ARROW_TPU_SEARCHSORTED", "sort")
    return v if v in ("sort", "scan", "compare_all") else "sort"


def _side_gids(build_cols: Sequence[DeviceColumn],
               probe_cols: Sequence[DeviceColumn],
               build_mask: jax.Array, probe_mask: jax.Array):
    """Map both sides' keys to shared dense ids via one sorted grouping over
    the concatenation. Null keys get per-side non-matching sentinels."""
    b_cap = build_cols[0].capacity
    p_cap = probe_cols[0].capacity
    n = b_cap + p_cap

    keys = []
    null_b = jnp.zeros(b_cap, jnp.bool_)
    null_p = jnp.zeros(p_cap, jnp.bool_)
    for bc, pc_ in zip(build_cols, probe_cols):
        if bc.validity is not None:
            null_b = jnp.logical_or(null_b, ~bc.validity)
        if pc_.validity is not None:
            null_p = jnp.logical_or(null_p, ~pc_.validity)
        wb = equality_word(bc)
        wp = equality_word(pc_)
        keys.append(jnp.concatenate([wb, wp]))
    live = jnp.concatenate([jnp.logical_and(build_mask, ~null_b),
                            jnp.logical_and(probe_mask, ~null_p)])
    # class: 0 = live key, 1 = dead (null key or padding)
    cls = jnp.where(live, jnp.uint64(0), jnp.uint64(1))
    all_keys = [cls] + [jnp.where(live, k, jnp.uint64(0)) for k in keys]

    from .move import sort_with_payload
    iota = jnp.arange(n, dtype=jnp.int32)
    outs = sort_with_payload(all_keys, list(all_keys) + [iota])
    sorted_keys, perm32 = outs[:-1], outs[-1]
    idx = jnp.arange(n, dtype=jnp.int64)
    neq = jnp.zeros(n, jnp.bool_)
    for k in sorted_keys:
        neq = jnp.logical_or(neq, k != jnp.roll(k, 1))
    is_new = jnp.logical_or(idx == 0, neq)
    gid_sorted32 = (jnp.cumsum(is_new.astype(jnp.int32)) - 1)
    # int32 scatter (TPU-linear) then widen
    gids = jnp.zeros(n, jnp.int32).at[perm32].set(
        gid_sorted32).astype(jnp.int64)
    # dead keys -> per-row unique negative ids so they never equal anything
    gids = jnp.where(live, gids, -(idx + 2))
    return gids[:b_cap], gids[b_cap:]


_MAXW = 0xFFFFFFFFFFFFFFFF


def _direct_key_kind(col: DeviceColumn) -> Optional[str]:
    """Dtype kind for the direct (no-grouper) single-key path. Kinds must
    match across sides because order words normalize signed/unsigned/float
    differently (the grouper path's equality_word folds signed+unsigned
    into one word space; order_word does not)."""
    v = col.values
    if v.ndim != 1:
        return None
    dt = v.dtype
    if dt == jnp.bool_:
        return "b"
    if jnp.issubdtype(dt, jnp.unsignedinteger):
        return "u"
    if jnp.issubdtype(dt, jnp.integer):
        return "i"
    if jnp.issubdtype(dt, jnp.floating):
        return "f"
    return None


def _use_direct_single_key(build_cols, probe_cols) -> bool:
    import os
    if os.environ.get("ARROW_TPU_JOIN_DIRECT", "on") == "off":
        return False
    if len(build_cols) != 1 or len(probe_cols) != 1:
        return False
    kb = _direct_key_kind(build_cols[0])
    return kb is not None and kb == _direct_key_kind(probe_cols[0])


def _direct_word(col: DeviceColumn) -> jax.Array:
    """Order word that is ALSO equality-preserving for the direct path:
    NaNs canonicalize to the max word (NaN joins NaN, like the grouper
    path's canonical-NaN equality word; the max word is unreachable for
    non-NaN floats on both the bitcast and float-float lowerings)."""
    from .keys import order_word
    w = order_word(col)
    v = col.values
    if jnp.issubdtype(v.dtype, jnp.floating):
        w = jnp.where(jnp.isnan(v), jnp.uint64(_MAXW), w)
    return w


def build_join_plan(build_cols: Sequence[DeviceColumn],
                    probe_cols: Sequence[DeviceColumn],
                    build_count, probe_count,
                    join_type: str = "inner") -> JoinPlan:
    b_cap = build_cols[0].capacity
    p_cap = probe_cols[0].capacity
    build_mask = jnp.arange(b_cap, dtype=jnp.int32) < build_count
    probe_mask = jnp.arange(p_cap, dtype=jnp.int32) < probe_count
    m = _searchsorted_method()
    from .move import sort_with_payload

    if _use_direct_single_key(build_cols, probe_cols):
        # Direct single-key path: no shared grouper, no probe-side sort.
        # Sort ONLY the build side by (live-class, order word) and binary
        # search the probe's order words against it — O(B log B + P)
        # instead of the grouper's O((B+P) log (B+P)) multi-operand
        # concat sort, and a far smaller HLO (the concat-sort form is
        # what wedges remote compiles at SF1 shapes, docs/TUNNEL.md).
        bc, pc_ = build_cols[0], probe_cols[0]
        wb = _direct_word(bc)
        wp = _direct_word(pc_)
        null_b = jnp.zeros(b_cap, jnp.bool_) if bc.validity is None \
            else ~bc.validity
        null_p = jnp.zeros(p_cap, jnp.bool_) if pc_.validity is None \
            else ~pc_.validity
        live_b = jnp.logical_and(build_mask, ~null_b)
        live_p = jnp.logical_and(probe_mask, ~null_p)
        cls = jnp.where(live_b, jnp.uint32(0), jnp.uint32(1))
        sorted_w, order_b32 = sort_with_payload(
            [cls, wb], [wb, jnp.arange(b_cap, dtype=jnp.int32)])
        order_b = order_b32.astype(jnp.int64)
        live_count = jnp.sum(live_b.astype(jnp.int32))
        pos = jnp.arange(b_cap, dtype=jnp.int32)
        # dead rows (null key / padding) sorted to the tail; pin their
        # word payload to MAXW so the array stays monotone, then clamp
        # search results to the live region so MAXW probe keys (int64
        # max / canonical NaN) only match LIVE MAXW build rows
        sorted_w = jnp.where(pos < live_count, sorted_w,
                             jnp.uint64(_MAXW))
        left = jnp.searchsorted(sorted_w, wp, side="left", method=m)
        right = jnp.searchsorted(sorted_w, wp, side="right", method=m)
        left = jnp.minimum(left, live_count)
        right = jnp.minimum(right, live_count)
        probe_valid_key = live_p
        counts = jnp.where(live_p, right - left, 0).astype(jnp.int64)
        sorted_gb = sorted_w
    else:
        gb, gp = _side_gids(build_cols, probe_cols, build_mask,
                            probe_mask)

        # sort build rows by gid, carrying gb and the row index as
        # payloads (no post-sort gathers: element gathers are quadratic
        # on TPU)
        sort_key = jnp.where(gb >= 0, gb.astype(jnp.uint64) * 2,
                             jnp.uint64(_MAXW))
        sorted_gb_raw, order_b32 = sort_with_payload(
            [sort_key], [gb, jnp.arange(b_cap, dtype=jnp.int32)])
        order_b = order_b32.astype(jnp.int64)
        sorted_gb = jnp.where(sorted_gb_raw >= 0, sorted_gb_raw,
                              jnp.asarray(2 ** 62, jnp.int64))

        probe_valid_key = gp >= 0
        gp_search = jnp.where(probe_valid_key, gp, -1)
        left = jnp.searchsorted(sorted_gb, gp_search, side="left",
                                method=m)
        right = jnp.searchsorted(sorted_gb, gp_search, side="right",
                                 method=m)
        counts = jnp.where(probe_valid_key,
                           right - left, 0).astype(jnp.int64)

    if join_type in ("left outer", "full outer"):
        out_counts = jnp.where(jnp.logical_and(probe_mask, counts == 0),
                               1, counts)
    elif join_type == "left semi":
        out_counts = jnp.where(counts > 0, 1, 0).astype(jnp.int64)
    elif join_type == "left anti":
        out_counts = jnp.where(jnp.logical_and(probe_mask, counts == 0),
                               1, 0).astype(jnp.int64)
    else:
        out_counts = counts
    out_counts = jnp.where(probe_mask, out_counts, 0)

    offsets = jnp.cumsum(out_counts) - out_counts  # exclusive
    total = jnp.sum(out_counts)

    # build rows that matched at least one live probe row — consumed
    # ONLY by the right/full join types, and the dominant prep cost
    # when computed via scatter-add difference arrays (chip bisect:
    # 264 of ~300 ms at 1M probes; 1-D scatters serialize on this
    # lowering, move.py header). Gate it by join type and compute it
    # scatter-free: a sorted-build position s is covered iff
    # #(probe intervals opening at or before s) > #(closing at or
    # before s) — two int32 sorts of the interval endpoints + two
    # searchsorteds replace the scatter-adds + cumsum.
    if join_type in ("right outer", "full outer", "right semi",
                     "right anti"):
        is_match = counts > 0
        end = jnp.int32(b_cap + 1)
        sl = jnp.sort(jnp.where(is_match, left.astype(jnp.int32), end))
        sr = jnp.sort(jnp.where(is_match, right.astype(jnp.int32), end))
        pos = jnp.arange(b_cap, dtype=jnp.int32)
        n_open = jnp.searchsorted(sl, pos, side="right", method=m)
        n_closed = jnp.searchsorted(sr, pos, side="right", method=m)
        covered = (n_open - n_closed) > 0  # sorted-build positions
        build_matched = jnp.zeros(b_cap, jnp.bool_).at[order_b].set(
            covered)
    else:
        build_matched = jnp.zeros(b_cap, jnp.bool_)

    return JoinPlan(order_b, sorted_gb, left, counts, offsets, total,
                    probe_mask, build_matched)


def join_gather_indices(plan: JoinPlan, out_capacity: int,
                        join_type: str = "inner",
                        unique_build: bool = False):
    """Expand the plan into (probe_idx, build_idx, build_valid, row_live)
    arrays of length out_capacity.

    build_valid=False rows are outer-join rows with a null build side.

    unique_build=True is the primary-key join fast path (the host
    observed max(counts) <= 1 in the same readback that sizes the
    output): every probe row matches at most one build row, so the
    offsets-searchsorted match expansion — the JoinMatchIterator
    analogue and the largest program in the general materialize —
    collapses to an identity mapping (left outer) or one compaction
    sort (inner). Reference analogue: the no-duplicate-keys branch of
    swiss_join.cc's probe processing."""
    from .move import gather_rows, sort_with_payload
    b_len = plan.order_b.shape[0]
    if unique_build and join_type == "left outer":
        # identity expansion: each live probe row emits exactly one
        # output row at its own position (out_capacity == probe cap)
        p_cap = plan.counts.shape[0]
        probe_idx = jnp.arange(p_cap, dtype=jnp.int64)
        row_live = plan.probe_live
        (build_idx,) = gather_rows(
            [plan.order_b],
            jnp.minimum(plan.left.astype(jnp.int64), b_len - 1))
        build_valid = jnp.logical_and(plan.counts > 0, row_live)
        return probe_idx, build_idx, build_valid, row_live
    if unique_build and join_type == "inner":
        # ONE stable compaction sort over the probe side (matched rows
        # first, original order kept) carrying the probe index and the
        # match position; no offsets searchsorted, no probe-state gather
        p_cap = plan.counts.shape[0]
        drop = plan.counts <= 0
        iota = jnp.arange(p_cap, dtype=jnp.int32)
        s_iota, s_left = sort_with_payload(
            [drop], [iota, plan.left.astype(jnp.int32)])
        probe_idx = s_iota[:out_capacity].astype(jnp.int64)
        g_left = s_left[:out_capacity].astype(jnp.int64)
        out_i = jnp.arange(out_capacity, dtype=jnp.int64)
        row_live = out_i < plan.total
        (build_idx,) = gather_rows(
            [plan.order_b], jnp.minimum(g_left, b_len - 1))
        build_valid = row_live
        return probe_idx, build_idx, build_valid, row_live
    out_i = jnp.arange(out_capacity, dtype=jnp.int64)
    row_live = out_i < plan.total
    # which probe row produced output row i: offsets are sorted
    probe_idx = jnp.searchsorted(plan.offsets + _counts_of(plan, join_type),
                                 out_i, side="right",
                                 method=_searchsorted_method())
    probe_idx = jnp.minimum(probe_idx, plan.offsets.shape[0] - 1)
    # per-output-row probe state in ONE multi-payload TPU-linear gather
    g_offsets, g_counts, g_left = gather_rows(
        [plan.offsets, plan.counts, plan.left], probe_idx)
    k = out_i - g_offsets
    has_match = g_counts > 0
    sorted_pos = g_left + jnp.minimum(k, jnp.maximum(g_counts - 1, 0))
    (build_idx,) = gather_rows(
        [plan.order_b],
        jnp.minimum(sorted_pos, plan.order_b.shape[0] - 1))
    build_valid = jnp.logical_and(has_match, row_live)
    return probe_idx, build_idx, build_valid, row_live


def _counts_of(plan: JoinPlan, join_type: str):
    # reconstruct out_counts from offsets: offsets is exclusive prefix sum,
    # so counts[i] = offsets[i+1]-offsets[i]; compute via shifted diff
    offs = plan.offsets
    nxt = jnp.concatenate([offs[1:], plan.total[None]])
    return nxt - offs


def gather_batch_columns(batch: DeviceBatch, idx: jax.Array,
                         valid: Optional[jax.Array],
                         out_capacity: int) -> List[DeviceColumn]:
    """Gather all of a batch's buffers by row index in ONE TPU-linear
    multi-payload gather (compute/move.py)."""
    from .move import gather_rows
    safe = jnp.clip(idx, 0, batch.capacity - 1)
    arrays, spec = [], []
    for c in batch.columns:
        arrays.append(c.values)
        has_v = c.validity is not None
        if has_v:
            arrays.append(c.validity)
        spec.append(has_v)
    outs = gather_rows(arrays, safe)
    cols, i = [], 0
    for c, has_v in zip(batch.columns, spec):
        vals = outs[i]
        i += 1
        v = None
        if has_v:
            v = outs[i]
            i += 1
        if valid is not None:
            v = valid if v is None else jnp.logical_and(v, valid)
        cols.append(DeviceColumn(vals, v, c.type, c.dictionary))
    return cols


def unmatched_build_plan(plan: JoinPlan, build_count):
    """For right/full outer + right semi/anti: mask of build rows to emit."""
    b_cap = plan.build_matched.shape[0]
    build_mask = jnp.arange(b_cap, dtype=jnp.int32) < build_count
    unmatched = jnp.logical_and(build_mask, ~plan.build_matched)
    matched = jnp.logical_and(build_mask, plan.build_matched)
    return unmatched, matched
