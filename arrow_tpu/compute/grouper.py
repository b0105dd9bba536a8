"""Grouper: multi-column key -> dense group ids.

Reference analogue: compute/row/grouper.h (GrouperFastImpl: SwissTable +
row encoding, grouper.cc:555). TPU redesign: a single multi-operand stable
sort over equality-normalized key words, boundary detection, and a
rank-by-first-appearance remap — fully vectorized, no hash table, no
minibatching. Group ids are assigned in order of first appearance, matching
the reference's insertion order so downstream results align bit-exactly.

Also powers unique / value_counts / dictionary_encode
(kernels/vector_hash.cc analogues).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from .. import types as T
from ..device.column import DeviceBatch, DeviceColumn
from ..types import TypeId
from .keys import group_key_arrays, stable_sort_indices
from .registry import ExecContext, register
from .selection import Compacted, take_batch


class GroupResult(NamedTuple):
    group_ids: jax.Array      # int64[capacity]; capacity (=invalid) on padding
    num_groups: jax.Array     # int64 scalar
    rep_indices: jax.Array    # int64[capacity]: row index of each group's
                              # first occurrence (garbage past num_groups)


_PERFECT_HASH_MAX_SLOTS = 1 << 16


def _perfect_hash_sizes(key_cols: Sequence[DeviceColumn], cap: int):
    """If every key is dictionary-coded or bool with a small combined slot
    space, grouping needs no sort: slot = mixed-radix code. Returns per-key
    radix sizes (incl. a null bucket) or None."""
    sizes = []
    total = 1
    for c in key_cols:
        if c.dictionary is not None:
            size = len(c.dictionary) + 1
        elif c.type.id == TypeId.BOOL:
            size = 3
        else:
            return None
        sizes.append(size)
        total *= size
        if total > min(cap, _PERFECT_HASH_MAX_SLOTS):
            return None
    return sizes


def _group_ids_perfect(ctx: ExecContext,
                       key_cols: Sequence[DeviceColumn],
                       sizes) -> GroupResult:
    """O(n) grouping via direct slot indexing — the TPU fast path replacing
    GrouperFastImpl's swiss table for low-cardinality keys."""
    cap = ctx.capacity
    row_mask = ctx.row_mask()
    n_slots = 1
    for s in sizes:
        n_slots *= s
    slot = jnp.zeros(cap, jnp.int32)
    for c, size in zip(key_cols, sizes):
        code = c.values.astype(jnp.int32)
        null_code = size - 1
        if c.validity is not None:
            code = jnp.where(c.validity, code, null_code)
        code = jnp.clip(code, 0, null_code)
        slot = slot * size + code
    from .move import segment_reduce
    idx32 = jnp.arange(cap, dtype=jnp.int32)
    seg = jnp.where(row_mask, slot, 0)
    first_pos = segment_reduce(
        jnp.where(row_mask, idx32, cap), seg, n_slots, "min",
        cap).astype(jnp.int64)
    idx = jnp.arange(cap, dtype=jnp.int64)
    observed = first_pos < cap
    big = jnp.asarray(2 * cap, jnp.int64)
    order = jnp.argsort(jnp.where(observed, first_pos, big))
    rank = jnp.zeros(n_slots, jnp.int64).at[order].set(
        jnp.arange(n_slots, dtype=jnp.int64))
    num_groups = jnp.sum(observed, dtype=jnp.int64)
    gids = jnp.where(row_mask, rank[slot], cap)
    rep_small = first_pos[order]
    if n_slots < cap:
        rep = jnp.concatenate([rep_small,
                               jnp.zeros(cap - n_slots, jnp.int64)])
    else:
        rep = rep_small[:cap]
    return GroupResult(gids, num_groups, rep)


_NESTED_IDS = (TypeId.LIST, TypeId.LARGE_LIST, TypeId.FIXED_SIZE_LIST,
               TypeId.LIST_VIEW, TypeId.LARGE_LIST_VIEW, TypeId.STRUCT,
               TypeId.MAP, TypeId.SPARSE_UNION, TypeId.DENSE_UNION,
               TypeId.RUN_END_ENCODED)


def group_ids(ctx: ExecContext,
              key_cols: Sequence[DeviceColumn]) -> GroupResult:
    for c in key_cols:
        if c.type.id in _NESTED_IDS:
            # reference parity: the Grouper has no nested-key encoders
            # (compute/row/grouper.cc rejects them); the passthrough
            # row-id codes would otherwise group by row identity
            from .registry import ArrowInvalid
            raise ArrowInvalid(
                f"grouping/distinct on nested type {c.type!r} is not "
                "supported")
    cap = ctx.capacity
    sizes = _perfect_hash_sizes(key_cols, cap)
    if sizes is not None:
        return _group_ids_perfect(ctx, key_cols, sizes)
    row_mask = ctx.row_mask()
    keys = group_key_arrays(key_cols, row_mask)
    # ONE stable sort returns the sorted keys AND the permutation
    # (payload carry: re-gathering keys by perm would be a quadratic
    # 1-D element gather on TPU — compute/move.py). The row mask rides
    # INSIDE the packed class word (padding rows sort to the all-ones
    # sentinel), not as its own operand.
    iota = jnp.arange(cap, dtype=jnp.int64)
    sort_out = jax.lax.sort(tuple(keys) + (iota,), dimension=0,
                            is_stable=True, num_keys=len(keys))
    sorted_keys = list(sort_out[:len(keys)])
    from .keys import GROUP_KEY_DEAD
    sorted_mask_carried = sort_out[0] != jnp.uint64(GROUP_KEY_DEAD)
    perm = sort_out[-1]
    idx = jnp.arange(cap, dtype=jnp.int64)
    neq = jnp.zeros(cap, jnp.bool_)
    for k in sorted_keys:
        neq = jnp.logical_or(neq, k != jnp.roll(k, 1))
    is_new = jnp.logical_or(idx == 0, neq)
    sorted_mask = sorted_mask_carried
    is_new = jnp.logical_and(is_new, sorted_mask)
    # group id in SORTED order
    gid_sorted = jnp.cumsum(is_new.astype(jnp.int64)) - 1
    num_groups = jnp.sum(is_new, dtype=jnp.int64)
    perm32 = perm.astype(jnp.int32)

    from .move import use_sort_paths
    if use_sort_paths():
        # Scatter-free appearance ranking (chip: cap-sized 1-D
        # scatters serialize — the same op class was 264 of ~300 ms of
        # join prep). Three payload-carrying sorts replace the
        # scatter-min + two argsort/scatter inversions + the
        # rank[gid_sorted] element gather:
        #  (1) broadcast each group's first-appearance row index
        #      (= its head row's perm: the key sort is stable) over
        #      the group's run via a segmented log-depth scan;
        #  (2) sort rows by that index — groups land in appearance
        #      order, so a run-head cumsum IS the appearance gid;
        #  (3) sort by perm to restore row order.
        head_val = jnp.where(is_new, perm32, 0)

        def comb(a, b):
            f1, v1 = a
            f2, v2 = b
            return jnp.logical_or(f1, f2), jnp.where(f2, v2, v1)

        _, fp = jax.lax.associative_scan(comb, (is_new, head_val))
        fp = jnp.where(sorted_mask, fp, jnp.int32(cap))
        srt2 = jax.lax.sort((fp, perm32), dimension=0, is_stable=True,
                            num_keys=1)
        fp2, perm2 = srt2
        live2 = fp2 < jnp.int32(cap)
        pos = jnp.arange(cap, dtype=jnp.int32)
        h = jnp.logical_or(pos == 0, fp2 != jnp.roll(fp2, 1))
        h = jnp.logical_and(h, live2)
        gid2 = (jnp.cumsum(h.astype(jnp.int32)) - 1)
        gid2 = jnp.where(live2, gid2, jnp.int32(cap))
        _, gids32 = jax.lax.sort((perm2, gid2), dimension=0,
                                 is_stable=True, num_keys=1)
        gids = jnp.where(row_mask, gids32, cap).astype(jnp.int64)
        # appearance-ordered first-occurrence rows = first positions
        # ascending (rank IS the order by first_pos)
        rep = jnp.sort(jnp.where(is_new, perm32,
                                 jnp.int32(cap))).astype(jnp.int64)
        return GroupResult(gids, num_groups, rep)

    # direct (CPU/GPU) movement: native scatters are linear and faster
    # than extra sorts
    first_pos32 = jnp.full(cap, cap, jnp.int32).at[
        jnp.where(sorted_mask, gid_sorted, cap).astype(jnp.int32)].min(
        jnp.where(sorted_mask, perm32, cap), mode="drop")
    first_pos = first_pos32.astype(jnp.int64)
    # rank groups by first appearance -> appearance-order ids
    order = jnp.argsort(
        jnp.where(jnp.arange(cap, dtype=jnp.int64) <
                  num_groups, first_pos, jnp.asarray(2 * cap, jnp.int64)))
    rank32 = jnp.zeros(cap, jnp.int32).at[order].set(
        jnp.arange(cap, dtype=jnp.int32))
    gid_appearance_sorted = rank32[gid_sorted]

    # scatter back to row order (int32 payload)
    gids32 = jnp.full(cap, cap, jnp.int32).at[perm].set(
        jnp.where(sorted_mask, gid_appearance_sorted,
                  cap).astype(jnp.int32), mode="drop")
    gids = gids32.astype(jnp.int64)
    rep = first_pos[order]  # appearance-ordered first-occurrence row index
    return GroupResult(gids, num_groups, rep)


def unique_batch(ctx: ExecContext, batch: DeviceBatch,
                 key_names: Sequence[str]) -> DeviceBatch:
    cols = [batch.column(n) for n in key_names]
    g = group_ids(ctx, cols)
    sub = batch.select(list(key_names))
    safe_rep = jnp.where(
        jnp.arange(ctx.capacity, dtype=jnp.int64) < g.num_groups,
        g.rep_indices, 0)
    return take_batch(sub, safe_rep, g.num_groups.astype(jnp.int32))


@register("unique", "vector")
def _unique(ctx, col):
    from .selection import gather_columns
    g = group_ids(ctx, [col])
    cap = ctx.capacity
    safe_rep = jnp.where(jnp.arange(cap, dtype=jnp.int64) < g.num_groups,
                         g.rep_indices, 0)
    (out,) = gather_columns([col], safe_rep)
    return Compacted(out, g.num_groups.astype(jnp.int32))


@register("value_counts", "vector")
def _value_counts(ctx, col):
    from .move import segment_count
    from .selection import gather_columns
    g = group_ids(ctx, [col])
    cap = ctx.capacity
    live = g.group_ids < cap
    seg = jnp.where(live, g.group_ids, 0).astype(jnp.int32)
    counts = segment_count(live, seg, cap)
    safe_rep = jnp.where(jnp.arange(cap, dtype=jnp.int64) < g.num_groups,
                         g.rep_indices, 0)
    (rep,) = gather_columns([col], safe_rep)
    vals, validity = rep.values, rep.validity
    n = g.num_groups.astype(jnp.int32)
    return {
        "values": Compacted(DeviceColumn(vals, validity, col.type,
                                         col.dictionary), n),
        "counts": Compacted(DeviceColumn(counts, None, T.int64()), n),
    }


@register("dictionary_encode", "vector")
def _dictionary_encode(ctx, col):
    """Returns appearance-ordered codes; on device strings are already
    dictionary codes, so this re-densifies to the used value set."""
    g = group_ids(ctx, [col])
    cap = ctx.capacity
    codes = jnp.where(g.group_ids < cap, g.group_ids, 0).astype(jnp.int32)
    return Compacted(DeviceColumn(codes, col.validity,
                                  T.dictionary(T.int32(), col.type)),
                     ctx.row_count)


def group_slot_bound_exact(key_cols: Sequence[DeviceColumn],
                           cap: int) -> int:
    """Exact perfect-hash slot count (unpadded), or cap when keys are not
    perfect-hashable. Kernels reduce at THIS bound; batch capacities pad
    up separately."""
    sizes = _perfect_hash_sizes(key_cols, cap)
    if sizes is None:
        return cap
    n = 1
    for s in sizes:
        n *= s
    return min(n, cap)


def group_capacity_bound(key_cols: Sequence[DeviceColumn],
                         cap: int) -> int:
    """Static upper bound on the number of groups: the perfect-hash slot
    count when available, else the row capacity. Lets plan nodes shrink
    aggregate output batches."""
    sizes = _perfect_hash_sizes(key_cols, cap)
    if sizes is None:
        return cap
    n = 1
    for s in sizes:
        n *= s
    from ..device.column import round_up
    return min(cap, round_up(n, 1024))
