"""TPU-safe bulk data movement.

Measured on v5e (rounds 1-4; docs/ARCHITECTURE.md + round-4 A/B in
CHIP_SESSION_r04.jsonl at 4M rows):

* multi-operand stable sort: the ONLY linear bulk mover. u8-key sort
  with one f64 payload 16.9 ms; payload count amortizes inside one
  sort (4 f64 payloads cost 2.6x one, not 4x) -> multi-column
  compaction shares ONE sort (9.25 GB/s effective vs 6.0 single).
* element gathers: QUADRATIC-ish for any dtype; the
  indices_are_sorted hint does NOT improve the lowering (sorted-hint
  take of 4M f64: 68.9 ms = 4x the full sort-compact). The round-4
  'gather' movement mode (index sort + hinted column gathers) lost
  its A/B 9-30x and exists only for measurement.
* int32 1-D scatters: ~2x SLOWER than the drop-key sort on the
  current tunnel build (30.5 ms vs 16.9 at 4M) — the round-2 "linear
  scatter" reading did not reproduce; 'scatter' mode is measurement-
  only as well.
* 64-bit division: software-expanded to a program large enough to
  wedge a degraded remote compiler — use multiply-shift range maps.

Every bulk reordering in the engine therefore routes through lax.sort
payload carries:

* compaction (filter)      -> ONE stable sort keyed on the drop-flag,
                              all columns riding as payload operands
* reordering (order_by)    -> payload carry in the key sort itself
* segment reductions (agg) -> masked per-slot loop for small group bounds,
                              sort + segmented scan + boundary diff for
                              large ones
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_SMALL_SEGMENT_LOOP = 64
_SMALL_GATHER_REQ = 1024


def movement_mode() -> str:
    """Movement strategy: 'direct' (CPU/GPU native scatters/gathers),
    'sort' (multi-operand stable sorts — works for every dtype),
    'scatter' (int32 scatters; 64-bit integers ride as two u32 planes,
    f64 falls back to the sort), 'gather' (ONE i32 index sort, then
    per-column gathers with indices_are_sorted hints — replaces k
    payload-carrying sorts with k linear sorted gathers; chip-measured
    vs 'sort' in CHIP_SESSION_r04), or 'pallas' (compaction via the
    pallas_move butterfly kernel — streams each block once instead of
    paying the sort network; other movers fall back to 'sort'). 'pallas'
    is NEVER auto-selected: Mosaic compile RPCs can wedge the tunneled
    device (docs/TUNNEL.md), so it requires the explicit env override.
    Override with ARROW_TPU_MOVEMENT."""
    import os
    force = os.environ.get("ARROW_TPU_MOVEMENT")
    if force in ("sort", "direct", "scatter", "gather", "pallas"):
        return force
    if force and force != "auto":
        import warnings
        warnings.warn(f"unrecognized ARROW_TPU_MOVEMENT={force!r}; "
                      "expected auto|sort|direct|scatter|gather — "
                      "using auto", stacklevel=2)
    import jax
    if jax.default_backend() == "cpu":
        return "direct"
    # Pallas compaction auto-selects ONLY on banked chip evidence: a
    # session A/B that measured the butterfly kernel faster than the
    # sort path on this platform (platform_check.pallas_measured)
    from ..platform_check import pallas_measured
    if pallas_measured("compact"):
        return "pallas"
    return "sort"


def use_sort_paths() -> bool:
    """True when the TPU-safe (non-direct) movement lowering is active
    (element gathers / 64-bit scatters lower quadratically there)."""
    return movement_mode() != "direct"


def sort_planes_mode() -> str:
    """64-bit INTEGER payloads ride multi-operand sorts as two u32
    planes: XLA software-emulates 64-bit moves on v5e, and the round-4
    chip A/B measured the planes form 1.75x faster (11.6 vs 20.4 ms
    compacting 4M i64, CHIP_SESSION_r04.jsonl). 'auto' = on for
    non-direct (TPU-safe) movement; override ARROW_TPU_SORT_PLANES."""
    import os
    v = os.environ.get("ARROW_TPU_SORT_PLANES", "auto")
    return v if v in ("on", "off", "auto") else "auto"


def _use_sort_planes() -> bool:
    mode = sort_planes_mode()
    if mode == "off":
        return False
    if mode == "on":
        return True
    return use_sort_paths()


def _max_sort_payloads() -> int:
    """Operand-count cap per lax.sort. The tunneled remote compiler
    WEDGES on multi-operand sorts beyond ~6-8 operands at multi-M
    shapes (round-4 op-level bisect: every hung program — Q1's old
    aggregate, the 16-column order_by, the join pre-chain compaction —
    contained one; every piece compiled once narrowed). Wide payload
    sets are split into chunks that re-sort the SAME keys: each chunk
    pays the key sort again (measured 2.6x for 4 payloads vs 4x naive),
    but the program compiles. 0 disables splitting.
    Override ARROW_TPU_MAX_SORT_PAYLOADS."""
    import os
    try:
        return int(os.environ.get("ARROW_TPU_MAX_SORT_PAYLOADS", "5"))
    except ValueError:
        return 5


def sort_with_payload(keys: Sequence[jax.Array],
                      payloads: Sequence[jax.Array]) -> List[jax.Array]:
    """Stable multi-operand sort; returns sorted payloads. 64-bit
    integer payloads are decomposed into two u32 planes around the sort
    where that lowering is faster (sort_planes_mode), and wide payload
    sets are split across several same-key sorts (_max_sort_payloads)."""
    n_keys = len(keys)
    payloads = list(payloads)
    cap = _max_sort_payloads()
    if use_sort_paths() and cap > 0:
        # weight by POST-plane-expansion operand count (a 64-bit int
        # payload becomes two u32 operands under sort_planes_mode)
        planes_on = _use_sort_planes()

        def weight(p):
            return 2 if (planes_on and p.ndim == 1
                         and jnp.issubdtype(p.dtype, jnp.integer)
                         and p.dtype.itemsize == 8) else 1
        total = sum(weight(p) for p in payloads)
        if total > cap:
            out: List[jax.Array] = []
            chunk: List[jax.Array] = []
            w = 0
            for p in payloads:
                pw = weight(p)
                if chunk and w + pw > cap:
                    out.extend(sort_with_payload(keys, chunk))
                    chunk, w = [], 0
                chunk.append(p)
                w += pw
            if chunk:
                out.extend(sort_with_payload(keys, chunk))
            if len(out) > len(payloads):  # pragma: no cover - safety
                raise AssertionError("payload split mismatch")
            return out
    split = _use_sort_planes() and any(
        jnp.issubdtype(p.dtype, jnp.integer) and p.dtype.itemsize == 8
        and p.ndim == 1 for p in payloads)
    if not split:
        out = jax.lax.sort(tuple(keys) + tuple(payloads), dimension=0,
                           is_stable=True, num_keys=n_keys)
        return list(out[n_keys:])
    ops: List[jax.Array] = []
    spec = []  # per payload: None (verbatim) or signedness for planes
    for p in payloads:
        if jnp.issubdtype(p.dtype, jnp.integer) and \
                p.dtype.itemsize == 8 and p.ndim == 1:
            signed = jnp.issubdtype(p.dtype, jnp.signedinteger)
            v = p.astype(jnp.int64) if signed else p.astype(jnp.uint64)
            ops.append((v & v.dtype.type(0xFFFFFFFF)).astype(jnp.uint32))
            ops.append((v >> v.dtype.type(32)).astype(
                jnp.int32 if signed else jnp.uint32))
            spec.append((signed, p.dtype))
        else:
            ops.append(p)
            spec.append(None)
    out = jax.lax.sort(tuple(keys) + tuple(ops), dimension=0,
                       is_stable=True, num_keys=n_keys)
    flat = list(out[n_keys:])
    res: List[jax.Array] = []
    i = 0
    for sp in spec:
        if sp is None:
            res.append(flat[i])
            i += 1
        else:
            signed, dtype = sp
            lo, hi = flat[i], flat[i + 1]
            i += 2
            wide_t = jnp.int64 if signed else jnp.uint64
            wide = (hi.astype(wide_t) << wide_t(32)) | lo.astype(wide_t)
            res.append(wide.astype(dtype))
    return res


def _scatter32_to(positions: jax.Array, a: jax.Array,
                  cap: int) -> Optional[jax.Array]:
    """Place a[i] at positions[i] (out-of-range drops) using only
    <=32-bit scatters: direct for narrow dtypes, two u32 planes for
    64-bit integers (exact shift split/recombine), three planes for
    f64 (exact frexp mantissa/exponent split — the tunneled compiler
    rejects f64 BITCASTS, but frexp/ldexp are arithmetic)."""
    shape = (cap + 1,) + a.shape[1:]
    if a.dtype.itemsize <= 4:
        return jnp.zeros(shape, a.dtype).at[positions].set(
            a, mode="drop")[:cap]
    if jnp.issubdtype(a.dtype, jnp.integer):
        signed = jnp.issubdtype(a.dtype, jnp.signedinteger)
        v = a.astype(jnp.int64) if signed else a.astype(jnp.uint64)
        lo = (v & v.dtype.type(0xFFFFFFFF)).astype(jnp.uint32)
        hi = (v >> v.dtype.type(32)).astype(
            jnp.int32 if signed else jnp.uint32)
        slo = jnp.zeros(shape, jnp.uint32).at[positions].set(
            lo, mode="drop")[:cap]
        shi = jnp.zeros(shape, hi.dtype).at[positions].set(
            hi, mode="drop")[:cap]
        wide = (shi.astype(v.dtype) << v.dtype.type(32)) | \
            slo.astype(v.dtype)
        return wide.astype(a.dtype)
    if a.dtype == jnp.float64:
        mode = f64_planes_mode()
        if mode == "bitcast":
            return _scatter_f64_bitcast(positions, a, cap)
        if mode == "frexp":
            return _scatter_f64_frexp(positions, a, cap)
        return None  # 'off': caller's shared drop-key sort (always exact)
    return None


def f64_planes_mode() -> str:
    """How f64 rides the 32-bit scatter path: 'bitcast' (u32 plane
    views — bit-exact, but the tunneled TPU compiler rejected every
    f64 bitcast in round 2), 'frexp' (arithmetic mantissa/exponent
    split — exact EXCEPT subnormal inputs flush to zero, because XLA
    itself flushes subnormal f64 products), or 'off' (sort fallback,
    always exact). Default: bitcast where the platform supports it,
    else off. Override with ARROW_TPU_F64_PLANES."""
    import os
    force = os.environ.get("ARROW_TPU_F64_PLANES")
    if force in ("bitcast", "frexp", "off"):
        return force
    from ..platform_check import platform_kind
    return "off" if platform_kind() in ("axon", "tpu") else "bitcast"


def _scatter_f64_bitcast(positions: jax.Array, a: jax.Array,
                         cap: int) -> jax.Array:
    """f64 scatter as one (n, 2) u32-plane scatter via bitcast views —
    fully bit-exact (subnormals, -0.0, NaN payloads)."""
    planes = jax.lax.bitcast_convert_type(a, jnp.uint32)  # (..., 2)
    out = jnp.zeros((cap + 1,) + planes.shape[1:], jnp.uint32).at[
        positions].set(planes, mode="drop")[:cap]
    return jax.lax.bitcast_convert_type(out, jnp.float64)


def _scatter_f64_frexp(positions: jax.Array, a: jax.Array,
                       cap: int) -> jax.Array:
    """f64 scatter via arithmetic (no-bitcast) 32-bit planes.

    Decomposition: v = mi * 2^(e-53) with mi a 53-bit signed integer
    (frexp mantissa scaled up; exact), plus a packed (exponent|class)
    i32 plane carrying specials: 0 finite, 1 +inf, 2 -inf, 3 nan,
    4 negative zero. mi rides the two-u32 integer path; recombination
    ldexp(mi * 2^-53, e) is a pure power-of-two scale.

    Known limit: XLA flushes subnormal f64 results of ANY arithmetic
    to zero (verified on XLA:CPU), so subnormal inputs come back as
    +-0.0 — the same value every arithmetic kernel in the engine
    would produce from them. Use 'bitcast' mode (or the sort path)
    when byte-exact subnormal movement matters."""
    finite = jnp.isfinite(a)
    m, e = jnp.frexp(jnp.where(finite, a, 0.0))
    mi = (m * jnp.float64(2.0 ** 53)).astype(jnp.int64)
    is_negzero = jnp.logical_and(a == 0.0, jnp.signbit(a))
    cls = jnp.where(jnp.isnan(a), 3,
                    jnp.where(a == jnp.inf, 1,
                              jnp.where(a == -jnp.inf, 2,
                                        jnp.where(is_negzero, 4, 0))))
    # exponent fits comfortably in 18 bits; pack class above it
    packed = ((e.astype(jnp.int32) + 16384) |
              (cls.astype(jnp.int32) << 18))
    smi = _scatter32_to(positions, mi, cap)
    sp = jnp.zeros((cap + 1,) + a.shape[1:], jnp.int32).at[
        positions].set(packed, mode="drop")[:cap]
    se = (sp & 0x3FFFF) - 16384
    scls = sp >> 18
    m2 = smi.astype(jnp.float64) * jnp.float64(2.0 ** -53)
    v = jnp.ldexp(m2, se)
    v = jnp.where(scls == 1, jnp.inf, v)
    v = jnp.where(scls == 2, -jnp.inf, v)
    v = jnp.where(scls == 3, jnp.nan, v)
    v = jnp.where(scls == 4, jnp.float64(-0.0), v)
    return v


def compact_by_mask(keep: jax.Array,
                    arrays: Sequence[jax.Array]) -> Tuple[List[jax.Array],
                                                          jax.Array]:
    """Move rows where keep is True to the front, preserving order.
    Returns (compacted arrays, count)."""
    count = jnp.sum(keep, dtype=jnp.int32)
    mode = movement_mode()
    cap = keep.shape[0]
    if mode == "pallas" and all(a.ndim == 1 for a in arrays):
        import jax as _jax
        from .pallas_move import compact_arrays_pallas
        interp = _jax.default_backend() == "cpu"  # CPU tests interpret
        return compact_arrays_pallas(keep, list(arrays),
                                     interpret=interp), count
    if mode == "sort":
        drop_key = (~keep).astype(jnp.uint8)
        outs = sort_with_payload([drop_key], arrays)
        return outs, count
    if mode == "gather":
        # ONE i32 sort computes the kept-row source indices; every
        # column then rides a gather whose indices are monotone
        # non-decreasing (dropped tail clamped to the last row), so the
        # indices_are_sorted hint is truthful and XLA can lower the
        # gather without the quadratic general-gather expansion.
        idx = jnp.arange(cap, dtype=jnp.int32)
        drop_key = (~keep).astype(jnp.uint8)
        (src,) = sort_with_payload([drop_key], [idx])
        src = jnp.where(idx < count, src, cap - 1)
        outs = [jnp.take(a, src, axis=0, indices_are_sorted=True,
                         unique_indices=False, mode="clip")
                for a in arrays]
        return outs, count
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    positions = jnp.where(keep, pos, cap)
    if mode == "direct":
        outs = [jnp.zeros_like(a).at[positions].set(a, mode="drop")
                for a in arrays]
        return outs, count
    # 'scatter': int32 scatters per plane; dtypes with no 32-bit
    # decomposition (f64) share ONE drop-key sort
    outs: List[Optional[jax.Array]] = []
    leftover = []
    for i, a in enumerate(arrays):
        s = _scatter32_to(positions, a, cap)
        outs.append(s)
        if s is None:
            leftover.append(i)
    if leftover:
        drop_key = (~keep).astype(jnp.uint8)
        sorted_left = sort_with_payload(
            [drop_key], [arrays[i] for i in leftover])
        for i, s in zip(leftover, sorted_left):
            outs[i] = s
    return list(outs), count


def scatter_i32(dest_size: int, positions: jax.Array,
                values: jax.Array) -> jax.Array:
    """Linear scatter for <=32-bit payloads (positions int32; out-of-range
    drops)."""
    return jnp.zeros(dest_size, values.dtype).at[positions].set(
        values, mode="drop")


def segment_reduce(values: jax.Array, gids: jax.Array, num_segments: int,
                   op: str, identity) -> jax.Array:
    """Per-segment reduce tolerant of 64-bit dtypes.

    gids must be < num_segments for live rows (dead rows already mapped to
    an in-range trash slot by callers, with `values` holding the
    identity)."""
    if not use_sort_paths():
        ops = {"sum": jax.ops.segment_sum, "min": jax.ops.segment_min,
               "max": jax.ops.segment_max}
        return ops[op](values, gids, num_segments=num_segments)
    if op == "sum" and values.dtype in (jnp.float32, jnp.float64) \
            and identity == 0.0 and num_segments > _SMALL_SEGMENT_LOOP:
        # mid-cardinality only: below _SMALL_SEGMENT_LOOP the masked
        # broadcast reduce fuses into the surrounding XLA program
        # (pallas_call is a fusion barrier — routing Q1's 6-group sums
        # through it would break the fused macro), above MAX_SEGMENTS
        # the VMEM accumulator doesn't fit. Chip A/B 2026-08-22:
        # 512 segments x 4M f64 rows 14.9 ms Pallas vs 34.1 ms sorted.
        from ..platform_check import pallas_measured
        from .pallas_move import MAX_SEGMENTS
        if num_segments <= MAX_SEGMENTS and \
                pallas_measured("group_sum"):
            from .pallas_move import grouped_sum_pallas
            return grouped_sum_pallas(values, gids.astype(jnp.int32),
                                      num_segments)
    if num_segments <= _SMALL_SEGMENT_LOOP:
        return _segment_reduce_loop(values, gids, num_segments, op,
                                    identity)
    return _segment_reduce_sorted(values, gids, num_segments, op, identity)


def _segment_reduce_loop(values, gids, num_segments, op, identity):
    # one broadcasted (rows, num_segments) masked reduce: a single fused
    # HLO instead of num_segments unrolled reductions (compile time)
    fns = {"sum": jnp.sum, "min": jnp.min, "max": jnp.max}
    fn = fns[op]
    slots = jnp.arange(num_segments, dtype=gids.dtype)[None, :]
    masked = jnp.where(gids[:, None] == slots, values[:, None],
                       jnp.asarray(identity, values.dtype))
    return fn(masked, axis=0)


def _segment_reduce_sorted(values, gids, num_segments, op, identity):
    """ONE sort by gid (payload carry), then per-segment boundaries via
    S binary searches + S-element gathers — S = num_segments is small
    relative to rows, so the searches/gathers are cheap, unlike the
    previous boundary-compaction form which rode THREE more full sorts
    (round-4 chip: 512-segment grouped sum 77.8 ms -> the one carried
    sort dominates)."""
    g32 = gids.astype(jnp.int32)
    slots = jnp.arange(num_segments, dtype=jnp.int32)
    if op == "sum":
        sv, sg = sort_with_payload([g32], [values, g32])
        cs = jnp.cumsum(sv)
        lefts = jnp.searchsorted(sg, slots, side="left")
        rights = jnp.searchsorted(sg, slots, side="right")
        hi = cs[jnp.maximum(rights, 1) - 1]
        lo = jnp.where(lefts > 0, cs[jnp.maximum(lefts, 1) - 1],
                       jnp.asarray(0, cs.dtype))
        total = (hi - lo).astype(values.dtype)
        return jnp.where(rights > lefts, total,
                         jnp.asarray(identity, values.dtype))
    # min/max: sort by (gid, value-order-word); segment head holds it
    from .keys import order_word
    asc = op == "min"

    class _Shim:  # order_word reads .values
        pass
    shim = _Shim()
    shim.values = values
    word = order_word(shim)
    if not asc:
        word = ~word
    sv, sg = sort_with_payload([g32, word], [values, g32])
    lefts = jnp.searchsorted(sg, slots, side="left")
    rights = jnp.searchsorted(sg, slots, side="right")
    head = sv[jnp.clip(lefts, 0, sv.shape[0] - 1)]
    return jnp.where(rights > lefts, head,
                     jnp.asarray(identity, values.dtype))


def _place_dense(out, gid_of_row, vals, num_segments, live):
    """out[gid_of_row[k]] = vals[k] for live k. gid rows are unique."""
    cap = gid_of_row.shape[0]
    positions = jnp.where(live, gid_of_row.astype(jnp.int32),
                          num_segments)
    if vals.dtype.itemsize <= 4:
        return jnp.concatenate(
            [out, jnp.zeros(1, out.dtype)]).at[positions].set(
                vals, mode="drop")[:num_segments]
    # 64-bit payload: route through a sort. Build (slot, value) for live
    # rows plus (slot, identity) for all slots, keyed so real values win.
    slots = jnp.arange(num_segments, dtype=jnp.int32)
    keys = jnp.concatenate([positions, slots])
    pref = jnp.concatenate([jnp.zeros(cap, jnp.uint8),
                            jnp.ones(num_segments, jnp.uint8)])
    payload = jnp.concatenate([vals, out])
    sk, sp = sort_with_payload([keys, pref], [keys, payload])
    # after sorting by (slot, pref) the REAL value (pref=0) comes first in
    # each slot group; slot s's first row is at the position where key
    # changes — compact first-rows then slice
    idx = jnp.arange(cap + num_segments, dtype=jnp.int32)
    is_first = jnp.logical_or(idx == 0, sk != jnp.roll(sk, 1))
    take = jnp.logical_and(is_first, sk < num_segments)
    (vals_out,), _ = compact_by_mask(take, [sp])
    return vals_out[:num_segments]


def segment_count(live: jax.Array, gids: jax.Array,
                  num_segments: int) -> jax.Array:
    """Count live rows per segment (int32 path, always linear)."""
    if num_segments <= _SMALL_SEGMENT_LOOP:
        slots = jnp.arange(num_segments, dtype=gids.dtype)[None, :]
        hit = jnp.logical_and(live[:, None], gids[:, None] == slots)
        return jnp.sum(hit, axis=0, dtype=jnp.int64)
    positions = jnp.where(live, gids.astype(jnp.int32), num_segments)
    counts32 = jnp.zeros(num_segments + 1, jnp.int32).at[positions].add(
        jnp.ones_like(positions, jnp.int32), mode="drop")
    return counts32[:num_segments].astype(jnp.int64)


def gather_rows(arrays: Sequence[jax.Array], idx: jax.Array,
                n_src: Optional[int] = None) -> List[jax.Array]:
    """out_k[j] = arrays_k[idx[j]] for every payload array, tolerant of
    duplicate indices and 64-bit dtypes.

    TPU-linear implementation: merge-sort sources with requests, segmented
    forward-fill of payloads via associative scan, then restore request
    order. Out-of-range idx produce the source row 0 values (callers mask
    them)."""
    n_src = arrays[0].shape[0] if n_src is None else n_src
    n_req = idx.shape[0]
    idx32 = jnp.clip(idx, 0, n_src - 1).astype(jnp.int32)
    # SMALL request sets index directly: k dynamic-slices compile and
    # run fine for tiny k — the quadratic-gather pathology (and the
    # merge-sort workaround's TWO full sorts) only pays off when the
    # request count is large. Group-by key finalization gathers
    # B=n_slots (often ~12) representatives out of millions of rows;
    # riding the merge path there put two 6M-row sorts into every
    # aggregate program (round-4: the Q1 SF1 program the degraded
    # remote compiler wedged on).
    if not use_sort_paths() or n_req <= _SMALL_GATHER_REQ:
        return [a[idx32] for a in arrays]

    import os
    if os.environ.get("ARROW_TPU_GATHER_IMPL") == "hinted":
        # index-sort + per-column HINTED gathers + unsort: a smaller,
        # scan-free program (two n_req sorts + monotone takes) for
        # shapes where the merge form's HLO wedges the remote compiler;
        # runtime is slower per column (hinted take ~69 ms/4M measured)
        # but it COMPILES. Same values/clip semantics.
        jpos = jnp.arange(n_req, dtype=jnp.int32)
        sidx, jorder = sort_with_payload([idx32], [idx32, jpos])
        outs = [jnp.take(a, sidx, axis=0, indices_are_sorted=True,
                         mode="clip") for a in arrays]
        return sort_with_payload([jorder], outs)

    keys = jnp.concatenate([jnp.arange(n_src, dtype=jnp.int32), idx32])
    pref = jnp.concatenate([jnp.zeros(n_src, jnp.uint8),
                            jnp.ones(n_req, jnp.uint8)])
    is_src = jnp.concatenate([jnp.ones(n_src, jnp.bool_),
                              jnp.zeros(n_req, jnp.bool_)])
    jpos = jnp.concatenate([jnp.zeros(n_src, jnp.int32),
                            jnp.arange(n_req, dtype=jnp.int32)])
    payloads = []
    for a in arrays:
        pad = jnp.zeros((n_req,) + a.shape[1:], a.dtype)
        payloads.append(jnp.concatenate([a, pad]))

    outs = sort_with_payload([keys, pref],
                             payloads + [is_src, jpos, pref])
    svals = outs[:len(arrays)]
    s_is_src = outs[len(arrays)]
    s_jpos = outs[len(arrays) + 1]
    s_pref = outs[len(arrays) + 2]

    # segmented forward-fill: each request row takes the value of the most
    # recent source row (each key group begins with its source)
    def ff(vals):
        def combine(a, b):
            fa, va = a
            fb, vb = b
            return (jnp.logical_or(fa, fb),
                    jnp.where(fb, vb, va))
        _, filled = jax.lax.associative_scan(
            combine, (s_is_src, vals), axis=0)
        return filled

    filled = [ff(v) for v in svals]
    # restore request order: keep request rows, sort by original j
    req = s_pref == 1
    compacted, _ = compact_by_mask(req, filled + [s_jpos])
    j_order = compacted[-1][:n_req]
    vals_req = [c[:n_req] for c in compacted[:-1]]
    final = sort_with_payload([j_order], vals_req)
    return final


def spread_rows(dest: jax.Array, live: jax.Array,
                arrays: Sequence[jax.Array],
                dest_size: int) -> Tuple[List[jax.Array], jax.Array]:
    """out_k[dest[i]] = arrays_k[i] for live i; untouched slots hold zeros.
    Returns (outs, slot_live). Unique destinations assumed.

    TPU path: merge rows with identity slots and sort by (slot, pref) —
    linear for any payload dtype. CPU path: direct scatters."""
    n = dest.shape[0]
    dest32 = jnp.where(live, dest.astype(jnp.int32), dest_size)
    if not use_sort_paths():
        outs = [jnp.zeros((dest_size,) + a.shape[1:], a.dtype)
                .at[dest32].set(a, mode="drop") for a in arrays]
        slot_live = jnp.zeros(dest_size, jnp.bool_).at[dest32].set(
            live, mode="drop")
        return outs, slot_live
    keys = jnp.concatenate([dest32,
                            jnp.arange(dest_size, dtype=jnp.int32)])
    pref = jnp.concatenate([jnp.zeros(n, jnp.uint8),
                            jnp.ones(dest_size, jnp.uint8)])
    live_all = jnp.concatenate([live, jnp.zeros(dest_size, jnp.bool_)])
    payloads = []
    for a in arrays:
        ident = jnp.zeros((dest_size,) + a.shape[1:], a.dtype)
        payloads.append(jnp.concatenate([a, ident]))
    outs = sort_with_payload([keys, pref],
                             payloads + [live_all, keys])
    s_live, s_keys = outs[-2], outs[-1]
    idx = jnp.arange(n + dest_size, dtype=jnp.int32)
    is_first = jnp.logical_or(idx == 0, s_keys != jnp.roll(s_keys, 1))
    take = jnp.logical_and(is_first, s_keys < dest_size)
    compacted, _ = compact_by_mask(take, outs[:-1])
    return ([c[:dest_size] for c in compacted[:-1]],
            compacted[-1][:dest_size])
