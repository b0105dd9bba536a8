"""Pallas movement kernels: stable stream compaction + grouped sum.

Reference analogues: vector_selection (filter at memory rate,
kernels/vector_selection_benchmark.cc:696) and the grouped aggregate
consume loop (kernels/hash_aggregate_numeric.cc). The engine's XLA
lowering for both rides multi-operand stable sorts (compute/move.py) —
linear but far below the HBM roofline (round-4 chip: filter compact
9.25 GB/s, grouped sum ~1.9 GB/s vs a 42.4 GB/s streaming copy). These
kernels stream each block HBM->VMEM once and do the data-dependent
movement on-chip.

## Compaction (`compact_planes_pallas`)

Stable filter of K 32-bit planes by a keep mask, in two passes:

  A (XLA): per-block keep counts -> exclusive base offsets (tiny).
  B (Pallas, sequential grid): each block compacts its (BR, 128) tile
    in VMEM with a 15-stage butterfly PULL network, then writes the
    full tile window at its dynamic base; the next block's window
    starts base+cnt, overwriting the junk tail (the grid is sequential
    on a TPU core, so later writes land later).

The pull network: each element's remaining left-shift r = number of
dropped elements before it (monotone non-decreasing). Stage k moves
every element whose shift-bit k is set left by 2^k simultaneously:
slot j pulls from j+2^k iff that element's bit k is set. Monotonicity
makes this conflict-free: a stationary element can only be clobbered
by a later-positioned element with a SMALLER destination, which cannot
exist when destinations preserve order (kept) or never move (dropped,
r=0). 64-bit dtypes ride as two u32 planes; f64 as mantissa/exponent
planes (the tunneled compiler rejects f64 bitcasts — move.py's
frexp machinery).

## Grouped sum (`grouped_sum_pallas`)

VMEM accumulator of (2*num_segments, 128) f32 float-float pairs
(compensated double-single arithmetic, ~2^-48 relative error for f64 —
experimental/pallas_agg.py's scheme), with a fori_loop over slots so
the Mosaic program stays small at any S <= 1024: per block each slot
does one masked lane-reduce of the resident tile (VPU-bound at
~6*S ops/element; S=512 on a ~4 Top/s VPU is ~3 ms per 4M rows
against a 13 ms sort).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_LANES = 128
_BLOCK_ROWS = 256          # 32Ki elements / 128 KB f32 per grid step
MAX_SEGMENTS = 1024


def _cdiv(a, b):
    return -(-a // b)


# --- compaction -------------------------------------------------------------

def _linear_roll_left(x, s, block_rows):
    """Shift the row-major flattened (block_rows, 128) tile left by s,
    zero-filling the tail."""
    from jax.experimental.pallas import tpu as pltpu
    w = block_rows * _LANES
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    flat = row * _LANES + lane

    def roll_l(v, amt, axis, size):
        # jnp.roll (concatenate-of-slices) — this backend's tpu.roll op
        # fails verification, the concatenate form lowers fine
        amt = amt % size
        if amt == 0:
            return v
        return jnp.roll(v, -amt, axis=axis)

    if s % _LANES == 0:
        out = roll_l(x, s // _LANES, 0, block_rows)
    else:
        a = roll_l(x, s % _LANES, 1, _LANES)
        b = roll_l(a, s // _LANES, 0, block_rows)
        c = roll_l(a, s // _LANES + 1, 0, block_rows)
        out = jnp.where(lane < _LANES - (s % _LANES), b, c)
    return jnp.where(flat < w - s, out, jnp.zeros_like(out))


def _compact_kernel(n_planes, block_rows, keep_ref, *rest):
    """rest = plane_refs..., out_refs... — ONE tile, gridless: the
    butterfly compacts the (block_rows, 128) tile in VMEM and writes
    the compacted tile (junk tail) to the same-shaped outputs; the
    caller stitches tiles at their base offsets in XLA."""
    w = block_rows * _LANES
    plane_refs = rest[:n_planes]
    out_refs = rest[n_planes:2 * n_planes]

    keep = keep_ref[:, :] != 0
    # exclusive prefix (row-major flat order) of DROPPED flags =
    # each element's total left shift
    # x64 mode makes weak python-int literals int64, and Mosaic's
    # 64-bit convert support recurses in _convert_helper — pin every
    # in-kernel integer to int32 explicitly
    drop = jnp.where(keep, jnp.int32(0), jnp.int32(1))

    def _inclusive_scan(x, axis, size):
        # Mosaic has no cumsum primitive (and this backend's pad
        # lowering recurses): log-depth shifted adds (Hillis-Steele)
        # with zero-filled shifts built from concatenate+slice
        step = 1
        while step < size:
            if axis == 1:
                z = jnp.zeros((x.shape[0], step), x.dtype)
                x = x + jnp.concatenate([z, x[:, :-step]], axis=1)
            else:
                z = jnp.zeros((step, x.shape[1]), x.dtype)
                x = x + jnp.concatenate([z, x[:-step, :]], axis=0)
            step *= 2
        return x

    lane_ps = _inclusive_scan(drop, 1, _LANES)
    # row carry stays FULL-WIDTH: narrow (R,1) scans crash this
    # backend's compiler (bisected); the broadcast costs nothing on a
    # 128-lane VPU
    row_tot = jnp.zeros_like(drop) + lane_ps[:, _LANES - 1:_LANES]
    row_carry = _inclusive_scan(row_tot, 0, block_rows) - row_tot
    shift = lane_ps - drop + row_carry
    # dropped elements never move (and never pull)
    r = jnp.where(keep, shift, jnp.int32(0))
    # mark dropped slots dead so survivors are exactly the kept prefix
    planes = [p_ref[:, :] for p_ref in plane_refs]

    n_stages = max(1, (w - 1).bit_length())
    for k in range(n_stages):
        rr = _linear_roll_left(r, 1 << k, block_rows)
        take = ((rr >> jnp.int32(k)) & jnp.int32(1)) == jnp.int32(1)
        new_planes = []
        for p in planes:
            rp = _linear_roll_left(p, 1 << k, block_rows)
            new_planes.append(jnp.where(take, rp, p))
        planes = new_planes
        r = jnp.where(take, rr - jnp.int32(1 << k), r)

    for out_ref, vals in zip(out_refs, planes):
        out_ref[:, :] = vals


def compact_planes_pallas(keep: jax.Array,
                          planes: Sequence[jax.Array],
                          block_rows: int = _BLOCK_ROWS,
                          interpret: bool = False) -> List[jax.Array]:
    """Stable compaction: move elements where keep is True to the
    front, preserving order. planes are 1-D 32-bit arrays of equal
    length; returns compacted planes of the SAME length (tail beyond
    the kept count is junk — callers carry the count separately, as
    compute/move.compact_by_mask already does).

    Gridless-per-tile design: this backend's remote Mosaic compiler
    crashes on ANY gridded pallas_call (bisected 2026-08-22:
    adv_in_adv_out minimal repro), so each tile runs its own gridless
    kernel call (ONE compile — identical shapes) compacting in VMEM,
    and XLA stitches tiles with a chain of dynamic_update_slices at the
    per-tile exclusive bases (later tiles overwrite earlier junk tails,
    exactly the old sequential-grid DMA semantics)."""
    import jax.experimental.pallas as pl

    n = keep.shape[0]
    per_block = block_rows * _LANES
    nb = max(1, _cdiv(n, per_block))
    n_pad = nb * per_block
    for p in planes:
        if p.dtype.itemsize != 4:
            raise ValueError(f"32-bit planes only, got {p.dtype}")

    keep_i = jnp.pad(keep.astype(jnp.int32), (0, n_pad - n))
    k2 = keep_i.reshape(nb * block_rows, _LANES)
    # per-tile exclusive bases (XLA)
    blk_counts = jnp.sum(keep_i.reshape(nb, per_block), axis=1,
                         dtype=jnp.int32)
    bases = (jnp.cumsum(blk_counts) - blk_counts).astype(jnp.int32)

    padded = [jnp.pad(p, (0, n_pad - n)) for p in planes]
    tiled = [p.reshape(nb * block_rows, _LANES) for p in padded]

    kern = functools.partial(_compact_kernel, len(planes), block_rows)
    call = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((block_rows, _LANES), p.dtype)
                   for p in planes],
        interpret=interpret,
    )
    tile_outs: List[List[jax.Array]] = []
    for b in range(nb):
        sl = slice(b * block_rows, (b + 1) * block_rows)
        res = call(k2[sl], *[t[sl] for t in tiled])
        tile_outs.append(res if isinstance(res, (list, tuple))
                         else [res])
    outs = []
    for pi, p in enumerate(planes):
        acc = jnp.zeros(n_pad + per_block, p.dtype)
        for b in range(nb):
            flat = tile_outs[b][pi].reshape(per_block)
            acc = jax.lax.dynamic_update_slice(acc, flat, (bases[b],))
        outs.append(acc[:n])
    return outs


# --- any-dtype column wrapper ----------------------------------------------

def _f64_bitcast_ok() -> bool:
    """Whether 64-bit bitcast_convert is usable (the tunneled TPU
    compiler rejects it; CPU and direct TPU accept)."""
    from .move import f64_planes_mode
    return f64_planes_mode() == "bitcast"


def _scale_by_exp2(x, e):
    """x * 2**e EXACTLY for int32 exponents |e| <= 2047: binary
    exponentiation over exact power-of-two f64 constants (the chip's
    exp2 is an approximation even at integer arguments — measured
    off-by-one-ulp mantissas). Each multiply by a power of two is
    exact; the factor order (small to large) keeps intermediates
    monotone toward the final value, so nothing over/underflows that
    the final value wouldn't."""
    neg = e < 0
    k = jnp.abs(e)
    for bit in range(10):            # factors 2^1 .. 2^512
        f = jnp.float64(2.0 ** (1 << bit))
        finv = jnp.float64(2.0 ** -(1 << bit))
        hit = ((k >> bit) & 1) == 1
        x = jnp.where(hit, x * jnp.where(neg, finv, f), x)
    hit = ((k >> 10) & 1) == 1       # bit 10 (1024) = 2^512 twice
    h = jnp.float64(2.0 ** 512)
    hinv = jnp.float64(2.0 ** -512)
    x = jnp.where(hit, x * jnp.where(neg, hinv, h)
                  * jnp.where(neg, hinv, h), x)
    return x


def _frexp_arith(x):
    """jnp.frexp replacement with NO 64-bit bitcasts (jnp.frexp lowers
    through an s64 bitcast-convert the tunneled compiler's X64 rewriter
    rejects): exponent from floor(log2)+correction, mantissa by exact
    power-of-two scaling. x must be finite; zeros pass through as
    (0, 0)."""
    ax = jnp.abs(x)
    pos = ax > 0.0
    safe = jnp.where(pos, ax, 1.0)
    e = (jnp.floor(jnp.log2(safe)) + 1.0).astype(jnp.int32)
    m = _scale_by_exp2(safe, -e)
    for _ in range(2):      # log2 rounding can be off by one
        big = m >= 1.0
        m = jnp.where(big, m * 0.5, m)
        e = jnp.where(big, e + 1, e)
        small = jnp.logical_and(m < 0.5, pos)
        m = jnp.where(small, m * 2.0, m)
        e = jnp.where(small, e - 1, e)
    m = jnp.where(pos, m, 0.0)
    e = jnp.where(pos, e, 0)
    return jnp.where(x < 0, -m, m), e


def _ldexp_arith(m, e):
    """jnp.ldexp replacement without 64-bit bitcasts (exact scaling)."""
    return _scale_by_exp2(m, e.astype(jnp.int32))


def _to_planes(a: jax.Array):
    """Decompose a 1-D array into 32-bit planes + a reassembly spec."""
    dt = a.dtype
    if dt.itemsize == 4:
        return [a], ("same", dt)
    if dt == jnp.bool_:
        return [a.astype(jnp.uint32)], ("bool", dt)
    if jnp.issubdtype(dt, jnp.integer) and dt.itemsize == 8:
        signed = jnp.issubdtype(dt, jnp.signedinteger)
        v = a.astype(jnp.int64) if signed else a.astype(jnp.uint64)
        lo = (v & v.dtype.type(0xFFFFFFFF)).astype(jnp.uint32)
        hi = (v >> v.dtype.type(32)).astype(
            jnp.int32 if signed else jnp.uint32)
        return [lo, hi], ("int64", dt)
    if dt == jnp.float64:
        if _f64_bitcast_ok():
            planes = jax.lax.bitcast_convert_type(a, jnp.uint32)
            return [planes[:, 0], planes[:, 1]], ("f64bits", dt)
        # arithmetic mantissa/exponent split (exact except subnormals;
        # specials carried in a class plane — move._scatter_f64_frexp's
        # scheme)
        finite = jnp.isfinite(a)
        m, e = _frexp_arith(jnp.where(finite, a, 0.0))
        mi = (m * jnp.float64(2.0 ** 53)).astype(jnp.int64)
        # jnp.signbit on f64 lowers through an s64 bitcast this
        # backend rejects; -0.0 detects via 1/x == -inf instead
        is_negzero = jnp.logical_and(
            a == 0.0,
            jnp.float64(1.0) / jnp.where(a == 0.0, a, 1.0) < 0.0)
        cls = jnp.where(jnp.isnan(a), 3,
                        jnp.where(a == jnp.inf, 1,
                                  jnp.where(a == -jnp.inf, 2,
                                            jnp.where(is_negzero, 4, 0))))
        packed = ((e.astype(jnp.int32) + 16384) |
                  (cls.astype(jnp.int32) << 18))
        lo = (mi & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
        hi = (mi >> jnp.int64(32)).astype(jnp.int32)
        return [lo, hi, packed], ("f64frexp", dt)
    if dt == jnp.float16:
        return [a.astype(jnp.float32)], ("f16", dt)
    raise ValueError(f"unsupported dtype {dt}")


def _from_planes(planes: List[jax.Array], spec) -> jax.Array:
    kind, dt = spec
    if kind == "same":
        return planes[0]
    if kind == "bool":
        return planes[0].astype(jnp.bool_)
    if kind == "f16":
        return planes[0].astype(dt)
    if kind == "int64":
        lo, hi = planes
        signed = jnp.issubdtype(dt, jnp.signedinteger)
        wide_t = jnp.int64 if signed else jnp.uint64
        wide = (hi.astype(wide_t) << wide_t(32)) | lo.astype(wide_t)
        return wide.astype(dt)
    if kind == "f64bits":
        lo, hi = planes
        both = jnp.stack([lo, hi], axis=-1)
        return jax.lax.bitcast_convert_type(both, jnp.float64)
    if kind == "f64frexp":
        lo, hi, packed = planes
        mi = (hi.astype(jnp.int64) << jnp.int64(32)) | \
            lo.astype(jnp.uint32).astype(jnp.int64)
        e = (packed & 0x3FFFF) - 16384
        cls = packed >> 18
        m2 = mi.astype(jnp.float64) * jnp.float64(2.0 ** -53)
        v = _ldexp_arith(m2, e)
        v = jnp.where(cls == 1, jnp.inf, v)
        v = jnp.where(cls == 2, -jnp.inf, v)
        v = jnp.where(cls == 3, jnp.nan, v)
        v = jnp.where(cls == 4, jnp.float64(-0.0), v)
        return v
    raise ValueError(kind)


def compact_arrays_pallas(keep: jax.Array,
                          arrays: Sequence[jax.Array],
                          block_rows: int = _BLOCK_ROWS,
                          interpret: bool = False) -> List[jax.Array]:
    """compact_by_mask semantics for any-dtype 1-D arrays via the plane
    kernel: one Pallas invocation carries every column's 32-bit planes
    through the shared butterfly (vs one multi-operand sort per 5
    payloads on the XLA path)."""
    all_planes: List[jax.Array] = []
    specs = []
    for a in arrays:
        planes, spec = _to_planes(a)
        specs.append((spec, len(planes)))
        all_planes.extend(planes)
    outs = compact_planes_pallas(keep, all_planes,
                                 block_rows=block_rows,
                                 interpret=interpret)
    res: List[jax.Array] = []
    i = 0
    for spec, k in specs:
        res.append(_from_planes(outs[i:i + k], spec))
        i += k
    return res


# --- grouped sum ------------------------------------------------------------

def _gsum_kernel(num_segments, acc_rows, vh_ref, vl_ref, g_ref,
                 out_ref):
    """float-float grouped sum of ONE tile, gridless (see
    compact_planes_pallas on why no grid), fori_loop over slots so
    program size stays O(1) in num_segments."""
    import jax.experimental.pallas as pl
    from ..experimental.pallas_agg import _df_row_reduce

    vh = vh_ref[:, :]
    vl = vl_ref[:, :]
    g = g_ref[:, :]
    out_ref[:, :] = jnp.zeros((acc_rows, _LANES), jnp.float32)

    def body(s, c):
        m = g == s
        # compensated log-depth block reduce (plain f32 sums of the hi
        # plane alone round to ~2^-24*rows; the ff fold keeps ~2^-48)
        bh, bl = _df_row_reduce(jnp.where(m, vh, 0.0),
                                jnp.where(m, vl, 0.0))
        out_ref[pl.ds(2 * s, 1), :] = bh
        out_ref[pl.ds(2 * s + 1, 1), :] = bl
        return c

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(num_segments), body,
                      jnp.int32(0))


def grouped_sum_pallas(values: jax.Array, gids: jax.Array,
                       num_segments: int,
                       block_rows: int = _BLOCK_ROWS,
                       interpret: bool = False) -> jax.Array:
    """Per-group sum for f64/f32 values, int32 gids in
    [0, num_segments); dead rows must carry value 0. num_segments <=
    MAX_SEGMENTS. Returns (num_segments,) in the value dtype.

    One gridless kernel call per tile (single compile — identical
    shapes); per-tile (2S, 128) float-float partials combine in f64 on
    the XLA side, preserving the ~2^-48 error bound."""
    import jax.experimental.pallas as pl
    from ..experimental.pallas_agg import split_f64_ff

    if num_segments > MAX_SEGMENTS:
        raise ValueError(f"num_segments {num_segments} > {MAX_SEGMENTS}")
    n = values.shape[0]
    per_block = block_rows * _LANES
    nb = max(1, _cdiv(n, per_block))
    n_pad = nb * per_block

    g = jnp.pad(gids.astype(jnp.int32), (0, n_pad - n),
                constant_values=0)
    g2 = g.reshape(nb * block_rows, _LANES)
    out_dtype = values.dtype
    v = jnp.pad(values, (0, n_pad - n))
    if values.dtype == jnp.float64:
        vh, vl = split_f64_ff(v)
    elif values.dtype == jnp.float32:
        vh, vl = v, jnp.zeros_like(v)
    else:
        raise ValueError(f"unsupported dtype {values.dtype}")
    vh2 = vh.reshape(nb * block_rows, _LANES)
    vl2 = vl.reshape(nb * block_rows, _LANES)

    acc_rows = max(8, _cdiv(2 * num_segments, 8) * 8)
    call = pl.pallas_call(
        functools.partial(_gsum_kernel, num_segments, acc_rows),
        out_shape=jax.ShapeDtypeStruct((acc_rows, _LANES), jnp.float32),
        interpret=interpret,
    )
    total = jnp.zeros(num_segments, jnp.float64)
    for b in range(nb):
        sl = slice(b * block_rows, (b + 1) * block_rows)
        out = call(vh2[sl], vl2[sl], g2[sl])
        hi = out[0:2 * num_segments:2].astype(jnp.float64)
        lo = out[1:2 * num_segments + 1:2].astype(jnp.float64)
        total = total + jnp.sum(hi + lo, axis=1)
    return total.astype(out_dtype)
