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
        # pltpu.roll wants non-negative shifts: left by amt == right by
        # size - amt
        amt = amt % size
        if amt == 0:
            return v
        return pltpu.roll(v, size - amt, axis=axis)

    if s % _LANES == 0:
        out = roll_l(x, s // _LANES, 0, block_rows)
    else:
        a = roll_l(x, s % _LANES, 1, _LANES)
        b = roll_l(a, s // _LANES, 0, block_rows)
        c = roll_l(a, s // _LANES + 1, 0, block_rows)
        out = jnp.where(lane < _LANES - (s % _LANES), b, c)
    return jnp.where(flat < w - s, out, jnp.zeros_like(out))


def _compact_kernel(n_planes, block_rows, bases_ref, keep_ref, *rest):
    """rest = plane_refs..., out_refs..., sem. Sequential grid over
    blocks; each block butterfly-compacts in VMEM, then DMAs its full
    tile window to the output at its base offset (next block's window
    overwrites the junk tail)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plane_refs = rest[:n_planes]
    out_refs = rest[n_planes:2 * n_planes]
    sems = rest[2 * n_planes]
    i = pl.program_id(0)
    w = block_rows * _LANES

    keep = keep_ref[:, :] != 0
    # exclusive prefix (row-major flat order) of DROPPED flags =
    # each element's total left shift
    drop = jnp.where(keep, 0, 1).astype(jnp.int32)
    lane_ps = jnp.cumsum(drop, axis=1)
    row_tot = lane_ps[:, _LANES - 1:_LANES]
    row_carry = jnp.cumsum(row_tot, axis=0) - row_tot
    shift = lane_ps - drop + row_carry
    # dropped elements never move (and never pull)
    r = jnp.where(keep, shift, 0).astype(jnp.int32)
    # mark dropped slots dead so survivors are exactly the kept prefix
    planes = [p_ref[:, :] for p_ref in plane_refs]

    n_stages = max(1, (w - 1).bit_length())
    for k in range(n_stages):
        rr = _linear_roll_left(r, 1 << k, block_rows)
        take = jnp.logical_and((rr >> k) & 1 == 1,
                               jnp.ones_like(rr, jnp.bool_))
        new_planes = []
        for p in planes:
            rp = _linear_roll_left(p, 1 << k, block_rows)
            new_planes.append(jnp.where(take, rp, p))
        planes = new_planes
        r = jnp.where(take, rr - (1 << k), r)

    base = bases_ref[i]
    for p_ref, out_ref, vals, sem in zip(
            plane_refs, out_refs, planes,
            [sems.at[j] for j in range(n_planes)]):
        def inner(scratch, vals=vals, out_ref=out_ref, sem=sem):
            scratch[:, :] = vals
            flat_dst = out_ref.at[pl.ds(base, w)]
            cp = pltpu.make_async_copy(
                scratch.at[:, :].reshape(w), flat_dst, sem)
            cp.start()
            cp.wait()
        pl.run_scoped(inner, scratch=pltpu.VMEM(
            (block_rows, _LANES), vals.dtype))


def compact_planes_pallas(keep: jax.Array,
                          planes: Sequence[jax.Array],
                          block_rows: int = _BLOCK_ROWS,
                          interpret: bool = False) -> List[jax.Array]:
    """Stable compaction: move elements where keep is True to the
    front, preserving order. planes are 1-D 32-bit arrays of equal
    length; returns compacted planes of the SAME length (tail beyond
    the kept count is junk — callers carry the count separately, as
    compute/move.compact_by_mask already does)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = keep.shape[0]
    per_block = block_rows * _LANES
    nb = max(1, _cdiv(n, per_block))
    n_pad = nb * per_block
    for p in planes:
        if p.dtype.itemsize != 4:
            raise ValueError(f"32-bit planes only, got {p.dtype}")

    keep_i = jnp.pad(keep.astype(jnp.int32), (0, n_pad - n))
    k2 = keep_i.reshape(nb * block_rows, _LANES)
    # pass A (XLA): per-block exclusive bases
    blk_counts = jnp.sum(keep_i.reshape(nb, per_block), axis=1,
                         dtype=jnp.int32)
    bases = (jnp.cumsum(blk_counts) - blk_counts).astype(jnp.int32)

    padded = [jnp.pad(p, (0, n_pad - n)) for p in planes]
    tiled = [p.reshape(nb * block_rows, _LANES) for p in padded]

    kern = functools.partial(_compact_kernel, len(planes), block_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec((block_rows, _LANES),
                               lambda i, b: (i, 0))]
        + [pl.BlockSpec((block_rows, _LANES), lambda i, b: (i, 0))
           for _ in planes],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)
                   for _ in planes],
        scratch_shapes=[pltpu.SemaphoreType.DMA((len(planes),))],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_pad + per_block,), p.dtype)
                   for p in planes],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(bases, k2, *tiled)
    return [o[:n] for o in outs]


# --- any-dtype column wrapper ----------------------------------------------

def _f64_bitcast_ok() -> bool:
    """Whether 64-bit bitcast_convert is usable (the tunneled TPU
    compiler rejects it; CPU and direct TPU accept)."""
    from .move import f64_planes_mode
    return f64_planes_mode() == "bitcast"


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
        m, e = jnp.frexp(jnp.where(finite, a, 0.0))
        mi = (m * jnp.float64(2.0 ** 53)).astype(jnp.int64)
        is_negzero = jnp.logical_and(a == 0.0, jnp.signbit(a))
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
        v = jnp.ldexp(m2, e)
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

def _gsum_kernel(num_segments, vh_ref, vl_ref, g_ref, out_ref, acc_ref):
    """float-float grouped sum, fori_loop over slots (program size is
    O(1) in num_segments, unlike the unrolled experimental kernel)."""
    import jax.experimental.pallas as pl
    from ..experimental.pallas_agg import _df_row_reduce, _ff_add

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    vh = vh_ref[:, :]
    vl = vl_ref[:, :]
    g = g_ref[:, :]

    def body(s, _):
        m = g == s
        # compensated log-depth block reduce (plain f32 sums of the hi
        # plane alone round to ~2^-24*rows; the ff fold keeps ~2^-48)
        bh, bl = _df_row_reduce(jnp.where(m, vh, 0.0),
                                jnp.where(m, vl, 0.0))
        ah = acc_ref[pl.ds(2 * s, 1), :]
        al = acc_ref[pl.ds(2 * s + 1, 1), :]
        nh, nl = _ff_add(ah, al, bh, bl)
        acc_ref[pl.ds(2 * s, 1), :] = nh
        acc_ref[pl.ds(2 * s + 1, 1), :] = nl
        return 0

    jax.lax.fori_loop(0, num_segments, body, 0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:, :] = acc_ref[:, :]


def grouped_sum_pallas(values: jax.Array, gids: jax.Array,
                       num_segments: int,
                       block_rows: int = _BLOCK_ROWS,
                       interpret: bool = False) -> jax.Array:
    """Per-group sum for f64/f32 values, int32 gids in
    [0, num_segments); dead rows must carry value 0. num_segments <=
    MAX_SEGMENTS. Returns (num_segments,) in the value dtype."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
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

    acc_rows = max(8, _cdiv(2 * num_segments, 8) * 8)
    spec = pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0))
    out = pl.pallas_call(
        functools.partial(_gsum_kernel, num_segments),
        grid=(nb,),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((acc_rows, _LANES), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((acc_rows, _LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((acc_rows, _LANES), jnp.float32)],
        interpret=interpret,
    )(vh.reshape(nb * block_rows, _LANES),
      vl.reshape(nb * block_rows, _LANES), g2)
    hi = out[0:2 * num_segments:2].astype(jnp.float64)
    lo = out[1:2 * num_segments + 1:2].astype(jnp.float64)
    return jnp.sum(hi + lo, axis=1).astype(out_dtype)
