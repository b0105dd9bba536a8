"""Pallas grouped-aggregate kernels for SMALL group counts.

Reference analogue: the grouped aggregate consume loop scatter-adds into
per-group state (kernels/hash_aggregate_numeric.cc, SURVEY §3.4). The
engine's XLA small-group path is a broadcast masked reduce
(compute/move.py _segment_reduce_loop) which streams the value column
once per plan stage but materializes a (rows, n_groups) intermediate;
the round-1 roofline probe measured a Pallas 8-slot grouped sum with
VMEM accumulators at 2.4x its bandwidth (docs/BENCHMARKS.md).

TPU twist: the engine runs with jax_enable_x64, and TPUs have no f64
hardware — XLA emulates every f64 op in software. These kernels instead
stream the RAW BITS of the f64 column (bitcast to u32 pairs), decode
each value to an exact float-float (hi, lo) f32 pair with integer ops,
and accumulate in compensated double-single arithmetic on the VPU —
~2^-48 relative error (vs 2^-52 for true f64) at f32 throughput.

Scope: per-group SUM for f32/f64 value columns, num_groups <= 128.
Dead rows must carry the identity (0) — the same contract
_segment_reduce_loop already imposes on callers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_GROUPS = 128
_LANES = 128
_BLOCK_ROWS = 256  # rows of 128 lanes per grid step (128 KB f32 / block)


def _supported_platform() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


@functools.lru_cache(maxsize=None)
def pallas_available() -> bool:
    """True when the Pallas TPU lowering path is usable."""
    if not _supported_platform():
        return False
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
        return True
    except Exception:  # pragma: no cover
        return False


# --- float-float helpers (traced inside the kernel) -------------------------

def _two_sum(a, b):
    """Knuth branch-free exact addition: a + b = s + err."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _ff_add(ah, al, bh, bl):
    """(ah+al) + (bh+bl) in double-single arithmetic. Non-finite sums
    collapse to (s, 0) so Inf/NaN propagate IEEE-style instead of
    turning into NaN via the inf - inf in TwoSum's error term."""
    s, e = _two_sum(ah, bh)
    e = e + (al + bl)
    hi = s + e
    lo = e - (hi - s)
    fin = jnp.isfinite(s)
    hi = jnp.where(fin, hi, s)
    lo = jnp.where(fin, lo, jnp.zeros_like(lo))
    return hi, lo


def _decode_f64_ff(lo32, hi32):
    """IEEE-754 binary64 words -> exact-ish float-float (hi, lo) f32 pair.

    hi carries the top 23 mantissa bits at the value's exponent; lo the
    next 29 bits scaled by 2^(e-1075) (truncated to f32's 24 — relative
    error <= 2^-47). Values with |x| < 2^-126 flush to 0; Inf/NaN map to
    f32 Inf/NaN.
    """
    u32 = jnp.uint32
    e = (hi32 >> 20) & jnp.uint32(0x7FF)
    sign = hi32 & jnp.uint32(0x80000000)
    m23 = ((hi32 & jnp.uint32(0xFFFFF)) << 3) | (lo32 >> 29)
    normal = jnp.logical_and(e > 896, e < jnp.uint32(0x7FF))
    hi_bits = sign | (((e - 896) & jnp.uint32(0xFF)) << 23) | m23
    hi = jax.lax.bitcast_convert_type(hi_bits, jnp.float32)
    # low part: r * 2^(e-1075), r = low 29 mantissa bits
    r = (lo32 & jnp.uint32(0x1FFFFFFF)).astype(jnp.float32)
    sc_ok = e > 948  # else 2^(e-1075) underflows f32; contribution < 2^-97
    sc_bits = ((jnp.where(sc_ok, e, jnp.uint32(1000)) - 948)
               & jnp.uint32(0xFF)) << 23
    sc = jax.lax.bitcast_convert_type(sc_bits.astype(u32), jnp.float32)
    lo = r * sc
    lo = jnp.where(sign != 0, -lo, lo)
    lo = jnp.where(jnp.logical_and(normal, sc_ok), lo,
                   jnp.zeros_like(lo))
    special = e == jnp.uint32(0x7FF)  # Inf / NaN
    mant_any = (m23 != 0) | ((lo32 & jnp.uint32(0x1FFFFFFF)) != 0)
    spec_bits = sign | jnp.uint32(0x7F800000) | \
        jnp.where(mant_any, jnp.uint32(0x400000), jnp.uint32(0))
    spec = jax.lax.bitcast_convert_type(spec_bits, jnp.float32)
    hi = jnp.where(normal, hi, jnp.where(special, spec,
                                         jnp.zeros_like(hi)))
    return hi, lo


def _df_tree_reduce(h, l):
    """Reduce (R, 128) float-float arrays to one (hi, lo) scalar pair by
    halving folds (log-depth, so error stays ~2^-48 * log n)."""
    rows = h.shape[0]
    while rows > 1:
        half = rows // 2
        h, l = _ff_add(h[:half], l[:half], h[half:rows], l[half:rows])
        rows = half
    # lanes: (1, 128) -> scalar
    lanes = h.shape[1]
    while lanes > 1:
        half = lanes // 2
        h, l = _ff_add(h[:, :half], l[:, :half],
                       h[:, half:lanes], l[:, half:lanes])
        lanes = half
    return h[0, 0], l[0, 0]


def _f32_tree_reduce(v):
    """Plain f32 log-depth reduction of (R, 128) to a scalar (better
    error than a naive sequential sum; used for the f32 kernel)."""
    rows = v.shape[0]
    while rows > 1:
        half = rows // 2
        v = v[:half] + v[half:rows]
        rows = half
    lanes = v.shape[1]
    while lanes > 1:
        half = lanes // 2
        v = v[:, :half] + v[:, half:lanes]
        lanes = half
    return v[0, 0]


# --- kernels -----------------------------------------------------------------

def _kernel_f64(u_ref, g_ref, out_ref, acc_ref):
    """u_ref: (BLOCK_ROWS, 256) u32 — interleaved (lo, hi) words of 128
    f64 lane values per row; g_ref: (BLOCK_ROWS, 128) i32 group ids;
    acc_ref: (2, 128) f32 VMEM accumulator (row 0 hi, row 1 lo)."""
    import jax.experimental.pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    u = u_ref[:, :]
    lo32 = u[:, 0::2]
    hi32 = u[:, 1::2]
    vh, vl = _decode_f64_ff(lo32, hi32)
    g = g_ref[:, :]
    G = out_ref.shape[1]
    for s in range(G):
        m = g == s
        bh, bl = _df_tree_reduce(jnp.where(m, vh, 0.0),
                                 jnp.where(m, vl, 0.0))
        ah = acc_ref[0, s]
        al = acc_ref[1, s]
        nh, nl = _ff_add(ah, al, bh, bl)
        acc_ref[0, s] = nh
        acc_ref[1, s] = nl

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:, :] = acc_ref[:, :]


def _kernel_f32(v_ref, g_ref, out_ref, acc_ref):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    v = v_ref[:, :]
    g = g_ref[:, :]
    G = out_ref.shape[1]
    for s in range(G):
        b = _f32_tree_reduce(jnp.where(g == s, v, 0.0))
        ah = acc_ref[0, s]
        al = acc_ref[1, s]
        nh, nl = _ff_add(ah, al, b, jnp.float32(0.0))
        acc_ref[0, s] = nh
        acc_ref[1, s] = nl

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:, :] = acc_ref[:, :]


def _pad_to(x, n, fill):
    if x.shape[0] == n:
        return x
    return jnp.concatenate(
        [x, jnp.full((n - x.shape[0],) + x.shape[1:], fill, x.dtype)])


def grouped_sum_pallas(values: jax.Array, gids: jax.Array,
                       num_segments: int,
                       interpret: bool = False,
                       block_rows: int = _BLOCK_ROWS) -> jax.Array:
    """Per-group sum for f64/f32 values with int32 gids in
    [0, num_segments); dead rows must carry value 0 (any gid). Returns
    (num_segments,) in the value dtype (f64 accumulated as float-float).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if num_segments > MAX_GROUPS:
        raise ValueError(f"num_segments {num_segments} > {MAX_GROUPS}")
    n = values.shape[0]
    per_block = block_rows * _LANES
    nb = max(1, -(-n // per_block))
    n_pad = nb * per_block
    g = _pad_to(gids.astype(jnp.int32), n_pad, jnp.int32(0))
    g2 = g.reshape(nb * block_rows, _LANES)
    gspec = pl.BlockSpec((block_rows, _LANES),
                         lambda i: (i, 0))
    out_shape = jax.ShapeDtypeStruct((2, MAX_GROUPS), jnp.float32)
    scratch = [pltpu.VMEM((2, MAX_GROUPS), jnp.float32)]

    if values.dtype == jnp.float64:
        v = _pad_to(values, n_pad, jnp.float64(0.0))
        u = jax.lax.bitcast_convert_type(v, jnp.uint32)  # (n_pad, 2)
        u2 = u.reshape(nb * block_rows, 2 * _LANES)
        vspec = pl.BlockSpec((block_rows, 2 * _LANES),
                             lambda i: (i, 0))
        out = pl.pallas_call(
            _kernel_f64,
            grid=(nb,),
            in_specs=[vspec, gspec],
            out_specs=pl.BlockSpec((2, MAX_GROUPS), lambda i: (0, 0)),
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(u2, g2)
        total = (out[0].astype(jnp.float64)
                 + out[1].astype(jnp.float64))
        return total[:num_segments]

    if values.dtype == jnp.float32:
        v = _pad_to(values, n_pad, jnp.float32(0.0))
        v2 = v.reshape(nb * block_rows, _LANES)
        vspec = pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0))
        out = pl.pallas_call(
            _kernel_f32,
            grid=(nb,),
            in_specs=[vspec, gspec],
            out_specs=pl.BlockSpec((2, MAX_GROUPS), lambda i: (0, 0)),
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(v2, g2)
        total = (out[0].astype(jnp.float64)
                 + out[1].astype(jnp.float64))
        return total[:num_segments].astype(jnp.float32)

    raise ValueError(f"unsupported dtype {values.dtype}")
