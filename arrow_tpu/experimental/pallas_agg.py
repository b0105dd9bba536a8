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
split each f64 value into an exact float-float (hi, lo) f32 pair with
two arithmetic ops OUTSIDE the kernel (hi = f32(v); lo = f32(v - hi),
the classic double -> double-single split; the subtraction is exact by
Sterbenz), then accumulate the pairs in compensated double-single
arithmetic on the VPU — ~2^-48 relative error (vs 2^-52 for true f64)
at f32 throughput. No bitcasts: the tunneled XLA x64-rewrite pass
rejects every f64 bitcast-convert (measured round 2), and strided
in-kernel slices lower to an unsupported Mosaic gather, so the split
must be arithmetic and the kernel inputs must be plain f32 planes.

Limitation: finite f64 values with |x| >= 2^128 overflow the hi part
to f32 inf (the sum becomes inf). The previous bit-decoding design had
the same ceiling.

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
    """True when the Pallas TPU lowering path is usable.

    Import alone is not enough: on the tunneled axon platform the remote
    Mosaic compiler rejects some kernels and can HANG the compile RPC
    indefinitely, wedging the shared device (round-2 verdict weak #1 —
    an in-process probe here froze every benchmark attempt). The probe
    therefore lives in arrow_tpu.platform_check: it runs in a child
    process under a hard deadline, caches its result on disk, and is
    skipped entirely (-> False) on the tunneled platform."""
    if not _supported_platform():
        return False
    from ..platform_check import pallas_allowed
    return pallas_allowed()


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


def split_f64_ff(v: jax.Array):
    """f64 array -> exact float-float (hi, lo) f32 planes, arithmetic
    only (the tunneled compiler rejects f64 bitcasts). hi is v rounded
    to f32; lo is the exact remainder rounded to f32 (error <= 2^-48
    relative). Inf/NaN propagate through hi with lo = 0."""
    hi = v.astype(jnp.float32)
    rest = v - hi.astype(jnp.float64)
    lo = jnp.where(jnp.isfinite(hi), rest,
                   jnp.zeros_like(rest)).astype(jnp.float32)
    return hi, lo


def _df_row_reduce(h, l):
    """Reduce (R, 128) float-float arrays to a (1, 128) per-lane pair by
    halving folds (log-depth, so error stays ~2^-48 * log n). The
    cross-lane combine happens OUTSIDE the kernel in f64 — Mosaic
    forbids scalar stores to VMEM, so everything in-kernel stays a
    full-lane vector."""
    rows = h.shape[0]
    while rows > 1:
        half = rows // 2
        h, l = _ff_add(h[:half], l[:half], h[half:rows], l[half:rows])
        rows = half
    return h, l


def _f32_row_reduce(v):
    """Plain f32 log-depth reduction of (R, 128) to (1, 128)."""
    rows = v.shape[0]
    while rows > 1:
        half = rows // 2
        v = v[:half] + v[half:rows]
        rows = half
    return v


# --- kernels -----------------------------------------------------------------

def _kernel_ff(n_slots, vh_ref, vl_ref, g_ref, out_ref, acc_ref):
    """vh/vl: (BLOCK_ROWS, 128) f32 float-float planes of the f64 value
    column; g_ref: (BLOCK_ROWS, 128) i32 group ids; acc_ref holds, per
    slot s, a per-lane accumulator pair in rows (2s, 2s+1). n_slots is
    static — the per-slot loop unrolls exactly num_segments times, not
    MAX_GROUPS. No scalar loads/stores (Mosaic forbids them in VMEM)."""
    import jax.experimental.pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    vh = vh_ref[:, :]
    vl = vl_ref[:, :]
    g = g_ref[:, :]
    for s in range(n_slots):
        m = g == s
        bh, bl = _df_row_reduce(jnp.where(m, vh, 0.0),
                                jnp.where(m, vl, 0.0))
        ah = acc_ref[2 * s:2 * s + 1, :]
        al = acc_ref[2 * s + 1:2 * s + 2, :]
        nh, nl = _ff_add(ah, al, bh, bl)
        acc_ref[2 * s:2 * s + 1, :] = nh
        acc_ref[2 * s + 1:2 * s + 2, :] = nl

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:, :] = acc_ref[:, :]


def _kernel_f32(n_slots, v_ref, g_ref, out_ref, acc_ref):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    v = v_ref[:, :]
    g = g_ref[:, :]
    for s in range(n_slots):
        b = _f32_row_reduce(jnp.where(g == s, v, 0.0))
        ah = acc_ref[2 * s:2 * s + 1, :]
        al = acc_ref[2 * s + 1:2 * s + 2, :]
        nh, nl = _ff_add(ah, al, b, jnp.zeros_like(b))
        acc_ref[2 * s:2 * s + 1, :] = nh
        acc_ref[2 * s + 1:2 * s + 2, :] = nl

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
    # accumulator rows (2s, 2s+1) hold slot s's per-lane (hi, lo) pair;
    # round rows up to the f32 min tile (8 sublanes).
    acc_rows = max(8, -(-2 * num_segments // 8) * 8)
    out_shape = jax.ShapeDtypeStruct((acc_rows, _LANES), jnp.float32)
    out_spec = pl.BlockSpec((acc_rows, _LANES), lambda i: (0, 0))
    scratch = [pltpu.VMEM((acc_rows, _LANES), jnp.float32)]
    vspec = pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0))

    def _combine(out, dtype):
        # out rows (2s, 2s+1) are slot s's per-lane (hi, lo) f32 pair;
        # each converts exactly to f64, so a 128-term f64 lane sum keeps
        # the compensated precision.
        hi = out[0:2 * num_segments:2].astype(jnp.float64)
        lo = out[1:2 * num_segments + 1:2].astype(jnp.float64)
        return jnp.sum(hi + lo, axis=1).astype(dtype)

    if values.dtype == jnp.float64:
        v = _pad_to(values, n_pad, jnp.float64(0.0))
        vh, vl = split_f64_ff(v)
        out = pl.pallas_call(
            functools.partial(_kernel_ff, num_segments),
            grid=(nb,),
            in_specs=[vspec, vspec, gspec],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(vh.reshape(nb * block_rows, _LANES),
          vl.reshape(nb * block_rows, _LANES), g2)
        return _combine(out, jnp.float64)

    if values.dtype == jnp.float32:
        v = _pad_to(values, n_pad, jnp.float32(0.0))
        v2 = v.reshape(nb * block_rows, _LANES)
        out = pl.pallas_call(
            functools.partial(_kernel_f32, num_segments),
            grid=(nb,),
            in_specs=[vspec, gspec],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(v2, g2)
        return _combine(out, jnp.float32)

    raise ValueError(f"unsupported dtype {values.dtype}")
