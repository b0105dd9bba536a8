"""Vectorized 32-bit key hashing.

Reference analogue: compute/key_hash_internal.h (Hashing32): xxhash32
primes, avalanche finalizer (xorshift-multiply chain), and the multi-column
combiner ``prev ^ (hash + 0x9e3779b9 + (prev<<6) + (prev>>2))`` (SURVEY
A.3). Deterministic and platform-independent; used for partitioning and
bucketing.

Implementation: jnp u32 ops (all backends, used on CPU and inside
shard_map programs). A Pallas TPU kernel form of the same math lives in
``arrow_tpu.experimental.pallas_hash`` — quarantined because the only
available TPU path (the tunneled Mosaic compiler) rejects or hangs on
these kernels (see experimental/__init__.py).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

PRIME32_1 = 2654435761
PRIME32_2 = 2246822519
PRIME32_3 = 3266489917
PRIME32_4 = 668265263
PRIME32_5 = 374761393
GOLDEN = 0x9E3779B9

_BLOCK_ROWS = 8 * 1024  # (64, 128) u32 tiles per grid step


def _u32(x):
    return x.astype(jnp.uint32)


def _avalanche(h):
    """xxhash32 finalizer (key_hash_internal.h:85-92 Avalanche). Shift
    counts are explicit uint32: under jax_enable_x64 weak-typed python
    ints otherwise promote intermediates to 64-bit, which Mosaic (32-bit
    only on v5e) cannot lower."""
    h = h ^ (h >> jnp.uint32(15))
    h = h * jnp.uint32(PRIME32_2)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(PRIME32_3)
    h = h ^ (h >> jnp.uint32(16))
    return h


def _hash_u32_word(w):
    h = jnp.uint32(PRIME32_5) + jnp.uint32(4)
    h = h + w * jnp.uint32(PRIME32_3)
    h = ((h << jnp.uint32(17)) | (h >> jnp.uint32(15))) * \
        jnp.uint32(PRIME32_4)
    return _avalanche(h)


def _combine(prev, h):
    """CombineHashesImp (key_hash_internal.h:96-100)."""
    return prev ^ (h + jnp.uint32(GOLDEN) + (prev << jnp.uint32(6)) +
                   (prev >> jnp.uint32(2)))


def hash32_words(words: Sequence[jax.Array]) -> jax.Array:
    """jnp implementation: hash of one-or-more u32 words per row."""
    out = _hash_u32_word(_u32(words[0]))
    for w in words[1:]:
        out = _combine(out, _hash_u32_word(_u32(w)))
    return out


def column_words(values: jax.Array) -> List[jax.Array]:
    """Split a column's values into u32 words for hashing (64-bit types
    hash both halves; the split is arithmetic — no bitcast, which the
    backend's x64 rewriter lacks)."""
    dt = values.dtype
    if dt.itemsize <= 4:
        if jnp.issubdtype(dt, jnp.floating):
            # quantize f32 through int32 round-trip-stable path
            return [jax.lax.bitcast_convert_type(
                values.astype(jnp.float32), jnp.uint32)]
        return [values.astype(jnp.uint32)]
    if jnp.issubdtype(dt, jnp.floating):
        # f64: exact bit pattern via the arithmetic extraction in keys.py
        # (frexp/64-bit bitcast don't lower through the x64 rewriter)
        from .keys import f64_bits
        bits = f64_bits(values)
        return [_u32(bits & jnp.uint64(0xFFFFFFFF)),
                _u32(bits >> jnp.uint64(32))]
    v = values.astype(jnp.int64)
    return [_u32(v & 0xFFFFFFFF), _u32((v >> 32) & 0xFFFFFFFF)]


def hash_columns(cols) -> jax.Array:
    """Hash one-or-more DeviceColumns to u32 (null rows hash the zero
    word; callers mask)."""
    words: List[jax.Array] = []
    for c in cols:
        words.extend(column_words(c.values))
    return hash32_words(words)


# registered compute function (engine-visible)
from ..device.column import DeviceColumn  # noqa: E402
from .. import types as T  # noqa: E402
from .registry import register  # noqa: E402


@register("hash32", "elementwise",
          "xxhash32-style hash of one column (SURVEY A.3 Hashing32)")
def _hash32_fn(ctx, col):
    out = hash_columns([col])
    return DeviceColumn(out, col.validity, T.uint32())
