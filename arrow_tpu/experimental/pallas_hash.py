"""Pallas TPU form of the xxhash32 key hash (quarantined — see
experimental/__init__.py). Same math as compute/hashing.py
(key_hash_internal.h xxhash32 primes + combiner); gridded over
(rows/BLOCK) with 8x128 u32 VMEM tiles."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..compute.hashing import (_BLOCK_ROWS, _combine, _hash_u32_word,
                               _u32, hash32_words)


def _pallas_hash_kernel(n_words):
    def kernel(*refs):
        word_refs, out_ref = refs[:-1], refs[-1]
        h = _hash_u32_word(word_refs[0][:])
        for r in word_refs[1:]:
            h = _combine(h, _hash_u32_word(r[:]))
        out_ref[:] = h

    return kernel


def hash32_pallas(words: Sequence[jax.Array]) -> jax.Array:
    """Pallas TPU kernel over (rows/BLOCK) grid, 8x128 u32 tiles."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = words[0].shape[0]
    if n % _BLOCK_ROWS != 0:
        return hash32_words(words)  # shapes must tile; fall back
    rows = _BLOCK_ROWS // 128
    shaped = [_u32(w).reshape(n // 128, 128) for w in words]
    grid = (n // _BLOCK_ROWS,)
    kernel = _pallas_hash_kernel(len(words))
    # index maps return (i, i*0) not (i, 0): under jax_enable_x64 a
    # literal 0 turns the map's return into mixed (i32, i64), which
    # Mosaic cannot legalize
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((rows, 128), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM)
                  for _ in shaped],
        out_specs=pl.BlockSpec((rows, 128), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // 128, 128), jnp.uint32),
    )(*shaped)
    return out.reshape(n)
