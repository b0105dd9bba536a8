"""Single-kernel microbenchmarks on the real chip (reference protocol:
the 75 *_benchmark.cc google-benchmark binaries, SURVEY §6).

Prints one JSON line per kernel: rows/s and effective HBM GB/s. Run on
TPU (no JAX_PLATFORMS override) — each kernel is 1-2 compiles.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def _force(out):
    """Readback one real value per output array: block_until_ready can
    return before execution completes on the tunneled axon platform, so
    timing loops must gate on an actual device->host transfer."""
    leaves = jax.tree_util.tree_leaves(out)
    total = 0.0
    for leaf in leaves:
        v = leaf if getattr(leaf, "ndim", 0) == 0 else leaf[:1]
        total += float(np.asarray(v, dtype=np.float64).sum())
    return total


def bench(name, fn, args, bytes_per_row, rows, iters=20):
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _force(out)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": name, "rows_per_s": round(rows / dt, 1),
        "ms": round(dt * 1e3, 3),
        "hbm_gb_s": round(bytes_per_row * rows / dt / 1e9, 1)}))


def main():
    n = 1 << 22  # 4M rows
    rng = np.random.default_rng(0)
    f64 = jnp.asarray(rng.normal(size=n))
    i64 = jnp.asarray(rng.integers(0, 1 << 40, n))
    keys = jnp.asarray(rng.integers(0, 512, n))
    u32a = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int64)
                       .astype(np.uint32))
    idx = jnp.asarray(rng.permutation(n).astype(np.int32))

    from arrow_tpu.compute.move import (compact_by_mask, gather_rows,
                                        segment_reduce,
                                        sort_with_payload)
    from arrow_tpu.compute.hashing import hash32_words
    from arrow_tpu.experimental.pallas_hash import hash32_pallas

    bench("filter_compact_f64",
          jax.jit(lambda v: compact_by_mask(v > 0, [v])),
          (f64,), 8 * 3, n)
    # 1M rows, not 4M: the 4M merge-sort-gather COMPILE wedged the
    # tunnel for 75+ min in round-4 session 2 (CHIP_SESSION_r04.jsonl)
    bench("take_gather_f64_1m",
          jax.jit(lambda v, i: gather_rows([v], i)),
          (f64[:n // 4], idx[:n // 4] % (n // 4)), 8 * 3, n // 4)
    bench("sort_i64_payload_f64",
          jax.jit(lambda k, v: sort_with_payload(
              [k.astype(jnp.uint64)], [v])),
          (i64, f64), 16 * 2, n)
    bench("group_sum_512",
          jax.jit(lambda v, g: segment_reduce(
              v, g.astype(jnp.int32), 512, "sum", 0.0)),
          (f64, keys), 8 * 2, n)
    bench("hash32_xla", jax.jit(lambda w: hash32_words([w])),
          (u32a,), 4 * 2, n)
    try:
        bench("hash32_pallas", jax.jit(lambda w: hash32_pallas([w])),
              (u32a,), 4 * 2, n)
    except Exception as e:
        print(json.dumps({"metric": "hash32_pallas",
                          "error": str(e)[:80]}))

    # device byte-pool string predicate over a 1M-UNIQUE dictionary
    # (round-2 verdict done-criterion; compute/device_strings.py).
    # bytes/row ~= pool row width (the 2-D byte op reads the pool once)
    try:
        import os
        os.environ["ARROW_TPU_DEVICE_STRINGS"] = "on"
        import arrow_tpu as at
        from arrow_tpu.compute.device_strings import (dictionary_pool,
                                                      pool_predicate)
        from arrow_tpu.device.column import upload_column
        d = 1 << 20
        vals = [f"string-{i:07d}-suffix" for i in range(d)]
        col = upload_column(at.array(vals, at.string()))
        pool = dictionary_pool(col.dictionary)
        assert pool is not None and pool.d == d

        def pred(_):
            return pool_predicate("match_substring", col, "7-suf")
        bench("device_strings_match_1m_unique", pred, (None,),
              pool.L, d, iters=10)
    except Exception as e:
        print(json.dumps({"metric": "device_strings_match_1m_unique",
                          "error": str(e)[:120]}))


if __name__ == "__main__":
    main()
