#!/usr/bin/env python
"""Roofline + micro-benchmark sweep on the real chip (VERDICT round-1
item 2; reference protocol: the 75 *_benchmark.cc binaries, SURVEY §6).

Measures, in order:
  1. platform roofline: f32 streaming sum (single and multi-stream)
  2. selection/sort/grouper/join micro kernels with bytes-touched GB/s
  3. grouped-sum variants: XLA broadcast reduce vs Pallas float-float
     kernel, f64 and f32 (compute/pallas_agg.py)
  4. TPC-H Q1 (whole + chunked), Q3, Q9-style, SF from env
Writes one JSON object per line to BENCH_MICRO_r02.json and stdout.

Run WITHOUT JAX_PLATFORMS overrides (needs the real TPU). Expect the
first run to spend minutes compiling through the tunneled compiler.

Env: ARROW_TPU_BENCH_SF (default 1.0), ARROW_TPU_BENCH_ITERS (20),
ARROW_TPU_BENCH_OUT (default BENCH_MICRO_r02.json).
"""

import json
import os
import time

import numpy as np

RESULTS = []
OUT_PATH = os.environ.get("ARROW_TPU_BENCH_OUT", "BENCH_MICRO_r02.json")


def emit(rec):
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)
    with open(OUT_PATH, "w") as f:
        for r in RESULTS:
            f.write(json.dumps(r) + "\n")


def _force(out):
    """Gate on a real device->host readback (block_until_ready is not a
    barrier on the tunneled axon platform; see docs/BENCHMARKS.md)."""
    import jax
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(out):
        if not hasattr(leaf, "ndim"):
            continue
        v = leaf if leaf.ndim == 0 else leaf.reshape(-1)[:1]
        total += float(np.asarray(v, dtype=np.float64).sum())
    return total


def bench(name, fn, args, nbytes, iters=20, extra=None):
    """Amortized protocol: enqueue iters executions back-to-back, read
    back once at the end (programs execute in order)."""
    try:
        _force(fn(*args))  # compile + warm
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _force(out)
        dt = (time.perf_counter() - t0) / iters
        rec = {"metric": name, "ms": round(dt * 1e3, 3),
               "hbm_gb_s": round(nbytes / dt / 1e9, 1)}
        if extra:
            rec.update(extra)
        emit(rec)
        return dt
    except Exception as e:  # record failures instead of dying
        emit({"metric": name, "error": str(e)[:200]})
        return None


def roofline():
    import jax
    import jax.numpy as jnp
    n = 1 << 25  # 128 MB f32
    x = jnp.asarray(np.random.default_rng(0).random(n, dtype=np.float32))
    bench("roofline_f32_sum_1stream", jax.jit(jnp.sum), (x,), 4 * n)
    xs = [jnp.asarray(np.random.default_rng(i).random(n // 4,
                                                      dtype=np.float32))
          for i in range(5)]
    bench("roofline_f32_sum_5stream",
          jax.jit(lambda *a: sum(jnp.sum(v) for v in a)), tuple(xs),
          5 * 4 * (n // 4))
    # f64 streaming: XLA's software-emulated double path
    xd = jnp.asarray(np.random.default_rng(1).random(n // 2))
    bench("roofline_f64_sum_1stream_xla", jax.jit(jnp.sum), (xd,),
          8 * (n // 2))


def micro():
    import jax
    import jax.numpy as jnp
    from arrow_tpu.compute.move import (compact_by_mask, gather_rows,
                                        segment_reduce, sort_with_payload)
    rng = np.random.default_rng(0)
    n = 1 << 22
    f64 = jnp.asarray(rng.normal(size=n))
    i64 = jnp.asarray(rng.integers(0, 1 << 40, n))
    keys8 = jnp.asarray(rng.integers(0, 8, n).astype(np.int32))
    keys512 = jnp.asarray(rng.integers(0, 512, n).astype(np.int32))
    idx = jnp.asarray(rng.permutation(n).astype(np.int32))

    bench("filter_compact_f64_50pct",
          jax.jit(lambda v: compact_by_mask(v > 0, [v])), (f64,), 8 * 3 * n)
    bench("take_gather_f64",
          jax.jit(lambda v, i: gather_rows([v], i)), (f64, idx), 8 * 3 * n)
    bench("sort_u64_payload_f64",
          jax.jit(lambda k, v: sort_with_payload(
              [k.astype(jnp.uint64)], [v])), (i64, f64), 16 * 2 * n)

    from arrow_tpu.compute.grouper import group_ids
    from arrow_tpu.compute.registry import ExecContext
    from arrow_tpu.device.column import DeviceColumn
    from arrow_tpu import types as T

    def grouper_fn(k):
        ctx = ExecContext(n, jnp.asarray(n, jnp.int32))
        g = group_ids(ctx, [DeviceColumn(k, None, T.int64())])
        return g.group_ids, g.num_groups
    bench("grouper_512_groups", jax.jit(grouper_fn),
          (keys512.astype(jnp.int64),), 8 * 3 * n)

    # join build+probe (2M probe x 256k build, int64 keys)
    import arrow_tpu as at
    from arrow_tpu import acero
    from arrow_tpu.acero import Declaration
    left = at.table({"key": rng.integers(0, 262144, 1 << 21),
                     "lv": rng.integers(0, 1000, 1 << 21)})
    right = at.table({"rkey": rng.integers(0, 262144, 1 << 18),
                      "rv": rng.integers(0, 97, 1 << 18)})
    plan = Declaration("hashjoin", acero.HashJoinNodeOptions(
        "inner", left_keys=["key"], right_keys=["rkey"]),
        inputs=[Declaration("table_source",
                            acero.TableSourceNodeOptions(left)),
                Declaration("table_source",
                            acero.TableSourceNodeOptions(right))])
    try:
        plan.to_table()  # compile + warm (uploads cached on options)
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            out = plan.to_table()
        dt = (time.perf_counter() - t0) / iters
        emit({"metric": "join_inner_2M_probe_256k_build",
              "ms": round(dt * 1e3, 2),
              "probe_rows_per_s": round((1 << 21) / dt, 1)})
    except Exception as e:
        emit({"metric": "join_inner_2M_probe_256k_build",
              "error": str(e)[:200]})

    # grouped sums: XLA broadcast vs Pallas float-float
    def xla_grouped(v, g, G):
        slots = jnp.arange(G, dtype=g.dtype)[None, :]
        return jnp.sum(jnp.where(g[:, None] == slots, v[:, None], 0),
                       axis=0)
    bench("grouped_sum8_f64_xla_broadcast",
          jax.jit(lambda v, g: xla_grouped(v, g, 8)), (f64, keys8), 8 * n)
    f32 = f64.astype(jnp.float32)
    bench("grouped_sum8_f32_xla_broadcast",
          jax.jit(lambda v, g: xla_grouped(v, g, 8)), (f32, keys8), 4 * n)
    try:
        from arrow_tpu.compute.pallas_agg import grouped_sum_pallas
        bench("grouped_sum8_f64_pallas_ff",
              jax.jit(lambda v, g: grouped_sum_pallas(v, g, 8)),
              (f64, keys8), 8 * n)
        bench("grouped_sum8_f32_pallas",
              jax.jit(lambda v, g: grouped_sum_pallas(v, g, 8)),
              (f32, keys8), 4 * n)
        # accuracy cross-check on device
        ref = np.zeros(8)
        np.add.at(ref, np.asarray(keys8), np.asarray(f64))
        got = np.asarray(jax.jit(
            lambda v, g: grouped_sum_pallas(v, g, 8))(f64, keys8))
        emit({"metric": "grouped_sum8_f64_pallas_max_rel_err",
              "value": float(np.max(np.abs(got - ref)
                                    / np.maximum(np.abs(ref), 1e-300)))})
    except Exception as e:
        emit({"metric": "grouped_sum_pallas", "error": str(e)[:200]})

    bench("grouped_sum512_f64_engine_path",
          jax.jit(lambda v, g: segment_reduce(v, g, 512, "sum", 0.0)),
          (f64, keys512), 8 * 2 * n)


def tpch():
    sf = float(os.environ.get("ARROW_TPU_BENCH_SF", "1.0"))
    iters = int(os.environ.get("ARROW_TPU_BENCH_ITERS", "10"))
    import bench as B
    from arrow_tpu.io import tpch as gen, tpch_queries as q

    lineitem = gen.lineitem_table(sf)
    n = lineitem.num_rows
    try:
        ours = B.bench_ours(lineitem, iters)
        emit({"metric": f"tpch_q1_sf{sf:g}", "rows_per_s": round(ours, 1)})
    except Exception as e:
        emit({"metric": f"tpch_q1_sf{sf:g}", "error": str(e)[:200]})

    # chunked Q1 (streaming; bounded HBM) on the same data
    try:
        plan = q.q1_plan(lineitem)
        chunk = 1 << 22
        plan.to_table(chunk_rows=chunk)  # warm
        t0 = time.perf_counter()
        plan.to_table(chunk_rows=chunk)
        dt = time.perf_counter() - t0
        emit({"metric": f"tpch_q1_sf{sf:g}_chunked_4M",
              "rows_per_s": round(n / dt, 1), "ms": round(dt * 1e3, 1)})
    except Exception as e:
        emit({"metric": f"tpch_q1_sf{sf:g}_chunked_4M",
              "error": str(e)[:200]})

    # Q3: join-heavy plan (fused prepare+plan path)
    try:
        cust = gen.customer_table(sf)
        orders = gen.orders_table(sf)
        plan3 = q.q3_plan(cust, orders, lineitem)
        plan3.to_table()  # warm/compile
        t0 = time.perf_counter()
        it3 = max(iters // 2, 3)
        for _ in range(it3):
            plan3.to_table()
        dt = (time.perf_counter() - t0) / it3
        emit({"metric": f"tpch_q3_sf{sf:g}",
              "rows_per_s": round(n / dt, 1), "ms": round(dt * 1e3, 1)})
    except Exception as e:
        emit({"metric": f"tpch_q3_sf{sf:g}", "error": str(e)[:200]})

    # Q9-style multi-join
    try:
        t = gen.generate(min(sf, 1.0))
        plan9 = q.q9_style_plan(t["part"], t["supplier"], t["lineitem"],
                                t["partsupp"], t["orders"], t["nation"])
        plan9.to_table()
        t0 = time.perf_counter()
        it9 = max(iters // 4, 2)
        for _ in range(it9):
            plan9.to_table()
        dt = (time.perf_counter() - t0) / it9
        emit({"metric": f"tpch_q9_sf{min(sf, 1.0):g}",
              "rows_per_s": round(t['lineitem'].num_rows / dt, 1),
              "ms": round(dt * 1e3, 1)})
    except Exception as e:
        emit({"metric": f"tpch_q9_sf{min(sf, 1.0):g}",
              "error": str(e)[:200]})


def main():
    import jax
    emit({"metric": "platform", "value": jax.devices()[0].platform,
          "ts": time.strftime("%Y-%m-%d %H:%M:%S")})
    roofline()
    micro()
    tpch()


if __name__ == "__main__":
    main()
