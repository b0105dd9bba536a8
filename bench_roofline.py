#!/usr/bin/env python
"""Slope-based roofline + micro-benchmark sweep on the real chip.

Round-2 methodology fix: the tunneled platform executes programs with a
~1.5 ms per-program dispatch floor, so single-size "GB/s" numbers are
floor-dominated and under-report true HBM rates (round-1's "84 GB/s
measured roofline" artifact). Every metric here is measured at TWO
working-set sizes and reported as
    bw_gbps  = extra_bytes / extra_time        (floor cancels)
    floor_ms = t_small - bytes_small / bw
Reference protocol analogue: the *_benchmark.cc sweeps
(vector_selection_benchmark.cc, grouper_benchmark.cc,
hash_join_benchmark.cc) which also report bytes/sec over size ranges.

Writes one JSON object per line to BENCH_MICRO_r02.json and stdout.
Run WITHOUT platform overrides (needs the real TPU). Tunnel compiles
are slow (~1-3 min/program) — expect a full sweep to take ~30 min cold.

Env: ARROW_TPU_BENCH_OUT (default BENCH_MICRO_r02.json),
ARROW_TPU_BENCH_ITERS (default 20), ARROW_TPU_BENCH_SECTION (comma list
to restrict: roofline,agg,move,sort,group,join,q1).
"""

import json
import os
import time

import numpy as np

OUT_PATH = os.environ.get("ARROW_TPU_BENCH_OUT", "BENCH_MICRO_r02.json")
ITERS = int(os.environ.get("ARROW_TPU_BENCH_ITERS", "20"))
SECTIONS = os.environ.get(
    "ARROW_TPU_BENCH_SECTION", "roofline,agg,move,sort,group,join,q1"
).split(",")
RESULTS = []


def emit(rec):
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)
    with open(OUT_PATH, "w") as f:
        for r in RESULTS:
            f.write(json.dumps(r) + "\n")


def _force(out):
    """Gate on a real device->host readback (block_until_ready is not a
    barrier on the tunneled axon platform)."""
    import jax
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(out):
        if not hasattr(leaf, "ndim"):
            continue
        v = leaf if leaf.ndim == 0 else leaf.reshape(-1)[:1]
        total += float(np.asarray(v, dtype=np.float64).sum())
    return total


def _time_one(fn, args, iters):
    _force(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def slope_bench(name, make, sizes, bytes_per_row, iters=ITERS,
                extra=None):
    """make(n) -> (fn, args). Measures at each size; reports the
    floor-free bandwidth from the slope between the extremes."""
    try:
        times = []
        for n in sizes:
            fn, args = make(n)
            times.append(_time_one(fn, args, iters))
        n0, n1 = sizes[0], sizes[-1]
        t0, t1 = times[0], times[-1]
        bw = (n1 - n0) * bytes_per_row / max(t1 - t0, 1e-9) / 1e9
        floor_ms = max(t0 - n0 * bytes_per_row / (bw * 1e9), 0.0) * 1e3
        rec = {"name": name,
               "sizes": list(sizes),
               "ms": [round(t * 1e3, 3) for t in times],
               "bw_gbps": round(bw, 1),
               "floor_ms": round(floor_ms, 3),
               "bytes_per_row": bytes_per_row}
        if extra:
            rec.update(extra)
        emit(rec)
        return rec
    except Exception as e:  # keep sweeping on per-op failure
        emit({"name": name, "error": f"{type(e).__name__}: {e}"[:200]})
        return None


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    emit({"name": "platform", "devices": [str(d) for d in jax.devices()],
          "iters": ITERS})
    rng = np.random.default_rng(0)
    S, L = 8 * 1024 * 1024, 32 * 1024 * 1024

    def fvals(n):
        return jnp.asarray(rng.standard_normal(n))

    def f32vals(n):
        return jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def gids(n, g=4):
        return jnp.asarray(rng.integers(0, g, n).astype(np.int32))

    def keep(n):
        return jnp.asarray(rng.random(n) < 0.5)

    # -- 1. platform roofline: plain streaming sums ------------------------
    if "roofline" in SECTIONS:
        slope_bench("stream_sum_f32",
                    lambda n: (jax.jit(jnp.sum), (f32vals(n),)),
                    [S, L], 4)
        slope_bench("stream_sum_f64",
                    lambda n: (jax.jit(jnp.sum), (fvals(n),)),
                    [S, L], 8)
        slope_bench("stream_mul_add_f32",
                    lambda n: (jax.jit(lambda a, b: jnp.sum(a * b + 1.0)),
                               (f32vals(n), f32vals(n))),
                    [S, L], 8)

    # -- 2. grouped aggregates (Q1 core) -----------------------------------
    if "agg" in SECTIONS:
        def mask4_f64(n):
            v, g = fvals(n), gids(n)
            f = jax.jit(lambda v, g: jnp.stack(
                [jnp.sum(jnp.where(g == s, v, 0.0)) for s in range(4)]))
            return f, (v, g)

        def mask4_f32(n):
            v, g = f32vals(n), gids(n)
            f = jax.jit(lambda v, g: jnp.stack(
                [jnp.sum(jnp.where(g == s, v, 0.0)) for s in range(4)]))
            return f, (v, g)

        def engine_small_group(n):
            from arrow_tpu.compute.move import _segment_reduce_loop
            v, g = fvals(n), gids(n)
            f = jax.jit(lambda v, g: _segment_reduce_loop(
                v, g, 4, "sum", 0.0))
            return f, (v, g)

        slope_bench("grouped_sum4_masked_f64", mask4_f64, [S, L], 12)
        slope_bench("grouped_sum4_masked_f32", mask4_f32, [S, L], 8)
        slope_bench("grouped_sum4_engine_f64", engine_small_group,
                    [S, L], 12)

    # -- 3. movement layer: compaction / gather ----------------------------
    if "move" in SECTIONS:
        from arrow_tpu.compute import move

        def compact_sort_f64(n):
            k, v = keep(n), fvals(n)
            f = jax.jit(lambda k, v: move.compact_by_mask(k, [v])[0][0])
            return f, (k, v)

        def compact_scatter_i32(n):
            k = keep(n)
            v = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))

            def f(k, v):
                pos = jnp.cumsum(k.astype(jnp.int32)) - 1
                p = jnp.where(k, pos, n)
                return jnp.zeros(n + 1, jnp.int32).at[p].set(
                    v, mode="drop")[:n]
            return jax.jit(f), (k, v)

        def compact_scatter_i64split(n):
            k = keep(n)
            v = jnp.asarray(
                rng.integers(-(1 << 60), 1 << 60, n).astype(np.int64))

            def f(k, v):
                pos = jnp.cumsum(k.astype(jnp.int32)) - 1
                p = jnp.where(k, pos, n)
                lo = (v & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
                hi = (v >> jnp.int64(32)).astype(jnp.int32)
                slo = jnp.zeros(n + 1, jnp.uint32).at[p].set(
                    lo, mode="drop")
                shi = jnp.zeros(n + 1, jnp.int32).at[p].set(
                    hi, mode="drop")
                return (shi[:n].astype(jnp.int64) << jnp.int64(32)) | \
                    slo[:n].astype(jnp.int64)
            return jax.jit(f), (k, v)

        def gather_rows_f64(n):
            v = fvals(n)
            idx = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
            f = jax.jit(lambda v, i: move.gather_rows([v], i)[0])
            return f, (v, idx)

        slope_bench("compact_sort_f64", compact_sort_f64,
                    [S // 4, S], 17)
        slope_bench("compact_scatter_i32", compact_scatter_i32,
                    [S, L], 9)
        slope_bench("compact_scatter_i64split", compact_scatter_i64split,
                    [S, L], 17)
        slope_bench("gather_rows_f64_random", gather_rows_f64,
                    [S // 4, S], 20)

    # -- 4. sort -----------------------------------------------------------
    if "sort" in SECTIONS:
        def sort_u64_payload(n):
            kv = jnp.asarray(rng.integers(0, 1 << 62, n).astype(np.int64))
            pv = fvals(n)
            f = jax.jit(lambda k, p: jax.lax.sort(
                (k, p), dimension=0, is_stable=True, num_keys=1))
            return f, (kv, pv)

        slope_bench("sort_i64key_f64payload", sort_u64_payload,
                    [S // 8, S // 2], 32)

    # -- 5. grouper (hash path) -------------------------------------------
    if "group" in SECTIONS:
        def grouper_core_i64(n):
            """The sort-based gid core (grouper.py group_ids inner): one
            multi-operand stable sort + boundary scan + inverse perm."""
            k = jnp.asarray(rng.integers(0, 1 << 20, n).astype(np.int64))

            def f(k):
                cap = k.shape[0]
                iota = jnp.arange(cap, dtype=jnp.int64)
                sk, perm = jax.lax.sort((k, iota), dimension=0,
                                        is_stable=True, num_keys=1)
                is_new = jnp.logical_or(iota == 0, sk != jnp.roll(sk, 1))
                gid_sorted = jnp.cumsum(is_new.astype(jnp.int64)) - 1
                # place gids back in row order (int32-safe scatter)
                return jnp.zeros(cap, jnp.int32).at[
                    perm.astype(jnp.int32)].set(
                    gid_sorted.astype(jnp.int32), mode="drop")
            return jax.jit(f), (k,)

        slope_bench("grouper_core_i64_20bit", grouper_core_i64,
                    [S // 8, S // 2], 12)

    # -- 6. join probe (searchsorted core) --------------------------------
    if "join" in SECTIONS:
        def join_probe(n):
            build = jnp.sort(jnp.asarray(
                rng.integers(0, 1 << 30, n // 4).astype(np.int64)))
            probe = jnp.asarray(
                rng.integers(0, 1 << 30, n).astype(np.int64))
            f = jax.jit(lambda b, p: jnp.searchsorted(b, p))
            return f, (build, probe)

        slope_bench("join_probe_searchsorted_i64", join_probe,
                    [S // 4, S], 18)

    # -- 7. Q1 end-to-end (device-resident, one fused program) ------------
    if "q1" in SECTIONS:
        import sys
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

        def q1(sf):
            # imports inside the thunk so a missing/renamed module emits
            # an error record instead of aborting the whole sweep
            from __graft_entry__ import _q1_chain_decls

            from arrow_tpu.acero.exec import compile_chain
            from arrow_tpu.device.column import upload_table
            from arrow_tpu.io import tpch

            def make():
                t = tpch.lineitem_table(sf)
                batch = upload_table(t)
                fn = compile_chain(_q1_chain_decls())
                return fn, batch, t.num_rows
            return make

        try:
            rows_bytes = 60  # ~7 f64 cols + keys + date per lineitem row
            times = []
            nrows = []
            for sf in (0.25, 1.0):
                fn, batch, n = q1(sf)()
                times.append(_time_one(fn, (batch,), max(ITERS // 2, 5)))
                nrows.append(n)
            bw = (nrows[1] - nrows[0]) * rows_bytes / \
                max(times[1] - times[0], 1e-9) / 1e9
            emit({"name": "tpch_q1_device", "sf": [0.25, 1.0],
                  "rows": nrows,
                  "ms": [round(t * 1e3, 3) for t in times],
                  "rows_per_s": round(nrows[1] / times[1], 0),
                  "eff_bw_gbps": round(bw, 1),
                  "bytes_per_row": rows_bytes})
        except Exception as e:
            emit({"name": "tpch_q1_device", "error": str(e)[:200]})


if __name__ == "__main__":
    main()
