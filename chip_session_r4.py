#!/usr/bin/env python
"""ONE-process chip session for round 4 (docs/TUNNEL.md discipline).

Round-3 lesson encoded here: run_chip_session.sh ran bench.py,
bench_micro.py and bench_roofline.py as SEPARATE processes — each one a
new tunnel session, each paying its own once-per-session 15-50 min
first-execution stall, so later phases never completed. This script
runs EVERY phase in a single process/session so the stall is paid at
most once, and orders the phases so results bank incrementally:

  0. acquire probe (tiny put+readback; records acquisition time)
  1. streaming roofline copy (context for GB/s claims)
  2. micro sweep with movement-mode A/B (sort vs 32-bit scatter planes)
  3. Q1 ladder, SF1 FIRST — the stall, if it comes, is eaten by the
     program we actually need; pyarrow reference + later-rung data gen
     run on the host CPU *while* the device chews the first execution
     (dispatch is async; only the readback blocks)
  4. Q1 SF0.1 / SF0.01 re-records (fast once the session is warm)
  5. Q3 join query, SF0.1 then SF1 if budget remains

Every metric line is appended (with flush + fsync) to
CHIP_SESSION_r04.jsonl the moment it completes, so a final budget kill
cannot erase banked rows. No other device client may run concurrently.
"""

import json
import os
import time

OUT_PATH = os.environ.get(
    "CHIP_OUT", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "CHIP_SESSION_r04.jsonl"))
T_START = time.time()
BUDGET = float(os.environ.get("CHIP_BUDGET", "10800"))
SF_TOP = float(os.environ.get("CHIP_SF", "1.0"))      # ladder top rung
MICRO_N = int(os.environ.get("CHIP_MICRO_N", str(1 << 22)))


def remaining():
    return BUDGET - (time.time() - T_START)


def bank(rec):
    rec = dict(rec)
    rec["t_rel_s"] = round(time.time() - T_START, 1)
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT_PATH, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def main():
    import numpy as np
    bank({"phase": "start", "budget_s": BUDGET,
          "pid": os.getpid()})

    # ---- 0. acquire -------------------------------------------------
    import arrow_tpu.device  # noqa: F401 - enables jax_enable_x64
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    d = jax.device_put(np.ones(1 << 17))
    v = float(np.asarray(d[:1])[0])
    bank({"phase": "acquire", "acquire_s": round(time.time() - t0, 1),
          "ok": v == 1.0, "backend": jax.default_backend()})

    def force(out):
        leaves = jax.tree_util.tree_leaves(out)
        tot = 0.0
        for leaf in leaves:
            x = leaf if getattr(leaf, "ndim", 0) == 0 else leaf[:1]
            tot += float(np.asarray(x, dtype=np.float64).sum())
        return tot

    def timed(name, fn, args, bytes_moved, rows, iters=10, extra=None):
        """Readback-gated amortized timing with first-exec split.
        Banks an error line instead of raising (a rejected lowering on
        the tunneled compiler must not kill the rest of the session)."""
        try:
            return _timed(name, fn, args, bytes_moved, rows, iters,
                          extra)
        except Exception as e:  # noqa: BLE001
            bank({"metric": name, "error": repr(e)[:600]})
            return None

    def _timed(name, fn, args, bytes_moved, rows, iters, extra):
        t0 = time.time()
        out = fn(*args)          # trace+compile+dispatch
        t1 = time.time()
        force(out)               # blocks through any stall
        t2 = time.time()
        t3 = time.time()
        for _ in range(iters):
            out = fn(*args)
        force(out)
        dt = (time.time() - t3) / iters
        rec = {"metric": name, "ms": round(dt * 1e3, 3),
               "rows_per_s": round(rows / dt, 1),
               "hbm_gb_s": round(bytes_moved / dt / 1e9, 2),
               "compile_s": round(t1 - t0, 1),
               "first_exec_s": round(t2 - t1, 1), "iters": iters}
        if extra:
            rec.update(extra)
        bank(rec)
        return dt

    # ---- 1. roofline copy -------------------------------------------
    n = max(MICRO_N * 2, 1 << 10)  # default 8M f64 = 64 MiB
    rng = np.random.default_rng(0)
    big = jax.device_put(rng.normal(size=n))
    timed("roofline_copy_f64_8m", jax.jit(lambda x: x + 1.0), (big,),
          2 * 8 * n, n, iters=10)
    del big

    # ---- 2. micro sweep with movement A/B ---------------------------
    from arrow_tpu.compute import move
    from arrow_tpu.compute.hashing import hash32_words

    nm = MICRO_N  # default 4M rows
    f64 = jax.device_put(rng.normal(size=nm))
    f32 = jax.device_put(rng.normal(size=nm).astype(np.float32))
    i32 = jax.device_put(rng.integers(0, 1 << 30, nm,
                                      dtype=np.int64).astype(np.int32))
    i64 = jax.device_put(rng.integers(0, 1 << 40, nm))
    keys512 = jax.device_put(rng.integers(0, 512, nm))
    u32a = jax.device_put(rng.integers(0, 1 << 31, nm,
                                       dtype=np.int64).astype(np.uint32))
    idx = jax.device_put(rng.permutation(nm).astype(np.int32))

    def compact_in(mode, planes):
        """Fresh jit per (mode, planes) so env is read at trace time."""
        def f(v):
            os.environ["ARROW_TPU_MOVEMENT"] = mode
            os.environ["ARROW_TPU_F64_PLANES"] = planes
            try:
                return move.compact_by_mask(v > 0, [v])
            finally:
                del os.environ["ARROW_TPU_MOVEMENT"]
                del os.environ["ARROW_TPU_F64_PLANES"]
        return jax.jit(f)

    # A/B: current default (sort) vs 'gather' (one i32 index sort +
    # hinted per-column gathers) vs linear 32-bit scatter planes
    timed("filter_compact_f64_sort", compact_in("sort", "off"),
          (f64,), 3 * 8 * nm, nm)
    timed("filter_compact_f64_gather", compact_in("gather", "off"),
          (f64,), 3 * 8 * nm, nm)
    timed("filter_compact_f32_scatter", compact_in("scatter", "off"),
          (f32,), 3 * 4 * nm, nm)
    timed("filter_compact_i32_scatter", compact_in("scatter", "off"),
          (i32,), 3 * 4 * nm, nm)
    timed("filter_compact_i64_gather", compact_in("gather", "off"),
          (i64,), 3 * 8 * nm, nm)

    # multi-column amortization: 4 f64 columns share one mask; 'gather'
    # pays the index sort once, 'sort' carries all 4 payloads
    c2 = jax.device_put(rng.normal(size=nm))
    c3 = jax.device_put(rng.normal(size=nm))
    c4 = jax.device_put(rng.normal(size=nm))

    def compact4_in(mode):
        def f(a, b, c, d):
            os.environ["ARROW_TPU_MOVEMENT"] = mode
            try:
                return move.compact_by_mask(a > 0, [a, b, c, d])
            finally:
                del os.environ["ARROW_TPU_MOVEMENT"]
        return jax.jit(f)

    timed("filter_compact_4xf64_sort", compact4_in("sort"),
          (f64, c2, c3, c4), 3 * 8 * nm * 4, nm)
    timed("filter_compact_4xf64_gather", compact4_in("gather"),
          (f64, c2, c3, c4), 3 * 8 * nm * 4, nm)
    del c2, c3, c4

    # isolate the hinted-gather lowering itself: monotone random indices
    # with a truthful indices_are_sorted hint (the gather-mode workhorse)
    sidx = jax.device_put(np.sort(rng.integers(0, nm, nm)
                                  .astype(np.int32)))
    timed("take_sorted_hint_f64", jax.jit(
        lambda v, i: jnp.take(v, i, axis=0, indices_are_sorted=True,
                              mode="clip")), (f64, sidx), 2 * 8 * nm, nm)
    del sidx

    timed("take_gather_f64", jax.jit(
        lambda v, i: move.gather_rows([v], i)), (f64, idx), 3 * 8 * nm,
        nm)
    timed("sort_i64_payload_f64", jax.jit(
        lambda k, v: move.sort_with_payload([k.astype(jnp.uint64)],
                                            [v])),
        (i64, f64), 2 * 16 * nm, nm)
    timed("group_sum_512", jax.jit(
        lambda v, g: move.segment_reduce(v, g.astype(jnp.int32), 512,
                                         "sum", 0.0)),
        (f64, keys512), 2 * 8 * nm, nm)
    timed("hash32_xla", jax.jit(lambda w: hash32_words([w])), (u32a,),
          2 * 4 * nm, nm)

    # device byte-pool strings ON CHIP (r3 row was CPU-measured)
    if remaining() > 600:
        try:
            os.environ["ARROW_TPU_DEVICE_STRINGS"] = "on"
            import arrow_tpu as at
            from arrow_tpu.compute.device_strings import (
                dictionary_pool, pool_predicate)
            from arrow_tpu.device.column import upload_column
            dct = min(1 << 20, max(MICRO_N // 4, 1 << 10))
            vals = [f"string-{i:07d}-suffix" for i in range(dct)]
            col = upload_column(at.array(vals, at.string()))
            pool = dictionary_pool(col.dictionary)
            assert pool is not None and pool.d == dct
            timed("device_strings_match_1m_unique",
                  lambda: pool_predicate("match_substring", col,
                                         "7-suf"),
                  (), pool.L * dct, dct)
        except Exception as e:  # noqa: BLE001 - bank the error, move on
            bank({"metric": "device_strings_match_1m_unique",
                  "error": str(e)[:400]})

    del f64, f32, i32, i64, keys512, u32a, idx

    # ---- 3/4. Q1 ladder, SF1 first ----------------------------------
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _q1_chain_decls
    from arrow_tpu.acero.exec import compile_chain
    from arrow_tpu.device.column import upload_table
    from arrow_tpu.io import tpch
    import bench as benchmod

    def q1_rung(sf, iters, host_work=None):
        t0 = time.time()
        lineitem = tpch.lineitem_table(sf)
        gen_s = time.time() - t0
        t0 = time.time()
        batch = upload_table(lineitem)
        up_s = time.time() - t0
        fn = compile_chain(_q1_chain_decls())
        t0 = time.time()
        out = fn(batch)          # compile (sync) + dispatch (async)
        compile_s = time.time() - t0
        # host CPU work overlaps the (possibly stalled) first execution
        ref = 0.0
        t_host0 = time.time()
        try:
            ref = benchmod.bench_reference(lineitem,
                                           2 if sf >= 1 else 5)
        except Exception as e:  # noqa: BLE001
            bank({"note": f"pyarrow ref failed at sf{sf}",
                  "error": str(e)[:120]})
        if host_work:
            host_work()
        host_s = time.time() - t_host0
        t0 = time.time()
        float(np.asarray(out.columns[-1].values[:1])[0])
        first_exec_s = time.time() - t0 + max(0.0, 0.0)
        t0 = time.time()
        for _ in range(iters):
            out = fn(batch)
        float(np.asarray(out.columns[-1].values[:1])[0])
        dt = (time.time() - t0) / iters
        ours = lineitem.num_rows / dt
        bank({"metric": f"tpch_q1_sf{sf:g}_rows_per_s",
              "value": round(ours, 1), "unit": "rows/s",
              "vs_baseline": round(ours / ref, 3) if ref else 0.0,
              "ms_per_iter": round(dt * 1e3, 2), "iters": iters,
              "gen_s": round(gen_s, 1), "upload_s": round(up_s, 1),
              "compile_s": round(compile_s, 1),
              "first_exec_wait_s": round(first_exec_s, 1),
              "host_overlap_s": round(host_s, 1),
              "rows": lineitem.num_rows})
        del batch
        return ours

    prep = {}

    lower = [SF_TOP / 10, SF_TOP / 100]

    def gen_later_rungs():
        for sf in lower:
            prep[sf] = tpch.lineitem_table(sf)

    def guarded(label, fn, *a, **kw):
        try:
            fn(*a, **kw)
        except Exception as e:  # noqa: BLE001 - bank it, keep going
            bank({"metric": label, "error": repr(e)[:600]})

    if remaining() > 900:
        guarded(f"tpch_q1_sf{SF_TOP:g}", q1_rung, SF_TOP, iters=20,
                host_work=gen_later_rungs)
    for sf in lower:
        if remaining() > 300:
            guarded(f"tpch_q1_sf{sf:g}", q1_rung, sf, iters=10)

    # ---- 5. Q3 ------------------------------------------------------
    def q3_rung(sf, iters):
        from arrow_tpu.io import tpch_queries
        t0 = time.time()
        cust = tpch.customer_table(sf)
        orders = tpch.orders_table(sf)
        lineitem = tpch.lineitem_table(sf)
        gen_s = time.time() - t0
        n = lineitem.num_rows
        plan = tpch_queries.q3_plan(cust, orders, lineitem)
        t0 = time.time()
        plan.to_table()          # warmup: compiles + first exec
        warm_s = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            plan.to_table()
        dt = (time.time() - t0) / iters
        bank({"metric": f"tpch_q3_sf{sf:g}_rows_per_s",
              "value": round(n / dt, 1), "unit": "rows/s",
              "ms_per_iter": round(dt * 1e3, 2), "iters": iters,
              "gen_s": round(gen_s, 1), "warmup_s": round(warm_s, 1),
              "rows": n})

    if remaining() > 600:
        guarded(f"tpch_q3_sf{SF_TOP / 10:g}", q3_rung, SF_TOP / 10,
                iters=8)
    if remaining() > 1500:
        guarded(f"tpch_q3_sf{SF_TOP:g}", q3_rung, SF_TOP, iters=5)

    bank({"phase": "done", "total_s": round(time.time() - T_START, 1)})


if __name__ == "__main__":
    main()
