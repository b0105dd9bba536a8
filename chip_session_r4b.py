#!/usr/bin/env python
"""Round-4 chip session, revision B (docs/TUNNEL.md discipline).

Changes from chip_session_r4.py, driven by what session 2 measured:

* Session 2 banked 9 micro rows in 211 s, then the take_gather_f64
  COMPILE RPC wedged for 75+ minutes (CPU frozen at 0:12) — not the
  documented first-execution stall, a hung remote compile. This
  revision (a) runs the Q1 SF1 ladder FIRST (the round's #1
  deliverable), (b) puts the hang-prone merge-sort gather micro LAST,
  and (c) arms a watchdog thread per phase that banks a line and
  os._exit(3)s instead of blocking forever — the outer retry loop
  (run_chip_session_r4b.sh) restarts after a cooldown and already-
  banked metrics are SKIPPED on re-entry.
* Movement A/B verdict from session 2: hinted gathers are 9-30x slower
  than payload sorts (sorted-hint take: 68.9 ms vs 16.9 ms sort-compact
  at 4M) — 'gather' mode is dead on this chip; 'sort' stays default.
  New A/B here: 64-bit payloads as TWO u32 planes inside the one
  drop-key sort vs the native 64-bit payload (XLA emulates 64-bit on
  v5e — if planes win, f64/i64 columns should ride as planes at
  upload; VERDICT.md round-3 item 2).

Every row appends (flush+fsync) to CHIP_SESSION_r04.jsonl immediately.
"""

import json
import os
import threading
import time

OUT_PATH = os.environ.get(
    "CHIP_OUT", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "CHIP_SESSION_r04.jsonl"))
T_START = time.time()
BUDGET = float(os.environ.get("CHIP_BUDGET", "9000"))
SF_TOP = float(os.environ.get("CHIP_SF", "1.0"))
MICRO_N = int(os.environ.get("CHIP_MICRO_N", str(1 << 22)))


def remaining():
    return BUDGET - (time.time() - T_START)


_DONE = set()
_HUNG: dict = {}  # watchdog_exit label -> count across sessions
if os.path.exists(OUT_PATH):
    for line in open(OUT_PATH):
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if "metric" in rec and ("ms" in rec or "value" in rec):
            _DONE.add(rec["metric"])
        if rec.get("phase") == "watchdog_exit":
            lbl = rec.get("label", "")
            _HUNG[lbl] = _HUNG.get(lbl, 0) + 1


def bank(rec):
    rec = dict(rec)
    rec["t_rel_s"] = round(time.time() - T_START, 1)
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT_PATH, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


class Watchdog:
    """Bank a line and hard-exit if a phase wedges (hung compile RPCs
    hold the session forever otherwise; the outer loop restarts)."""

    def __init__(self):
        self.timer = None

    def arm(self, seconds, label):
        self.disarm()

        def fire():
            bank({"phase": "watchdog_exit", "label": label,
                  "after_s": seconds})
            os._exit(3)
        self.timer = threading.Timer(seconds, fire)
        self.timer.daemon = True
        self.timer.start()

    def disarm(self):
        if self.timer is not None:
            self.timer.cancel()
            self.timer = None


WD = Watchdog()


def main():
    import faulthandler
    import signal
    faulthandler.register(signal.SIGUSR1, all_threads=True)
    import numpy as np
    bank({"phase": "start", "budget_s": BUDGET, "pid": os.getpid(),
          "rev": "b", "skipping": sorted(_DONE)})

    WD.arm(240, "acquire")
    import arrow_tpu.device  # noqa: F401 - enables jax_enable_x64
    import jax
    # persistent compile cache: once ANY session gets a program through
    # the (degraded) remote compiler, later sessions load the
    # executable instead of recompiling
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 - older jax knob names
        pass
    import jax.numpy as jnp
    t0 = time.time()
    d = jax.device_put(np.ones(1 << 17))
    v = float(np.asarray(d[:1])[0])
    bank({"phase": "acquire", "acquire_s": round(time.time() - t0, 1),
          "ok": v == 1.0, "backend": jax.default_backend()})
    WD.disarm()

    def force(out):
        leaves = jax.tree_util.tree_leaves(out)
        tot = 0.0
        for leaf in leaves:
            x = leaf if getattr(leaf, "ndim", 0) == 0 else leaf[:1]
            tot += float(np.asarray(x, dtype=np.float64).sum())
        return tot

    def timed(name, fn, args, bytes_moved, rows, iters=10,
              deadline=900.0):
        if name in _DONE:
            return None
        if _HUNG.get(name, 0) >= int(os.environ.get(
                "CHIP_SKIP_HUNG_AFTER", "2")):
            bank({"phase": "skip_hung", "label": name})
            return None
        if remaining() < 60:
            return None
        try:
            WD.arm(min(deadline, max(remaining(), 60)), name)
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
            bank({"metric": name, "ms": round(dt * 1e3, 3),
                  "rows_per_s": round(rows / dt, 1),
                  "hbm_gb_s": round(bytes_moved / dt / 1e9, 2),
                  "compile_s": round(t1 - t0, 1),
                  "first_exec_s": round(t2 - t1, 1), "iters": iters})
            return dt
        except Exception as e:  # noqa: BLE001 - bank, keep the session
            bank({"metric": name, "error": repr(e)[:600]})
            return None
        finally:
            WD.disarm()

    # ---- 1. Q1 ladder, SF1 FIRST ------------------------------------
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _q1_chain_decls
    from arrow_tpu.acero.exec import compile_chain
    from arrow_tpu.device.column import upload_table
    from arrow_tpu.io import tpch
    import bench as benchmod

    def q1_rung(sf, iters):
        name = f"tpch_q1_sf{sf:g}_rows_per_s"
        if name in _DONE:
            return
        if sf >= 0.2:
            # SF1's ~770 MB upload is the tunnel's chronic wedge point
            # (it has stalled EVERY session across rounds 1-4, incl.
            # 75+ min in this round's sessions 2-3): generate the batch
            # directly in HBM instead (io/tpch_device.py) — only the
            # program and a 3k-row template cross the tunnel. The
            # pyarrow baseline is measured on an SF0.1 host table
            # (rows/s is scale-invariant for pyarrow here) and marked.
            from arrow_tpu.io.tpch_device import q1_device_batch
            t0 = time.time()
            batch, nrows = q1_device_batch(sf)
            float(np.asarray(batch.columns[0].values[:1])[0])  # force
            gen_s = time.time() - t0
            fn = compile_chain(_q1_chain_decls())
            t0 = time.time()
            out = fn(batch)
            compile_s = time.time() - t0
            ref = 0.0
            try:
                ref_tbl = tpch.lineitem_table(sf / 10)
                ref = benchmod.bench_reference(ref_tbl, 3)
            except Exception as e:  # noqa: BLE001
                bank({"note": "pyarrow ref failed", "error": str(e)[:120]})
            t0 = time.time()
            float(np.asarray(out.columns[-1].values[:1])[0])
            first_exec_s = time.time() - t0
            t0 = time.time()
            for _ in range(iters):
                out = fn(batch)
            float(np.asarray(out.columns[-1].values[:1])[0])
            dt = (time.time() - t0) / iters
            ours = nrows / dt
            bank({"metric": name, "value": round(ours, 1),
                  "unit": "rows/s", "gen": "device",
                  "vs_baseline": round(ours / ref, 3) if ref else 0.0,
                  "ref_sf": sf / 10,
                  "ms_per_iter": round(dt * 1e3, 2), "iters": iters,
                  "devgen_s": round(gen_s, 1),
                  "compile_s": round(compile_s, 1),
                  "first_exec_wait_s": round(first_exec_s, 1),
                  "rows": nrows})
            del batch
            return
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
        # pyarrow reference runs on host CPU while the device chews the
        # (possibly stalled) first execution — dispatch is async
        ref = 0.0
        try:
            ref = benchmod.bench_reference(lineitem, 2 if sf >= 1 else 5)
        except Exception as e:  # noqa: BLE001
            bank({"note": f"pyarrow ref failed at sf{sf}",
                  "error": str(e)[:120]})
        t0 = time.time()
        float(np.asarray(out.columns[-1].values[:1])[0])
        first_exec_s = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            out = fn(batch)
        float(np.asarray(out.columns[-1].values[:1])[0])
        dt = (time.time() - t0) / iters
        ours = lineitem.num_rows / dt
        bank({"metric": name, "value": round(ours, 1), "unit": "rows/s",
              "vs_baseline": round(ours / ref, 3) if ref else 0.0,
              "ms_per_iter": round(dt * 1e3, 2), "iters": iters,
              "gen_s": round(gen_s, 1), "upload_s": round(up_s, 1),
              "compile_s": round(compile_s, 1),
              "first_exec_wait_s": round(first_exec_s, 1),
              "rows": lineitem.num_rows})
        del batch

    _HUNG_MAX = int(os.environ.get("CHIP_SKIP_HUNG_AFTER", "2"))

    def guarded(label, deadline, fn, *a, **kw):
        if _HUNG.get(label, 0) >= _HUNG_MAX:
            # this phase wedged (watchdog_exit) in two earlier
            # sessions: a third attempt would burn the budget again
            bank({"phase": "skip_hung", "label": label,
                  "hangs": _HUNG[label]})
            return
        try:
            WD.arm(min(deadline, max(remaining(), 60)), label)
            fn(*a, **kw)
        except Exception as e:  # noqa: BLE001
            bank({"metric": label, "error": repr(e)[:600]})
        finally:
            WD.disarm()

    def q1_phase():
        if remaining() > 600:
            # 1500 s, not 4200: a hung SF1 compile must not eat the
            # whole session before the SF/4 fallback rung runs
            guarded(f"tpch_q1_sf{SF_TOP:g}", 1500, q1_rung, SF_TOP, 20)
        # devgen fallback rung: a quarter-scale program may compile
        # where the SF1-shaped one hangs the degraded remote compiler
        if remaining() > 600:
            guarded(f"tpch_q1_sf{SF_TOP / 4:g}", 2400, q1_rung,
                    SF_TOP / 4, 15)
        for sf in (SF_TOP / 10, SF_TOP / 100):
            if remaining() > 240:
                guarded(f"tpch_q1_sf{sf:g}", 1200, q1_rung, sf, 10)

    if os.environ.get("CHIP_PHASE_ORDER", "q1_first") == "q1_first":
        q1_phase()

    # ---- 2. Q3 ------------------------------------------------------
    _GSUF = "_hg" if os.environ.get(
        "ARROW_TPU_GATHER_IMPL") == "hinted" else ""
    if os.environ.get("ARROW_TPU_SEARCHSORTED", "sort") != "sort":
        _GSUF += "_ss" + os.environ["ARROW_TPU_SEARCHSORTED"]

    def q3_rung(sf, iters):
        name = f"tpch_q3_sf{sf:g}{_GSUF}_rows_per_s"
        if name in _DONE:
            return
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
        bank({"metric": name, "value": round(n / dt, 1),
              "unit": "rows/s", "ms_per_iter": round(dt * 1e3, 2),
              "iters": iters, "gen_s": round(gen_s, 1),
              "warmup_s": round(warm_s, 1), "rows": n})

    def q3_phase():
        if remaining() > 900:
            guarded(f"tpch_q3_sf{SF_TOP / 10:g}{_GSUF}", 2400, q3_rung,
                    SF_TOP / 10, 8)
        if remaining() > 1800:
            guarded(f"tpch_q3_sf{SF_TOP:g}{_GSUF}", 3000, q3_rung,
                    SF_TOP, 5)

    if os.environ.get("CHIP_SKIP_Q3") == "1":
        def q3_phase():  # noqa: F811 - env-disabled
            bank({"phase": "skip", "label": "q3", "reason": "CHIP_SKIP_Q3"})

    if os.environ.get("CHIP_PHASE_ORDER", "q1_first") == "q1_first":
        q3_phase()

    # ---- 2b. BASELINE config 3: multi-key ORDER BY + top-k at scale
    # (device-resident lineitem, one multi-payload sort program) ------
    def sort_rung(sf, iters):
        name = f"tpch_sort_topk_sf{sf:g}_v2_rows_per_s"
        if name in _DONE:
            return
        from arrow_tpu import acero
        from arrow_tpu.acero import Declaration
        from arrow_tpu.io.tpch_device import q1_device_batch
        t0 = time.time()
        batch, nrows = q1_device_batch(sf, seed=7)
        float(np.asarray(batch.columns[0].values[:1])[0])
        gen_s = time.time() - t0
        fn = compile_chain([
            Declaration("order_by", acero.OrderByNodeOptions(
                [("l_shipdate", "ascending"),
                 ("l_extendedprice", "descending")])),
            Declaration("fetch", acero.FetchNodeOptions(0, 100)),
        ])
        t0 = time.time()
        out = fn(batch)
        compile_s = time.time() - t0
        t0 = time.time()
        float(np.asarray(out.columns[-1].values[:1])[0])
        first_exec_s = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            out = fn(batch)
        float(np.asarray(out.columns[-1].values[:1])[0])
        dt = (time.time() - t0) / iters
        bank({"metric": name, "value": round(nrows / dt, 1),
              "unit": "rows/s", "gen": "device",
              "ms_per_iter": round(dt * 1e3, 2), "iters": iters,
              "devgen_s": round(gen_s, 1),
              "compile_s": round(compile_s, 1),
              "first_exec_wait_s": round(first_exec_s, 1),
              "rows": nrows})
        del batch

    def sort_phase():
        if remaining() > 900:
            guarded(f"tpch_sort_topk_sf{SF_TOP:g}_v2", 2400, sort_rung,
                    SF_TOP, 10)

    if os.environ.get("CHIP_PHASE_ORDER", "q1_first") == "q1_first":
        sort_phase()

    # ---- 3. micro leftovers (session 2 banked the compaction A/B) ---
    from arrow_tpu.compute import move
    from arrow_tpu.compute.hashing import hash32_words

    nm = MICRO_N
    rng = np.random.default_rng(0)
    f64 = jax.device_put(rng.normal(size=nm))
    i64 = jax.device_put(rng.integers(0, 1 << 40, nm))
    keys512 = jax.device_put(rng.integers(0, 512, nm))
    u32a = jax.device_put(rng.integers(0, 1 << 31, nm,
                                       dtype=np.int64).astype(np.uint32))

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

    # 64-bit-as-planes A/B inside the ONE drop-key sort: if two u32
    # payload planes beat one emulated 64-bit payload, 64-bit columns
    # should ride as planes at upload (VERDICT round-3 item 2)
    def compact_i64_direct(v):
        os.environ["ARROW_TPU_MOVEMENT"] = "sort"
        try:
            return move.compact_by_mask(v > 0, [v])
        finally:
            del os.environ["ARROW_TPU_MOVEMENT"]

    def compact_i64_planes(v):
        lo = (v & 0xFFFFFFFF).astype(jnp.uint32)
        hi = (v >> 32).astype(jnp.uint32)
        drop = (~(v > 0)).astype(jnp.uint8)
        slo, shi = move.sort_with_payload([drop], [lo, hi])
        return (shi.astype(jnp.int64) << 32) | slo.astype(jnp.int64)

    timed("filter_compact_i64_sort", jax.jit(compact_i64_direct),
          (i64,), 3 * 8 * nm, nm)
    timed("filter_compact_i64_planes_sort", jax.jit(compact_i64_planes),
          (i64,), 3 * 8 * nm, nm)

    def compact_f32(v):
        drop = (~(v > 0)).astype(jnp.uint8)
        (out,) = move.sort_with_payload([drop], [v])
        return out

    f32 = jax.device_put(rng.normal(size=nm).astype(np.float32))
    timed("filter_compact_f32_sort", jax.jit(compact_f32), (f32,),
          3 * 4 * nm, nm)

    # key-only sort floor: how much of the compact cost is the sort
    # network itself vs payload width
    timed("sort_u8_key_only", jax.jit(
        lambda v: jax.lax.sort((((~(v > 0)).astype(jnp.uint8)),),
                               dimension=0, is_stable=True,
                               num_keys=1)), (f64,), 2 * 1 * nm, nm)

    # device byte-pool strings ON CHIP (round-3 row was CPU-measured)
    if remaining() > 300 and "device_strings_match_1m_unique" not in _DONE:
        try:
            WD.arm(900, "device_strings")
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
            WD.disarm()
            timed("device_strings_match_1m_unique",
                  lambda: pool_predicate("match_substring", col,
                                         "7-suf"),
                  (), pool.L * dct, dct)
            from arrow_tpu.compute.device_strings import pool_transform
            timed("device_strings_upper_1m_unique",
                  lambda: pool_transform("upper", col),
                  (), 2 * pool.L * dct, dct)
        except Exception as e:  # noqa: BLE001
            bank({"metric": "device_strings_match_1m_unique",
                  "error": str(e)[:400]})
        finally:
            WD.disarm()

    if os.environ.get("CHIP_PHASE_ORDER", "q1_first") != "q1_first":
        # micros banked first (CHIP_PHASE_ORDER=micros_first): now the
        # stall-prone at-scale macros
        q1_phase()
        sort_phase()
        q3_phase()

    # re-measures under round-4 engine fixes (new metric names so the
    # banked-row skip doesn't hide them): ONE-sort segment reduce
    # (was 4 sorts, 77.8 ms at 512 segments) and a mid-cardinality
    # point; planes-assisted i64 compaction is covered above
    timed("group_sum_512_v2", jax.jit(
        lambda v, g: move.segment_reduce(v, g.astype(jnp.int32), 512,
                                         "sum", 0.0)),
        (f64, keys512), 2 * 8 * nm, nm)
    keys4k = jax.device_put(rng.integers(0, 4096, nm))
    timed("group_sum_4096_v2", jax.jit(
        lambda v, g: move.segment_reduce(v, g.astype(jnp.int32), 4096,
                                         "sum", 0.0)),
        (f64, keys4k), 2 * 8 * nm, nm)

    # LAST: the hang-prone merge-sort gather (wedged session 2 at 4M;
    # try 1M with a hard deadline)
    idx = jax.device_put(rng.permutation(nm // 4).astype(np.int32))
    f64s = f64[:nm // 4]
    timed("take_gather_f64_1m", jax.jit(
        lambda v, i: move.gather_rows([v], i)), (f64s, idx),
        3 * 8 * (nm // 4), nm // 4, deadline=600)

    bank({"phase": "done", "total_s": round(time.time() - T_START, 1)})


if __name__ == "__main__":
    main()
