#!/usr/bin/env python
"""Headline benchmark: TPC-H Q1 (filter + project + hash aggregate +
order-by) rows/s on one chip, device-resident input.

Prints one JSON line PER RECORDED METRIC (ascending Q1 SF rungs, then
Q3); the LAST line is the headline (largest completed Q1 SF):
  {"metric": ..., "value": N, "unit": "rows/s", "vs_baseline": R}

vs_baseline = our rows/s divided by the reference engine's (pyarrow
Acero, all CPU threads) rows/s on the SAME generated data on this
host. The harness is built for a flaky tunneled device (docs/TUNNEL.md):
total wall budget (ARROW_TPU_BENCH_TOTAL_BUDGET, default 540 s), a
device-availability wait phase, ONE suite worker with no mid-budget
kills, and file-harvested worker stdout so completed rungs survive a
final budget kill.

Env knobs: ARROW_TPU_BENCH_SF (default 1.0), ARROW_TPU_BENCH_ITERS
(20), ARROW_TPU_BENCH_Q3[_SF], ARROW_TPU_BENCH_WAIT_DEVICE.
"""

import json
import os
import sys
import time


def bench_ours(lineitem, iters: int, device_gen_sf: float = 0.0) -> float:
    import jax

    from arrow_tpu.acero.exec import compile_chain
    from arrow_tpu.device.column import upload_table
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _q1_chain_decls

    if device_gen_sf > 0:
        # at-scale rungs generate the batch in HBM (io/tpch_device.py):
        # the SF1 ~770 MB upload has wedged the tunnel in every session
        # across rounds 1-4 (docs/TUNNEL.md)
        from arrow_tpu.io.tpch_device import q1_device_batch
        batch, _ = q1_device_batch(device_gen_sf)
    else:
        batch = upload_table(lineitem)
    fn = compile_chain(_q1_chain_decls())

    def checksum(out):
        # force a device->host readback of real result values:
        # jax.block_until_ready can return before execution completes on
        # the tunneled axon platform (measured: 0.1 ms "sorts" of 60M
        # rows), so every timed iteration must materialize output data.
        # One value from the final stage's output gates that whole
        # program (the transfer cannot complete before the producing
        # program writes the buffer).
        import numpy as np
        return float(np.asarray(out.columns[-1].values[:1])[0])

    # warmup / compile
    checksum(fn(batch))
    # Throughput protocol: enqueue `iters` full plan executions
    # back-to-back, then read back a value from the LAST iteration's
    # output. The TPU executes dispatched programs in order, so that
    # readback can only complete after every iteration ran; dividing by
    # `iters` amortizes the tunneled host<->device readback RTT (~27 ms
    # on axon) that would otherwise dominate a per-iteration sync.
    # (jax.block_until_ready alone is NOT a barrier on this platform —
    # only a data readback is; see docs/BENCHMARKS.md.)
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(batch)
    checksum(out)
    dt = (time.perf_counter() - t0) / iters
    import numpy as _np
    n_rows = int(_np.asarray(batch.row_count)) if device_gen_sf > 0 \
        else lineitem.num_rows
    return n_rows / dt


def bench_reference(lineitem, iters: int) -> float:
    """pyarrow Acero Q1 on the same data (reference engine, this host)."""
    try:
        import pyarrow as pa
        import pyarrow.acero  # noqa: F401
    except ImportError:
        return 0.0
    import datetime

    import pyarrow.acero as pacero
    import pyarrow.compute as ppc

    from arrow_tpu import ipc
    out = pa.ipc.open_stream(ipc.serialize_table(lineitem)).read_all()
    cols = []
    for name in out.column_names:
        c = out.column(name)
        if pa.types.is_dictionary(c.type):
            c = c.cast(pa.string())
        cols.append(c)
    pa_t = pa.table(cols, names=out.column_names).combine_chunks()

    f = ppc.field
    disc_price = ppc.multiply(f("l_extendedprice"),
                              ppc.subtract(ppc.scalar(1.0),
                                           f("l_discount")))
    charge = ppc.multiply(disc_price, ppc.add(ppc.scalar(1.0), f("l_tax")))

    def plan():
        return pacero.Declaration.from_sequence([
            pacero.Declaration("table_source",
                               pacero.TableSourceNodeOptions(pa_t)),
            pacero.Declaration("filter", pacero.FilterNodeOptions(
                ppc.less_equal(f("l_shipdate"),
                               ppc.scalar(datetime.date(1998, 9, 2))))),
            pacero.Declaration("project", pacero.ProjectNodeOptions(
                [f("l_returnflag"), f("l_linestatus"), f("l_quantity"),
                 f("l_extendedprice"), disc_price, charge,
                 f("l_discount")],
                ["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "disc_price", "charge",
                 "l_discount"])),
            pacero.Declaration("aggregate", pacero.AggregateNodeOptions(
                # full 8-aggregate Q1 (reference acero/tpch_benchmark.cc:39)
                [("l_quantity", "hash_sum", None, "sum_qty"),
                 ("l_extendedprice", "hash_sum", None, "sum_base_price"),
                 ("disc_price", "hash_sum", None, "sum_disc_price"),
                 ("charge", "hash_sum", None, "sum_charge"),
                 ("l_quantity", "hash_mean", None, "avg_qty"),
                 ("l_extendedprice", "hash_mean", None, "avg_price"),
                 ("l_discount", "hash_mean", None, "avg_disc"),
                 ("l_quantity", "hash_count", None, "count_order")],
                keys=["l_returnflag", "l_linestatus"])),
            pacero.Declaration("order_by", pacero.OrderByNodeOptions(
                [("l_returnflag", "ascending"),
                 ("l_linestatus", "ascending")])),
        ]).to_table()

    plan()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        plan()
    dt = (time.perf_counter() - t0) / iters
    return pa_t.num_rows / dt


def bench_q3(sf: float, iters: int):
    """Join+groupby (TPC-H Q3): ours on device vs pyarrow Acero."""
    import time as _t

    if sf >= 0.05:
        # device-side generation (no at-scale upload over the tunnel;
        # docs/TUNNEL.md) with sources pre-narrowed to Q3's columns
        from arrow_tpu.io.tpch_device import q3_device_plan
        plan, n = q3_device_plan(sf)
    else:
        from arrow_tpu.io import tpch, tpch_queries
        cust = tpch.customer_table(sf)
        orders = tpch.orders_table(sf)
        lineitem = tpch.lineitem_table(sf)
        n = lineitem.num_rows
        plan = tpch_queries.q3_plan(cust, orders, lineitem)
    plan.to_table()  # warmup/compile (joins re-plan per capacity bucket)
    t0 = _t.perf_counter()
    for _ in range(iters):
        plan.to_table()
    ours = n / ((_t.perf_counter() - t0) / iters)
    return ours, 0.0


def bench_q3_reference(sf: float, iters: int) -> float:
    """pyarrow Acero Q3 (joins + group-by + sort + top-10) on host-
    generated tables at the same SF distributions; returns rows/s of
    the lineitem side (scale-invariant comparison metric)."""
    try:
        import pyarrow as pa
        import pyarrow.acero as pacero
        import pyarrow.compute as ppc
    except ImportError:
        return 0.0
    import datetime
    import time as _t

    from arrow_tpu import ipc
    from arrow_tpu.io import tpch

    def to_pa(tbl):
        out = pa.ipc.open_stream(ipc.serialize_table(tbl)).read_all()
        cols = []
        for nm in out.column_names:
            c = out.column(nm)
            if pa.types.is_dictionary(c.type):
                c = c.cast(pa.string())
            cols.append(c)
        return pa.table(cols, names=out.column_names).combine_chunks()

    cust = to_pa(tpch.customer_table(sf))
    orders = to_pa(tpch.orders_table(sf))
    lineitem = to_pa(tpch.lineitem_table(sf))
    n = lineitem.num_rows
    f = ppc.field
    cutoff = ppc.scalar(datetime.date(1995, 3, 15))

    def plan():
        co = pacero.Declaration(
            "hashjoin", pacero.HashJoinNodeOptions(
                "inner", left_keys=["o_custkey"],
                right_keys=["c_custkey"], right_output=[]),
            inputs=[
                pacero.Declaration.from_sequence([
                    pacero.Declaration("table_source",
                                       pacero.TableSourceNodeOptions(
                                           orders)),
                    pacero.Declaration("filter",
                                       pacero.FilterNodeOptions(
                                           ppc.less(f("o_orderdate"),
                                                    cutoff)))]),
                pacero.Declaration.from_sequence([
                    pacero.Declaration("table_source",
                                       pacero.TableSourceNodeOptions(
                                           cust)),
                    pacero.Declaration("filter",
                                       pacero.FilterNodeOptions(
                                           ppc.equal(f("c_mktsegment"),
                                                     ppc.scalar(
                                                         "BUILDING"))))])])
        col = pacero.Declaration(
            "hashjoin", pacero.HashJoinNodeOptions(
                "inner", left_keys=["l_orderkey"],
                right_keys=["o_orderkey"],
                right_output=["o_orderdate", "o_shippriority"]),
            inputs=[
                pacero.Declaration.from_sequence([
                    pacero.Declaration("table_source",
                                       pacero.TableSourceNodeOptions(
                                           lineitem)),
                    pacero.Declaration("filter",
                                       pacero.FilterNodeOptions(
                                           ppc.greater(f("l_shipdate"),
                                                       cutoff)))]),
                co])
        out = pacero.Declaration.from_sequence([
            col,
            pacero.Declaration("project", pacero.ProjectNodeOptions(
                [f("l_orderkey"),
                 ppc.multiply(f("l_extendedprice"),
                              ppc.subtract(ppc.scalar(1.0),
                                           f("l_discount"))),
                 f("o_orderdate"), f("o_shippriority")],
                ["l_orderkey", "volume", "o_orderdate",
                 "o_shippriority"])),
            pacero.Declaration("aggregate", pacero.AggregateNodeOptions(
                [("volume", "hash_sum", None, "revenue")],
                keys=["l_orderkey", "o_orderdate", "o_shippriority"])),
            pacero.Declaration("order_by", pacero.OrderByNodeOptions(
                [("revenue", "descending"),
                 ("o_orderdate", "ascending")])),
        ]).to_table()
        return out.slice(0, 10)

    plan()  # warmup
    t0 = _t.perf_counter()
    for _ in range(iters):
        plan()
    return n / ((_t.perf_counter() - t0) / iters)


_READY_PROBE_SRC = """
import jax, numpy as np
d = jax.device_put(np.ones(1 << 17))
assert float(np.asarray(d[:1])[0]) == 1.0
print("DEVICE_READY")
"""


def _wait_device_ready(deadline_fn, probe_timeout=90.0, gap=45.0):
    """Poll the tunneled device with tiny put+readback probes until it
    responds or the budget share runs out. The tunnel serializes
    clients and holds the device for minutes after a client dies
    mid-transfer (measured round 3) — burning ladder attempts against a
    held device records nothing, waiting does."""
    import subprocess
    while True:
        left = deadline_fn()
        if left <= probe_timeout:
            return False
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _READY_PROBE_SRC],
                capture_output=True, text=True,
                timeout=min(probe_timeout, left), start_new_session=True)
            if "DEVICE_READY" in proc.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if deadline_fn() <= gap:
            return False
        time.sleep(gap)


def _spawn_worker(env, timeout):
    """Run one measurement attempt in a child process group with a hard
    deadline. Returns (json_lines, err). The whole group is SIGKILLed
    on timeout, but stdout goes through a FILE so every metric line the
    worker printed BEFORE hanging is harvested — a final kill can no
    longer erase banked results (round-3 lesson: the tunnel hangs
    mid-session and holds the device for minutes after any kill, so
    partial results are often all there is)."""
    import signal
    import subprocess
    import tempfile
    with tempfile.TemporaryFile(mode="w+t") as out_f, \
            tempfile.TemporaryFile(mode="w+t") as err_f:
        proc = subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__)], env=env,
            stdout=out_f, stderr=err_f, text=True,
            start_new_session=True)
        err = None
        try:
            proc.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except OSError:
                pass
            proc.wait()
            err = f"timeout after {timeout:g}s (device wedged?)"
        out_f.seek(0)
        lines = [ln for ln in out_f.read().splitlines()
                 if ln.startswith("{")]
        if err is None and proc.returncode != 0:
            err_f.seek(0)
            tail = (err_f.read().strip().splitlines() or ["no output"])
            err = tail[-1][:200]
        return lines, err


def main():
    """Watchdog wrapper with a TOTAL wall-clock budget and an SF
    fallback ladder.

    Round-2 failure mode (VERDICT.md weak #2): per-attempt timeouts
    multiplied past the driver's own budget, so when the device wedged
    the outer process was killed before the honest error record ever
    printed. This version budgets TOTAL time (default 540 s), sizes
    each attempt to the remaining budget, steps the scale factor down
    (SF -> SF/10 -> SF/100) when attempts fail, and ALWAYS prints the
    final JSON line with time to spare. Extra recorded rows (Q3, and
    Q1 at fallback SFs) print as earlier JSON lines; the LAST line is
    the headline record the driver parses."""
    if os.environ.get("ARROW_TPU_BENCH_WORKER") == "1":
        return _run()
    t_start = time.perf_counter()
    total = float(os.environ.get("ARROW_TPU_BENCH_TOTAL_BUDGET", "540"))
    reserve = 10.0  # seconds kept back for printing/teardown

    def remaining():
        return total - (time.perf_counter() - t_start) - reserve

    sf0 = float(os.environ.get("ARROW_TPU_BENCH_SF", "1.0"))
    ladder = [sf0]
    while ladder[-1] / 10 >= 0.0099:
        ladder.append(ladder[-1] / 10)

    errors = []
    # phase 0: wait for the tunnel to actually serve a client (up to
    # ~40% of budget) — a held device makes every attempt a dead loss
    if os.environ.get("ARROW_TPU_BENCH_WAIT_DEVICE", "on") != "off":
        share = total * 0.4

        def wait_left():
            return min(remaining(), share - (time.perf_counter()
                                             - t_start))
        if not _wait_device_ready(wait_left):
            errors.append("device busy/held throughout wait window")

    # ONE worker runs the whole suite (ascending Q1 rungs, then Q3) in
    # a single process, printing each metric line as it completes. The
    # outer watchdog never kills-and-retries mid-budget — measured
    # round 3: the tunnel serializes clients and any kill leaves the
    # device held for ~10 minutes, so retries always lose. If the
    # worker hangs, the final kill still harvests every line it
    # printed before hanging.
    env = dict(os.environ, ARROW_TPU_BENCH_WORKER="1",
               ARROW_TPU_BENCH_SUITE="1")
    lines, err = _spawn_worker(env, max(remaining(), 30.0))
    if err:
        errors.append(err)

    q1_lines = [ln for ln in lines if '"metric": "tpch_q1' in ln]
    other = [ln for ln in lines if ln not in q1_lines]
    for ln in other + q1_lines[:-1]:
        print(ln)
    if q1_lines:
        print(q1_lines[-1])  # largest completed SF = headline, LAST
    else:
        print(json.dumps({
            "metric": f"tpch_q1_sf{sf0:g}_rows_per_s",
            "value": 0.0, "unit": "rows/s", "vs_baseline": 0.0,
            "error": "; ".join(errors)[:400],
        }))


def _emit_q1(sf: float, iters: int) -> None:
    from arrow_tpu.io import tpch
    if sf >= 0.5:
        # device-generated batch; pyarrow baseline on an SF/10 host
        # table (pyarrow rows/s is scale-invariant here), marked ref_sf
        ref_tbl = tpch.lineitem_table(sf / 10)
        ours = bench_ours(None, iters, device_gen_sf=sf)
        ref = bench_reference(ref_tbl, max(iters // 4, 1))
        vs = (ours / ref) if ref > 0 else 0.0
        print(json.dumps({
            "metric": f"tpch_q1_sf{sf:g}_rows_per_s",
            "value": round(ours, 1),
            "unit": "rows/s",
            "vs_baseline": round(vs, 3),
            "gen": "device", "ref_sf": sf / 10,
        }), flush=True)
        return
    lineitem = tpch.lineitem_table(sf)
    ours = bench_ours(lineitem, iters)
    ref = bench_reference(lineitem, max(iters // 2, 1))
    vs = (ours / ref) if ref > 0 else 0.0
    print(json.dumps({
        "metric": f"tpch_q1_sf{sf:g}_rows_per_s",
        "value": round(ours, 1),
        "unit": "rows/s",
        "vs_baseline": round(vs, 3),
    }), flush=True)


def _run_suite():
    """Worker suite mode: ascending Q1 rungs then Q3, ONE process, one
    metric line printed (and flushed) the moment each completes."""
    sf0 = float(os.environ.get("ARROW_TPU_BENCH_SF", "1.0"))
    iters = int(os.environ.get("ARROW_TPU_BENCH_ITERS", "20"))
    # ascending insurance ladder: tiny rung completes in ~1 min with a
    # warm compile cache and guarantees a nonzero record before the
    # flaky-tunnel rungs are attempted
    rungs = [sf for sf in (sf0 / 100, sf0 / 10, sf0) if sf >= 0.005]
    if not rungs:
        rungs = [sf0]
    for i, sf in enumerate(rungs):
        _emit_q1(sf, max(iters // 2, 5) if i < len(rungs) - 1 else iters)
    # Q3 rung: ON by default since round 5 — the column-pruned join
    # plans plus device-side table generation compile and run on the
    # tunneled chip (CHIP_SESSION_r05.jsonl; the round-4 wedge was the
    # >6-operand sorts in the 16-column materialize program, removed by
    # acero/prune.py). Disable with ARROW_TPU_BENCH_Q3=off.
    if os.environ.get("ARROW_TPU_BENCH_Q3", "on") == "on":
        q3_sf = float(os.environ.get("ARROW_TPU_BENCH_Q3_SF", "0.1"))
        ours, _ = bench_q3(q3_sf, max(iters // 2, 5))
        ref_sf = min(q3_sf, 0.1)
        try:
            ref = bench_q3_reference(ref_sf, 3)
        except Exception:  # noqa: BLE001 - baseline is best-effort
            ref = 0.0
        print(json.dumps({
            "metric": f"tpch_q3_sf{q3_sf:g}_rows_per_s",
            "value": round(ours, 1), "unit": "rows/s",
            "vs_baseline": round(ours / ref, 3) if ref else 0.0,
            "ref_sf": ref_sf,
        }), flush=True)


def _run():
    # persistent compile cache: chip sessions pre-warm every rung's
    # program in .jax_cache (233 MB after CHIP_SESSION_r05), turning
    # the driver's cold-process Q1/Q3 compiles from minutes into reads
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
    except Exception:  # noqa: BLE001 - cache is an optimization
        pass
    if os.environ.get("ARROW_TPU_BENCH_PLATFORM") == "cpu":
        # the axon plugin overrides JAX_PLATFORMS, so force via config
        # (same dance as tests/conftest.py) — used for harness testing
        jax.config.update("jax_platforms", "cpu")
    if os.environ.get("ARROW_TPU_BENCH_SUITE") == "1":
        return _run_suite()
    sf = float(os.environ.get("ARROW_TPU_BENCH_SF", "1.0"))
    iters = int(os.environ.get("ARROW_TPU_BENCH_ITERS", "20"))
    query = os.environ.get("ARROW_TPU_BENCH_QUERY", "q1")

    if query == "q3":
        ours, _ = bench_q3(sf, iters)
        print(json.dumps({
            "metric": f"tpch_q3_sf{sf:g}_rows_per_s",
            "value": round(ours, 1), "unit": "rows/s",
            "vs_baseline": 0.0,
        }))
        return

    from arrow_tpu.io import tpch
    lineitem = tpch.lineitem_table(sf)

    ours = bench_ours(lineitem, iters)
    ref = bench_reference(lineitem, max(iters // 2, 1))
    vs = (ours / ref) if ref > 0 else 0.0
    print(json.dumps({
        "metric": f"tpch_q1_sf{sf:g}_rows_per_s",
        "value": round(ours, 1),
        "unit": "rows/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
