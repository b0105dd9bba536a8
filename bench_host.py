#!/usr/bin/env python
"""Host-side format/kernel microbenchmarks (reference protocol:
csv/parser_benchmark.cc, parquet reader_writer_benchmark.cc,
ipc/read_write_benchmark.cc, scalar_temporal/string benchmarks —
SURVEY §6). Prints one JSON line per metric; pyarrow rows are the
on-host oracle where applicable. Runs on CPU (forces jax_platforms).
"""

import json
import os
import time


def _bench(name, fn, unit_bytes=None, unit_rows=None, iters=3):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    dt = (time.perf_counter() - t0) / iters
    rec = {"metric": name, "ms": round(dt * 1e3, 1)}
    if unit_bytes:
        rec["mb_s"] = round(unit_bytes / dt / 1e6, 1)
    if unit_rows:
        rec["rows_per_s"] = round(unit_rows / dt, 1)
    print(json.dumps(rec), flush=True)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import arrow_tpu as at
    import arrow_tpu.compute as pc

    n = 1_000_000
    rng = np.random.default_rng(0)
    tmp = "/tmp/at_bench_host"
    os.makedirs(tmp, exist_ok=True)

    t = at.table({
        "a": at.array(rng.integers(0, 1 << 40, n)),
        "b": at.array(rng.normal(size=n)),
        "c": at.array(rng.integers(0, 1000, n).astype(np.int32)),
        "d": at.array([f"s{i % 5000}" for i in range(n)]),
    })

    # ---- IPC ----
    from arrow_tpu import ipc
    blob = ipc.serialize_table(t)
    _bench("ipc_write_1m", lambda: ipc.serialize_table(t), len(blob))
    import io as _io
    _bench("ipc_read_1m",
           lambda: ipc.open_stream(_io.BytesIO(blob)).read_all(),
           len(blob))

    # ---- Parquet ----
    from arrow_tpu.io import parquet as apq
    pq_path = os.path.join(tmp, "t.parquet")
    apq.write_table(t, pq_path)
    sz = os.path.getsize(pq_path)
    _bench("parquet_write_1m", lambda: apq.write_table(t, pq_path), sz)
    _bench("parquet_read_1m", lambda: apq.read_table(pq_path), sz)

    # ---- CSV ----
    from arrow_tpu.io import csv as acsv
    csv_path = os.path.join(tmp, "t.csv")
    acsv.write_csv(t, csv_path)
    szc = os.path.getsize(csv_path)
    _bench("csv_write_1m", lambda: acsv.write_csv(t, csv_path), szc)
    _bench("csv_read_1m", lambda: acsv.read_csv(csv_path), szc)

    # ---- JSON ----
    from arrow_tpu.io import json as ajson
    rows = []
    for i in range(300_000):
        rows.append(json.dumps({"a": i, "b": i * 1.5,
                                "s": f"v{i % 97}"}))
    data = ("\n".join(rows) + "\n").encode()
    _bench("json_read_300k", lambda: ajson.read_json(data), len(data))

    # ---- ORC ----
    try:
        from arrow_tpu.io import orc as aorc
        orc_path = os.path.join(tmp, "t.orc")
        aorc.write_table(t, orc_path)
        szo = os.path.getsize(orc_path)
        _bench("orc_write_1m", lambda: aorc.write_table(t, orc_path),
               szo)
        _bench("orc_read_1m", lambda: aorc.read_table(orc_path), szo)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"metric": "orc", "error": str(e)[:120]}))

    # ---- hot host kernels ----
    ts_vals = (np.arange(n, dtype=np.int64) * 1_001_001
               + 946_684_800_000_000)
    from arrow_tpu.array.data import ArrayData
    from arrow_tpu.buffer import Buffer
    ts = at.Array(ArrayData(at.timestamp("us"), n,
                            [None, Buffer(ts_vals)], null_count=0))
    _bench("strftime_1m", lambda: pc.strftime(
        ts, format="%Y-%m-%dT%H:%M:%S"), unit_rows=n)
    s = pc.strftime(ts, format="%Y-%m-%dT%H:%M:%S")
    _bench("strptime_1m", lambda: pc.strptime(
        s, format="%Y-%m-%dT%H:%M:%S", unit="us"), unit_rows=n)
    _bench("split_pattern_1m", lambda: pc.split_pattern(
        t.column("d").combine(), pattern="s"), unit_rows=n)

    # pyarrow oracle rows for context
    try:
        import pyarrow.parquet as ppq
        _bench("pyarrow_parquet_read_1m",
               lambda: ppq.read_table(pq_path), sz)
        import pyarrow.csv as pcsv
        _bench("pyarrow_csv_read_1m", lambda: pcsv.read_csv(csv_path),
               szc)
    except Exception:  # noqa: BLE001
        pass


if __name__ == "__main__":
    main()
