"""Multi-page Parquet column chunks (data_page_size) + per-page index.

Reference: parquet/properties.h kDefaultDataPageSize (1 MiB),
parquet/page_index.h ColumnIndex/OffsetIndex one entry per data page.
"""

import io

import pytest

import arrow_tpu as at
from arrow_tpu.io.parquet import ParquetFile, read_table, write_table

N = 300_000


def _table():
    return at.table({
        "a": at.array(list(range(N)), at.int64()),
        "s": at.array([f"val{i % 50}" for i in range(N)], at.string()),
    })


def test_multiple_pages_written():
    buf = io.BytesIO()
    write_table(_table(), buf)  # default 1 MiB page budget
    pf = ParquetFile(buf.getvalue())
    oi = pf.offset_index(0, 0)
    assert len(oi) >= 2            # int64 column split into pages
    # offsets ascending, first_row_index ascending from 0
    assert oi[0][2] == 0
    assert all(oi[i][0] < oi[i + 1][0] for i in range(len(oi) - 1))
    assert all(oi[i][2] < oi[i + 1][2] for i in range(len(oi) - 1))
    # per-page column index stats are disjoint ascending ranges
    null_pages, mins, maxs, nulls = pf.column_index(0, 0)
    assert len(mins) == len(oi)
    assert mins[0] == 0 and maxs[-1] == N - 1
    assert all(mins[i + 1] == maxs[i] + 1 for i in range(len(mins) - 1))


def test_multipage_roundtrip_and_pyarrow():
    t = _table()
    buf = io.BytesIO()
    write_table(t, buf)
    got = read_table(buf.getvalue())
    assert got.column("a").to_pylist() == list(range(N))
    assert got.column("s").to_pylist()[:3] == ["val0", "val1", "val2"]
    papq = pytest.importorskip("pyarrow.parquet")
    pt = papq.read_table(io.BytesIO(buf.getvalue()))
    assert pt.column("a").to_pylist() == list(range(N))
    assert pt.column("s").to_pylist()[-1] == f"val{(N - 1) % 50}"


def test_single_page_opt_out():
    buf = io.BytesIO()
    from arrow_tpu.io.parquet import ParquetWriter
    t = _table()
    with ParquetWriter(buf, t.schema, data_page_size=None) as w:
        w.write_table(t)
    pf = ParquetFile(buf.getvalue())
    assert len(pf.offset_index(0, 0)) == 1
    assert pf.read().column("a").to_pylist()[:3] == [0, 1, 2]


def test_encrypted_multipage():
    from arrow_tpu.io.parquet.encryption import (FileDecryptionProperties,
                                                 FileEncryptionProperties)
    key = b"0123456789112345"
    buf = io.BytesIO()
    write_table(_table(), buf,
                encryption_properties=FileEncryptionProperties(key))
    got = read_table(buf.getvalue(),
                     decryption_properties=FileDecryptionProperties(
                         footer_key=key))
    assert got.column("a").to_pylist() == list(range(N))


def test_small_page_size_many_pages():
    t = at.table({"x": at.array(list(range(10_000)), at.int32())})
    buf = io.BytesIO()
    from arrow_tpu.io.parquet import ParquetWriter
    with ParquetWriter(buf, t.schema, data_page_size=4096) as w:
        w.write_table(t)
    pf = ParquetFile(buf.getvalue())
    assert len(pf.offset_index(0, 0)) == 10   # 1024 rows/page
    assert pf.read().column("x").to_pylist() == list(range(10_000))


def test_read_range_coalescing():
    """io/caching.h analogue: coalesce_ranges + pre_buffer."""
    from arrow_tpu.io.caching import (CacheOptions, ReadRangeCache,
                                      coalesce_ranges)
    assert coalesce_ranges([(0, 10), (15, 10), (100000, 5)]) == \
        [(0, 25), (100000, 5)]
    assert coalesce_ranges([(0, 10), (9000, 10)],
                           hole_size_limit=100) == [(0, 10), (9000, 10)]
    assert coalesce_ranges([]) == []
    src = io.BytesIO(bytes(range(256)) * 10)
    c = ReadRangeCache(src, CacheOptions())
    c.cache([(0, 16), (20, 16)])
    assert c.read(4, 4) == bytes(range(4, 8))
    assert c.read(2000, 4) == (bytes(range(256)) * 10)[2000:2004]


def test_parquet_pre_buffer_single_read():
    t = at.table({"a": at.array(list(range(50_000)), at.int64()),
                  "c": at.array([float(i) for i in range(50_000)],
                                at.float64())})
    buf = io.BytesIO()
    write_table(t, buf)

    class CountingIO(io.BytesIO):
        reads = 0

        def read(self, *a):
            CountingIO.reads += 1
            return super().read(*a)

    src = CountingIO(buf.getvalue())
    pf = ParquetFile(src)
    CountingIO.reads = 0
    got = pf.read(pre_buffer=True)
    assert CountingIO.reads == 1   # one coalesced read for all chunks
    assert got.column("a").to_pylist()[:3] == [0, 1, 2]
    assert got.column("c").to_pylist()[-1] == 49_999.0


def test_native_page_walker_shapes():
    """The whole-chunk native decode (pq_scan_pages + pq_decode_flat)
    must agree with pyarrow across page versions, codecs, null
    densities and dictionary fallback (reader.py _read_chunk_fast;
    reference: parquet/column_reader.cc page loop)."""
    import io
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as papq
    from arrow_tpu.io import parquet as apq

    rng = np.random.default_rng(5)
    n = 40_000
    base = {
        "i64": rng.integers(-10**12, 10**12, n),
        "i32": rng.integers(-50, 50, n).astype(np.int32),
        "f64": rng.normal(size=n),
        "f32": rng.normal(size=n).astype(np.float32),
        "dictable": rng.integers(0, 8, n),
    }
    nulls = rng.random(n) < 0.3
    cols = {}
    for k, v in base.items():
        cols[k] = pa.array(v)
        cols[k + "_null"] = pa.array(
            np.ma.masked_array(v, mask=nulls))
    t = pa.table(cols)
    for version in ("1.0", "2.0"):
        for codec in ("snappy", "none"):
            buf = io.BytesIO()
            papq.write_table(t, buf, compression=codec,
                             data_page_version=version,
                             data_page_size=64 * 1024)
            data = buf.getvalue()
            ours = pa.table(apq.read_table(io.BytesIO(data)))
            ref = papq.read_table(io.BytesIO(data))
            for nm in t.schema.names:
                a = ours.column(nm).to_pandas()
                b = ref.column(nm).to_pandas()
                import pandas.testing as pdt
                pdt.assert_series_equal(a, b, check_names=False), \
                    (version, codec, nm)
