"""Parquet differential tests vs pyarrow.parquet."""

import datetime
import decimal
import io

import numpy as np
import pyarrow as pa
import pyarrow.parquet as papq
import pytest

import arrow_tpu as at
from arrow_tpu.array.array import pylist_equal
from arrow_tpu.io import parquet as pq


def ours_to_bytes(t, **kw) -> bytes:
    buf = io.BytesIO()
    pq.write_table(t, buf, **kw)
    return buf.getvalue()


def pa_to_bytes(pt, **kw) -> bytes:
    sink = pa.BufferOutputStream()
    papq.write_table(pt, sink, **kw)
    return sink.getvalue().to_pybytes()


BASE = {
    "i64": [1, None, 3, -9],
    "f64": [1.5, 2.5, None, float("nan")],
    "f32": at.array([0.5, None, 2.0, 3.0], at.float32()),
    "s": ["aa", None, "", "ddd"],
    "b": [True, False, None, True],
    "i32": at.array([7, None, -2, 0], at.int32()),
    "bin": at.array([b"\x00\x01", None, b"", b"xyz"], at.binary()),
}


def test_roundtrip_and_pyarrow_reads_ours():
    t = at.table(BASE)
    data = ours_to_bytes(t)
    assert pq.read_table(data).equals(t)
    pa_t = papq.read_table(pa.BufferReader(data))
    assert pylist_equal(pa_t.to_pylist(), t.to_pylist())


def test_ours_reads_pyarrow_default():
    t = at.table(BASE)
    pa_t = pa.table(t.to_pydict())
    ours = pq.read_table(pa_to_bytes(pa_t, compression="none"))
    assert pylist_equal(ours.to_pylist(), t.to_pylist())


@pytest.mark.parametrize("compression", ["none", "zstd"])
@pytest.mark.parametrize("use_dictionary", [True, False])
def test_pyarrow_write_options_matrix(compression, use_dictionary):
    t = at.table({"x": list(range(100)),
                  "s": [f"v{i % 9}" for i in range(100)]})
    pa_t = pa.table(t.to_pydict())
    data = pa_to_bytes(pa_t, compression=compression,
                       use_dictionary=use_dictionary)
    assert pq.read_table(data).equals(t)


@pytest.mark.parametrize("compression", [None, "zstd"])
@pytest.mark.parametrize("use_dictionary", [True, False])
def test_our_write_options_matrix(compression, use_dictionary):
    t = at.table({"x": list(range(100)),
                  "s": [f"v{i % 9}" for i in range(100)]})
    data = ours_to_bytes(t, compression=compression,
                         use_dictionary=use_dictionary)
    assert pq.read_table(data).equals(t)
    pa_t = papq.read_table(pa.BufferReader(data))
    assert pa_t.to_pydict() == t.to_pydict()


def test_temporal_decimal_types():
    t = at.table({
        "d": at.array([datetime.date(2021, 5, 4), None]),
        "ts": at.array([datetime.datetime(2020, 1, 2, 3, 4, 5), None],
                       at.timestamp("us")),
        "dec": at.array([decimal.Decimal("12.34"), None],
                        at.decimal128(9, 2)),
    })
    data = ours_to_bytes(t)
    back = pq.read_table(data)
    assert back.column("d").to_pylist() == t.column("d").to_pylist()
    assert back.column("ts").to_pylist() == t.column("ts").to_pylist()
    assert back.column("dec").to_pylist() == t.column("dec").to_pylist()
    pa_t = papq.read_table(pa.BufferReader(data))
    assert pa_t.column("d").to_pylist() == t.column("d").to_pylist()
    assert pa_t.column("dec").to_pylist() == t.column("dec").to_pylist()

    # read pyarrow's temporal file
    pd = pa.table({"d": pa.array([datetime.date(1999, 1, 1), None]),
                   "ts": pa.array([datetime.datetime(2000, 6, 1), None],
                                  type=pa.timestamp("ms"))})
    ours = pq.read_table(pa_to_bytes(pd, compression="none"))
    assert ours.column("d").to_pylist() == pd.column("d").to_pylist()
    assert ours.column("ts").to_pylist() == pd.column("ts").to_pylist()


def test_row_groups_and_column_selection():
    t = at.table({"x": list(range(1000)),
                  "y": [float(i) for i in range(1000)]})
    data = ours_to_bytes(t, row_group_size=300)
    f = pq.ParquetFile(data)
    assert f.num_row_groups == 4
    assert f.num_rows == 1000
    sel = f.read(columns=["y"])
    assert sel.column_names == ["y"]
    assert sel.num_rows == 1000
    # pyarrow respects our row groups
    pf = papq.ParquetFile(pa.BufferReader(data))
    assert pf.num_row_groups == 4
    assert pf.read_row_group(1).to_pydict()["x"][:3] == [300, 301, 302]
    # read a multi-row-group pyarrow file
    pa_t = pa.table(t.to_pydict())
    data2 = pa_to_bytes(pa_t, row_group_size=300, compression="none")
    assert pq.read_table(data2).equals(t)


def test_metadata_surface():
    t = at.table({"x": [1]})
    f = pq.ParquetFile(ours_to_bytes(t))
    assert f.schema_arrow.names == ["x"]
    assert "arrow_tpu" in f.created_by


def test_brotli_now_supported():
    """brotli was unsupported; the system-libbrotli binding reads it."""
    pa_t = pa.table({"x": [1, 2, 3]})
    data = pa_to_bytes(pa_t, compression="brotli")
    assert pq.read_table(data).column("x").to_pylist() == [1, 2, 3]
    with pytest.raises((NotImplementedError, KeyError)):
        # LZO remains unsupported (no system codec)
        from arrow_tpu.io.parquet.reader import _decompress
        _decompress(3, b"xx", 10)


def test_randomized_large():
    rng = np.random.default_rng(11)
    n = 5000
    mask = rng.random(n) < 0.2
    t = at.table({
        "i": [None if m else int(v)
              for m, v in zip(mask, rng.integers(-10**9, 10**9, n))],
        "f": [float(v) for v in rng.normal(size=n)],
        "s": [None if m else f"str{int(v)}"
              for m, v in zip(rng.random(n) < 0.1,
                              rng.integers(0, 500, n))],
    })
    for comp in [None, "zstd"]:
        data = ours_to_bytes(t, compression=comp)
        assert pq.read_table(data).equals(t)
        pa_t = papq.read_table(pa.BufferReader(data))
        assert pylist_equal(pa_t.to_pylist(), t.to_pylist())
    data = pa_to_bytes(pa.table(t.to_pydict()), compression="zstd")
    assert pq.read_table(data).equals(t)


def test_pyarrow_default_snappy_guarded():
    # pyarrow defaults to snappy; the native codec now reads it
    data = pa_to_bytes(pa.table({"x": [1]}))
    assert pq.read_table(data).to_pydict() == {"x": [1]}


def test_nested_parquet_roundtrip_both_directions():
    """Nested columns (Dremel def/rep levels): our writer <-> pyarrow
    (reference: parquet/arrow/path_internal.cc)."""
    import io
    data = {"l": [[1, 2], None, [], [3, None]],
            "s": [{"a": 1, "b": "x"}, None, {"a": None, "b": "y"},
                  {"a": 4, "b": "z"}],
            "ls": [[{"u": 1.5}], None, [], [{"u": None}, {"u": 2.5}]],
            "ll": [[[1], []], None, [None, [2, 3]], []],
            "flat": [10, 20, 30, 40]}
    schema = at.schema([
        at.field("l", at.list_(at.int64())),
        at.field("s", at.struct([("a", at.int64()), ("b", at.string())])),
        at.field("ls", at.list_(at.struct([("u", at.float64())]))),
        at.field("ll", at.list_(at.list_(at.int64()))),
        at.field("flat", at.int64())])
    t = at.table(data, schema=schema)

    buf = io.BytesIO()
    pq.write_table(t, buf)
    raw = buf.getvalue()
    assert pq.read_table(io.BytesIO(raw)).to_pydict() == data
    import pyarrow.parquet as ppq
    assert ppq.read_table(io.BytesIO(raw)).to_pydict() == data

    pab = io.BytesIO()
    ppq.write_table(pa.table(data), pab, compression="none")
    assert pq.read_table(io.BytesIO(pab.getvalue())).to_pydict() == data


def test_nested_parquet_string_lists_zstd():
    import io
    data = {"tags": [["red", "blue"], [], None, ["x" * 40]],
            "n": [1, 2, 3, 4]}
    t = at.table(data, schema=at.schema([
        at.field("tags", at.list_(at.string())),
        at.field("n", at.int64())]))
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="zstd")
    back = pq.read_table(io.BytesIO(buf.getvalue()))
    assert back.to_pydict() == data
    import pyarrow.parquet as ppq
    assert ppq.read_table(io.BytesIO(buf.getvalue())).to_pydict() == data


def test_statistics_and_filters():
    """Row-group statistics + predicate pushdown (reference:
    parquet/metadata.h Statistics, arrow's read filters)."""
    import io
    t1 = at.table({"a": [1, 2, 3, 4], "s": ["w", "x", "y", "z"]})
    t2 = at.table({"a": [100, 200, 300, 400], "s": ["p", "q", "r", "s"]})
    buf = io.BytesIO()
    w = pq.ParquetWriter(buf, t1.schema)
    w.write_table(t1)
    w.write_table(t2)
    w.close()
    raw = buf.getvalue()

    pf = pq.ParquetFile(io.BytesIO(raw))
    assert pf.statistics(0)["a"] == (1, 4, 0)
    assert pf.statistics(1)["s"] == ("p", "s", 0)

    # pruning: only rg1 may match a>150
    assert pf._row_group_may_match(0, [("a", ">", 150)]) is False
    assert pf._row_group_may_match(1, [("a", ">", 150)]) is True

    out = pq.read_table(io.BytesIO(raw), filters=[("a", ">", 150)])
    assert out.to_pydict() == {"a": [200, 300, 400], "s": ["q", "r", "s"]}
    dnf = pq.read_table(io.BytesIO(raw),
                        filters=[[("a", "<", 3)], [("s", "=", "r")]])
    assert dnf.to_pydict() == {"a": [1, 2, 300], "s": ["w", "x", "r"]}


def test_statistics_pyarrow_trusts_min_max():
    import io
    t = at.table({"a": [3, None, 7], "s": ["m", "a", None]})
    buf = io.BytesIO()
    pq.write_table(t, buf)
    import pyarrow.parquet as ppq
    md = ppq.ParquetFile(io.BytesIO(buf.getvalue())).metadata
    st_a = md.row_group(0).column(0).statistics
    assert (st_a.min, st_a.max, st_a.null_count) == (3, 7, 1)
    st_s = md.row_group(0).column(1).statistics
    assert (st_s.min, st_s.max, st_s.null_count) == ("a", "m", 1)


def test_page_index_both_directions():
    """ColumnIndex/OffsetIndex (parquet page_index.h)."""
    import io
    t = at.table({"a": [1, 5, None], "s": ["m", "a", "z"]})
    buf = io.BytesIO()
    pq.write_table(t, buf)
    raw = buf.getvalue()
    import pyarrow.parquet as ppq
    c0 = ppq.ParquetFile(io.BytesIO(raw)).metadata.row_group(0).column(0)
    assert c0.has_column_index and c0.has_offset_index
    assert ppq.read_table(io.BytesIO(raw)).to_pydict() == t.to_pydict()
    # our reader decodes our own indexes
    pf = pq.ParquetFile(io.BytesIO(raw))
    nulls, mins, maxs, ncounts = pf.column_index(0, 0)
    assert (nulls, mins, maxs, ncounts) == ([False], [1], [5], [1])
    assert pf.offset_index(0, 0)[0][2] == 0
    # and pyarrow's
    pbuf = io.BytesIO()
    ppq.write_table(pa.table(t.to_pydict()), pbuf, write_page_index=True,
                    compression="none")
    pf2 = pq.ParquetFile(io.BytesIO(pbuf.getvalue()))
    assert pf2.column_index(0, 0) == ([False], [1], [5], [1])
    assert len(pf2.offset_index(0, 0)) == 1


def test_snappy_parquet_interop():
    """Snappy (pyarrow's DEFAULT parquet codec) via the native C++ codec
    (util/compression_snappy.cc analogue)."""
    import io
    import numpy as np
    import pyarrow.parquet as ppq
    rng = np.random.default_rng(5)
    data = {"a": rng.integers(0, 1000, 5000).tolist(),
            "s": [f"val{int(v) % 100}" for v in rng.integers(0, 10**6, 5000)]}
    # pyarrow default (snappy) -> us
    buf = io.BytesIO()
    ppq.write_table(pa.table(data), buf)
    assert ppq.ParquetFile(io.BytesIO(buf.getvalue())).metadata \
        .row_group(0).column(0).compression == "SNAPPY"
    assert pq.read_table(io.BytesIO(buf.getvalue())).to_pydict() == data
    # us (snappy) -> pyarrow
    b2 = io.BytesIO()
    pq.write_table(at.table(data), b2, compression="snappy")
    assert ppq.read_table(io.BytesIO(b2.getvalue())).to_pydict() == data


def test_snappy_codec_roundtrip_native():
    import numpy as np
    from arrow_tpu.native import snappy_compress, snappy_decompress
    rng = np.random.default_rng(0)
    for c in (b"", b"x", b"ab" * 5000,
              bytes(rng.integers(0, 256, 70000, dtype=np.uint8))):
        assert snappy_decompress(snappy_compress(c), len(c)) == c
    import pytest
    with pytest.raises(ValueError):
        snappy_decompress(b"\xff\xff\xff\xff", 100)


def test_bloom_filter_write_read_prune():
    """SBBF bloom filters (parquet/bloom_filter.h): xxhash64-based,
    written per chunk, used to prune row groups for = / in filters."""
    import io
    t3 = at.table({"a": [1, 5, 9], "s": ["aa", "bb", "cc"]})
    t4 = at.table({"a": [2, 6, 10], "s": ["dd", "ee", "ff"]})
    buf = io.BytesIO()
    # blooms are opt-in since round 5 (pyarrow's writer default too)
    w = pq.ParquetWriter(buf, t3.schema, write_bloom_filters=True)
    w.write_table(t3)
    w.write_table(t4)
    w.close()
    raw = buf.getvalue()
    pf = pq.ParquetFile(io.BytesIO(raw))
    bf = pf.bloom_filter(0, 0)
    from arrow_tpu.io.parquet.bloom import hash_value
    from arrow_tpu.io.parquet.reader import BYTE_ARRAY, INT64
    assert bf.check_hash(hash_value(1, INT64))
    assert not bf.check_hash(hash_value(6, INT64))
    sbf = pf.bloom_filter(0, 1)
    assert sbf.check_hash(hash_value("aa", BYTE_ARRAY))
    assert not sbf.check_hash(hash_value("zz", BYTE_ARRAY))
    # value inside rg0's min/max but absent -> bloom prunes it
    assert pf._row_group_may_match(0, [("a", "=", 6)]) is False
    assert pf._row_group_may_match(1, [("a", "=", 6)]) is True
    out = pq.read_table(io.BytesIO(raw), filters=[("a", "=", 6)])
    assert out.to_pydict() == {"a": [6], "s": ["ee"]}
    # pyarrow unaffected by the extra structures
    import pyarrow.parquet as ppq
    assert ppq.read_table(io.BytesIO(raw)).num_rows == 6
    # opt-out
    b2 = io.BytesIO()
    w2 = pq.ParquetWriter(b2, t3.schema, write_bloom_filters=False)
    w2.write_table(t3)
    w2.close()
    assert pq.ParquetFile(io.BytesIO(b2.getvalue())).bloom_filter(
        0, 0) is None


def test_bloom_fpp():
    from arrow_tpu.io.parquet.bloom import (SplitBlockBloomFilter,
                                            xxhash64_u64)
    import numpy as np
    bf = SplitBlockBloomFilter.for_ndv(1000)
    hs = xxhash64_u64(np.arange(1000, dtype=np.uint64))
    for h in hs:
        bf.insert_hash(int(h))
    assert all(bf.check_hash(int(h)) for h in hs)  # no false negatives
    probe = xxhash64_u64(np.arange(10_000, 20_000, dtype=np.uint64))
    fp = sum(bf.check_hash(int(h)) for h in probe)
    assert fp < 400  # ~1-2% fpp at this sizing


# --- metadata introspection (metadata.py vs parquet/metadata.h) -------------


class TestParquetMetadata:
    def _file(self):
        import io
        t = at.table({"a": [1, 2, 3, 4], "s": ["x", "y", None, "w"],
                      "p": [1, 1, 2, 2]})
        buf = io.BytesIO()
        pq.write_table(t, buf)
        return t, buf.getvalue()

    def test_metadata_matches_pyarrow_view(self):
        import io

        import pyarrow.parquet as ppq
        t, raw = self._file()
        fm = pq.read_metadata(raw)
        pfm = ppq.read_metadata(io.BytesIO(raw))
        assert fm.num_rows == pfm.num_rows
        assert fm.num_row_groups == pfm.num_row_groups
        assert fm.num_columns == pfm.num_columns
        rg, prg = fm.row_group(0), pfm.row_group(0)
        assert rg.num_rows == prg.num_rows
        for i in range(fm.num_columns):
            cc, pcc = rg.column(i), prg.column(i)
            assert cc.path_in_schema == pcc.path_in_schema
            assert cc.physical_type == str(pcc.physical_type)
            if cc.statistics and pcc.statistics:
                assert cc.statistics.min == pcc.statistics.min
                assert cc.statistics.max == pcc.statistics.max
                assert cc.statistics.null_count == \
                    pcc.statistics.null_count
        assert fm.schema.names == ["a", "s", "p"]
        assert pq.read_schema(raw).names == ["a", "s", "p"]

    def test_write_to_dataset_and_parquet_dataset(self, tmp_path):
        t, _ = self._file()
        root = str(tmp_path / "ds")
        pq.write_to_dataset(t, root, partition_cols=["p"])
        d = pq.ParquetDataset(root)
        out = d.read()
        got = sorted(zip(out.column("a").to_pylist(),
                         out.column("p").to_pylist()))
        assert got == [(1, 1), (2, 1), (3, 2), (4, 2)]

    def test_filters_to_expression(self):
        e = pq.filters_to_expression([("a", ">", 1), ("a", "<=", 3)])
        assert "greater" in repr(e) and "less_equal" in repr(e)
        e2 = pq.filters_to_expression([[("a", "=", 1)], [("a", "=", 2)]])
        assert "or" in repr(e2)

    def test_read_pandas(self):
        _, raw = self._file()
        df = pq.read_pandas(raw)
        assert df.shape == (4, 3)


@pytest.mark.parametrize("page_version", ["1.0", "2.0"])
def test_delta_and_byte_stream_split_encodings(tmp_path, page_version):
    """DELTA_BINARY_PACKED / DELTA_LENGTH_BYTE_ARRAY / DELTA_BYTE_ARRAY /
    BYTE_STREAM_SPLIT decode (reference: parquet/encoding.cc decoders),
    differential vs pyarrow-written files, both data-page versions."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as papq

    rng = np.random.default_rng(42)
    n = 3000
    i64 = rng.integers(-10**12, 10**12, n)
    i64[::7] = np.arange(0, n, 7) * 1000  # runs of small deltas
    i32 = rng.integers(-2**30, 2**30, n).astype(np.int32)
    f32 = rng.normal(size=n).astype(np.float32)
    f64 = rng.normal(size=n)
    strs = [f"prefix-{i % 50:04d}-suffix{i}" for i in range(n)]
    valid = rng.random(n) > 0.1
    t = pa.table({
        "dbp64": pa.array(i64, mask=~valid),
        "dbp32": pa.array(i32),
        "dlba": pa.array(strs, type=pa.string()),
        "dba": pa.array([s[::-1] for s in strs], mask=~valid),
        "bss_f32": pa.array(f32),
        "bss_f64": pa.array(f64, mask=~valid),
    })
    path = tmp_path / f"enc_{page_version}.parquet"
    papq.write_table(
        t, path, use_dictionary=False, compression="none",
        data_page_version=page_version,
        column_encoding={
            "dbp64": "DELTA_BINARY_PACKED",
            "dbp32": "DELTA_BINARY_PACKED",
            "dlba": "DELTA_LENGTH_BYTE_ARRAY",
            "dba": "DELTA_BYTE_ARRAY",
            "bss_f32": "BYTE_STREAM_SPLIT",
            "bss_f64": "BYTE_STREAM_SPLIT",
        })
    from arrow_tpu.io import parquet as atpq
    ours = atpq.read_table(str(path))
    theirs = t.to_pydict()
    got = ours.to_pydict()
    for col in t.column_names:
        assert got[col] == theirs[col], col


def test_write_column_encoding_pyarrow_reads(tmp_path):
    """Writer-side BYTE_STREAM_SPLIT / DELTA_BINARY_PACKED: pyarrow is the
    read oracle (reference: parquet/encoding.cc encoders)."""
    import numpy as np
    import pyarrow.parquet as papq

    import arrow_tpu as at
    from arrow_tpu.io import parquet as atpq

    rng = np.random.default_rng(7)
    n = 2500
    f64 = rng.normal(size=n)
    i64 = rng.integers(-10**14, 10**14, n)
    i32 = rng.integers(-2**30, 2**30, n).astype(np.int32)
    valid = rng.random(n) > 0.15
    t = at.table({
        "bss": at.array([float(v) if ok else None
                         for v, ok in zip(f64, valid)], at.float64()),
        "dbp64": at.array(i64),
        "dbp32": at.array(i32),
    })
    path = str(tmp_path / "enc_out.parquet")
    atpq.write_table(t, path, compression="none", column_encoding={
        "bss": "BYTE_STREAM_SPLIT",
        "dbp64": "DELTA_BINARY_PACKED",
        "dbp32": "DELTA_BINARY_PACKED",
    })
    theirs = papq.read_table(path)
    assert theirs.to_pydict() == t.to_pydict()
    # encodings actually used (not silently PLAIN)
    md = papq.ParquetFile(path).metadata
    encs = {md.schema.column(i).name:
            set(md.row_group(0).column(i).encodings)
            for i in range(md.num_columns)}
    assert "BYTE_STREAM_SPLIT" in encs["bss"]
    assert "DELTA_BINARY_PACKED" in encs["dbp64"]
    # and our own reader round-trips them
    ours = atpq.read_table(path)
    assert ours.to_pydict() == t.to_pydict()
