"""CSV + C Data Interface tests (differential vs pyarrow)."""

import ctypes
import io

import pyarrow as pa
import pyarrow.csv as pacsv
import pytest

import arrow_tpu as at
from arrow_tpu import c_data
from arrow_tpu.io import csv as atcsv

CSV_DATA = b"""a,b,c,d,e
1,1.5,x,true,2021-01-01
2,,y,false,2021-06-15
,3.25,"z,w",true,
4,4.0,,TRUE,1999-12-31
"""


def test_csv_inference_matches_pyarrow():
    ours = atcsv.read_csv(CSV_DATA)
    theirs = pacsv.read_csv(pa.BufferReader(CSV_DATA))
    assert ours.to_pydict() == theirs.to_pydict()
    assert ours.column_names == theirs.column_names


def test_csv_options():
    t = atcsv.read_csv(
        CSV_DATA,
        convert_options=atcsv.ConvertOptions(
            column_types={"a": at.float64()},
            include_columns=["a", "c"]))
    assert t.column_names == ["a", "c"]
    assert t.column("a").to_pylist() == [1.0, 2.0, None, 4.0]

    t2 = atcsv.read_csv(b"1,x\n2,y\n",
                        read_options=atcsv.ReadOptions(
                            column_names=["n", "s"]))
    assert t2.to_pydict() == {"n": [1, 2], "s": ["x", "y"]}

    t3 = atcsv.read_csv(b"9;q\n", read_options=atcsv.ReadOptions(
        autogenerate_column_names=True),
        parse_options=atcsv.ParseOptions(delimiter=";"))
    assert t3.to_pydict() == {"f0": [9], "f1": ["q"]}


def test_csv_write_read_roundtrip():
    t = at.table({"x": [1, None, 3], "s": ["a", "b,c", None],
                  "f": [1.5, 2.0, None]})
    buf = io.StringIO()
    atcsv.write_csv(t, buf)
    back = atcsv.read_csv(buf.getvalue().encode())
    assert back.column("x").to_pylist() == [1, None, 3]
    assert back.column("f").to_pylist() == [1.5, 2.0, None]
    # empty strings read back as "" (strings_can_be_null=False default)
    assert back.column("s").to_pylist() == ["a", "b,c", ""]


def test_csv_written_readable_by_pyarrow():
    t = at.table({"x": [1, 2], "s": ["a", "b"]})
    buf = io.StringIO()
    atcsv.write_csv(t, buf)
    theirs = pacsv.read_csv(pa.BufferReader(buf.getvalue().encode()))
    assert theirs.to_pydict() == {"x": [1, 2], "s": ["a", "b"]}


CDATA_CASES = [
    ([1, 2, None], None),
    (["a", None, "bb"], None),
    ([1.5, None], None),
    ([True, None], None),
    ([b"xy", None], at.binary()),
    ([[1, 2], None], at.list_(at.int64())),
    ([{"a": 1, "b": "z"}, None],
     at.struct([("a", at.int64()), ("b", at.string())])),
    (["u", "v", "u", None], at.dictionary(at.int32(), at.string())),
]


@pytest.mark.parametrize("case", range(len(CDATA_CASES)))
def test_c_data_export_to_pyarrow(case):
    vals, typ = CDATA_CASES[case]
    a = at.array(vals, typ)
    sch = c_data.ArrowSchemaStruct()
    arr = c_data.ArrowArrayStruct()
    c_data.export_array(a, ctypes.addressof(arr), ctypes.addressof(sch))
    pa_arr = pa.Array._import_from_c(ctypes.addressof(arr),
                                     ctypes.addressof(sch))
    assert pa_arr.to_pylist() == a.to_pylist()


@pytest.mark.parametrize("case", range(len(CDATA_CASES)))
def test_c_data_import_from_pyarrow(case):
    vals, typ = CDATA_CASES[case]
    a = at.array(vals, typ)
    pa_arr = pa.array(a.to_pylist(),
                      type=None if typ is None else None)
    if typ is not None and typ.id == at.TypeId.DICTIONARY:
        pa_arr = pa.array(vals).dictionary_encode()
    elif typ is not None and typ.id == at.TypeId.BINARY:
        pa_arr = pa.array(vals, type=pa.binary())
    sch = c_data.ArrowSchemaStruct()
    arr = c_data.ArrowArrayStruct()
    pa_arr._export_to_c(ctypes.addressof(arr), ctypes.addressof(sch))
    ours = c_data.import_array(ctypes.addressof(arr),
                               ctypes.addressof(sch))
    assert ours.to_pylist() == pa_arr.to_pylist()


def test_c_data_sliced_array():
    pa_arr = pa.array([1, 2, None, 4, 5]).slice(1, 3)
    sch = c_data.ArrowSchemaStruct()
    arr = c_data.ArrowArrayStruct()
    pa_arr._export_to_c(ctypes.addressof(arr), ctypes.addressof(sch))
    ours = c_data.import_array(ctypes.addressof(arr),
                               ctypes.addressof(sch))
    assert ours.to_pylist() == [2, None, 4]


def test_feather_v1_both_directions():
    """Legacy Feather V1 (reference: ipc/feather.cc V1 paths)."""
    import tempfile, os, warnings
    import pyarrow.feather as pf
    from arrow_tpu import feather
    warnings.filterwarnings("ignore", category=FutureWarning)
    data = {"a": [1, 2, None], "s": ["x", None, "zz"],
            "f": [1.5, 2.5, 3.5], "b": [True, False, None]}
    schema = at.schema([at.field("a", at.int64()),
                        at.field("s", at.string()),
                        at.field("f", at.float64()),
                        at.field("b", at.bool_())])
    t = at.table(data, schema=schema)
    p = tempfile.mktemp()
    try:
        feather.write_feather(t, p, version=1)
        assert pf.read_table(p).to_pydict() == data
        assert feather.read_feather(p).to_pydict() == data
        pf.write_feather(pa.table(data, schema=pa.schema(
            [("a", pa.int64()), ("s", pa.string()),
             ("f", pa.float64()), ("b", pa.bool_())])), p, version=1)
        assert feather.read_feather(p).to_pydict() == data
    finally:
        os.unlink(p)


def test_lz4_ipc_interop():
    """LZ4_FRAME IPC buffer compression via the native block codec
    (util/compression_lz4.cc analogue)."""
    import io
    from arrow_tpu import ipc
    t = at.table({"a": list(range(5000)),
                  "s": ["val" + str(i % 50) for i in range(5000)]})
    buf = io.BytesIO()
    with ipc.new_file(buf, t.schema, codec="lz4") as w:
        w.write_table(t)
    buf.seek(0)
    assert ipc.open_file(buf).read_all().to_pydict() == t.to_pydict()
    buf.seek(0)
    assert pa.ipc.open_file(buf).read_all().to_pydict() == t.to_pydict()
    pb = io.BytesIO()
    opts = pa.ipc.IpcWriteOptions(compression="lz4")
    with pa.ipc.new_file(pb, pa.schema([("a", pa.int64()),
                                        ("s", pa.string())]),
                         options=opts) as w:
        w.write_table(pa.table(t.to_pydict()))
    pb.seek(0)
    assert ipc.open_file(pb).read_all().to_pydict() == t.to_pydict()


def test_lz4_frame_codec_vectors():
    import numpy as np
    from arrow_tpu.utils.lz4frame import compress, decompress, xxhash32
    assert xxhash32(b"") == 0x02CC5D05
    assert xxhash32(b"abc") == 0x32D153FF
    rng = np.random.default_rng(1)
    for c in (b"", b"q", b"ab" * 9000,
              bytes(rng.integers(0, 256, 70000, dtype=np.uint8))):
        assert decompress(compress(c), len(c)) == c
    import pytest
    with pytest.raises(ValueError):
        decompress(b"\x00" * 16)


# --- CSV streaming reader + incremental writer (csv/reader.h:65) ------------


class TestCsvStreaming:
    def test_streaming_blocks_consistent_schema(self):
        import io as _io

        from arrow_tpu.io import csv as acsv
        data = "a,b\n" + "\n".join(f"{i},x{i % 5}"
                                   for i in range(5000)) + "\n"
        r = acsv.open_csv(_io.StringIO(data),
                          read_options=acsv.ReadOptions(block_size=8192))
        batches = list(r)
        assert len(batches) > 1
        assert sum(b.num_rows for b in batches) == 5000
        assert all(b.schema == batches[0].schema for b in batches)
        assert r.schema == batches[0].schema

    def test_read_all_and_next_batch(self):
        import io as _io

        from arrow_tpu.io import csv as acsv
        r = acsv.open_csv(_io.StringIO("a\n1\n2\n"))
        b = r.read_next_batch()
        assert b.to_pydict() == {"a": [1, 2]}
        import pytest as _pytest
        with _pytest.raises(StopIteration):
            r.read_next_batch()
        t = acsv.open_csv(_io.StringIO("a\n1\n2\n")).read_all()
        assert t.num_rows == 2

    def test_csv_writer_incremental_pyarrow_reads(self):
        import io as _io

        import pyarrow.csv as pcsv

        from arrow_tpu.io import csv as acsv
        t = at.table({"a": [1, 2], "s": ["x", "y"]})
        sink = _io.StringIO()
        with acsv.CSVWriter(sink, t.schema) as w:
            w.write(t)
            w.write(t.to_batches()[0])
        out = pcsv.read_csv(_io.BytesIO(sink.getvalue().encode()))
        assert out.num_rows == 4

    def test_sentinels(self):
        from arrow_tpu.io import csv as acsv
        assert acsv.ISO8601 == "ISO8601"
        row = acsv.InvalidRow(2, 3, 7, "x,y,z")
        assert row.expected_columns == 2 and row.actual_columns == 3


class TestCSVNativeDifferential:
    """The native tokenizer path must agree with the python-csv fallback
    path on the same inputs (mirrors the reference's converter tests,
    cpp/src/arrow/csv/converter_test.cc)."""

    def _both(self, data, monkeypatch, **kw):
        from arrow_tpu.io import csv as acsv
        native = acsv.read_csv(data, **kw)
        monkeypatch.setattr(acsv, "_tokenize_and_layout",
                            lambda *a, **k: None)
        fallback = acsv.read_csv(data, **kw)
        assert native.to_pydict() == fallback.to_pydict()
        assert [f.type for f in native.schema] == \
            [f.type for f in fallback.schema]
        return native

    def test_quotes_escapes_empty_lines(self, monkeypatch):
        data = (b'a,b,c\n'
                b'1,"x,y",2.5\n'
                b'\n'
                b'2,"he said ""hi""",-1e3\n'
                b'3,,nan\n'
                b',"",4\n')
        t = self._both(data, monkeypatch)
        assert t.num_rows == 4

    def test_crlf_and_missing_fields(self, monkeypatch):
        data = b'a,b\r\n1,x\r\n2\r\n3,z,extra\r\n'
        self._both(data, monkeypatch)

    def test_explicit_types_and_null_tokens(self, monkeypatch):
        import arrow_tpu as at
        from arrow_tpu.io import csv as acsv
        data = b'i,f,s,bl\nNULL,NA,keep,true\n7,0.5,NULL,false\n'
        co = acsv.ConvertOptions(column_types={
            "i": at.int32(), "f": at.float32(), "s": at.string(),
            "bl": at.bool_()}, strings_can_be_null=True)
        t = self._both(data, monkeypatch, convert_options=co)
        assert t.column("i").to_pylist() == [None, 7]
        assert t.column("s").to_pylist() == ["keep", None]

    def test_random_differential(self, monkeypatch):
        import random

        import numpy as np
        rng = random.Random(7)
        rows = []
        for _ in range(300):
            cells = []
            for c in range(4):
                kind = rng.randrange(6)
                if kind == 0:
                    cells.append(str(rng.randrange(-999, 999)))
                elif kind == 1:
                    cells.append(f"{rng.random():.4f}")
                elif kind == 2:
                    cells.append(rng.choice(["NULL", "", "NA"]))
                elif kind == 3:
                    cells.append('"qu,oted"')
                elif kind == 4:
                    cells.append('"do""uble"')
                else:
                    cells.append(rng.choice(["plain", "words here"]))
            rows.append(",".join(cells))
        data = ("h1,h2,h3,h4\n" + "\n".join(rows) + "\n").encode()
        self._both(data, monkeypatch)

    def test_temporal_native_matches_python(self, monkeypatch):
        """The native ISO date/timestamp bulk parsers (native.cpp
        csv_parse_date32/csv_parse_ts_micros) must agree with the
        python fromisoformat fallback, including tz-offset wall-clock
        semantics (_temporal_to_int cancels the offset) and >6-digit
        fraction truncation."""
        data = (b"ts,d\n"
                b"2020-01-01T12:30:45.123456,2020-01-01\n"
                b"2020-06-15 23:59:59,1999-12-31\n"
                b"2020-01-01T12:30:45Z,2020-02-29\n"
                b"2020-01-01T12:30:45+05:30,2021-01-31\n"
                b"2020-01-01,2000-02-29\n"
                b"20200101T1230,0001-01-01\n"
                b"2020-01-01T12:30:45.1234567,9999-12-31\n")
        t = self._both(data, monkeypatch)
        import arrow_tpu as at
        assert t.schema.field("ts").type == at.timestamp("s")
        assert t.schema.field("d").type == at.date32()

    def test_lowercase_z_suffix_not_a_timestamp(self, monkeypatch):
        """datetime.fromisoformat rejects a lowercase 'z' suffix, so the
        native parser must too (advisor round-2 finding: native used to
        accept it, making the inferred schema depend on native-lib
        availability)."""
        data = (b"ts\n"
                b"2020-01-01T12:30:45z\n"
                b"2020-06-15T00:00:00z\n")
        t = self._both(data, monkeypatch)
        import arrow_tpu as at
        assert t.schema.field("ts").type == at.string()

    def test_ns_unit_overflow_raises(self):
        """Years beyond ~2262 cannot be represented as int64 ns; the
        native bulk path must raise like the python fallback instead of
        silently wrapping (advisor round-2 finding)."""
        import pytest

        import arrow_tpu as at
        from arrow_tpu.io import csv as acsv
        data = b"ts\n9999-01-01T00:00:00\n"
        co = acsv.ConvertOptions(
            column_types={"ts": at.timestamp("ns")})
        with pytest.raises((OverflowError, ValueError)):
            acsv.read_csv(data, convert_options=co)

    def test_streaming_matches_read_csv(self):
        from arrow_tpu.io import csv as acsv
        body = "".join(f"{i},{i * 0.5},s{i % 9}\n" for i in range(5000))
        data = ("x,y,z\n" + body).encode()
        whole = acsv.read_csv(data)
        r = acsv.open_csv(
            data, read_options=acsv.ReadOptions(block_size=4096))
        batches = list(r)
        assert len(batches) > 1
        assert sum(b.num_rows for b in batches) == whole.num_rows
        import arrow_tpu as at
        merged = at.Table.from_batches(batches, batches[0].schema)
        assert merged.to_pydict() == whole.to_pydict()


class TestJSONNativeDifferential:
    """Native flat-ndjson tokenizer vs the python json fallback and
    pyarrow (reference: json/parser_test.cc)."""

    def _check(self, data: bytes, monkeypatch=None):
        import pyarrow as pa
        import pyarrow.json as pajson

        from arrow_tpu.io import json as ajson
        native = ajson.read_json(data)
        ref = pajson.read_json(pa.BufferReader(data))
        assert native.to_pydict() == ref.to_pydict()
        return native

    def test_escapes_and_unicode(self):
        data = (b'{"s": "a\\"b\\\\c\\nd\\u00e9\\ud83d\\ude00", "i": -5}\n'
                b'{"s": null, "i": 7}\n')
        t = self._check(data)
        assert t.column("s").to_pylist()[0] == 'a"b\\c\nd\xe9\U0001F600'

    def test_numbers_int_vs_float(self):
        data = b'{"x": 1, "y": 1.5, "z": 2e3}\n{"x": -9, "y": 0.25, "z": 1e-3}\n'
        t = self._check(data)
        import arrow_tpu as at
        assert t.schema.field("x").type == at.int64()
        assert t.schema.field("y").type == at.float64()
        assert t.schema.field("z").type == at.float64()

    def test_nested_objects_and_lists(self):
        data = (b'{"o": {"a": [1, 2], "b": "x"}, "l": [1, 2, null]}\n'
                b'{"o": null, "l": []}\n')
        self._check(data)

    def test_bool_null_columns(self):
        data = b'{"b": true, "n": null}\n{"b": false, "n": null}\n{"b": null, "n": null}\n'
        t = self._check(data)
        assert t.column("b").to_pylist() == [True, False, None]

    def test_fallback_matches_native(self, monkeypatch):
        from arrow_tpu.io import json as ajson
        data = b'{"a": 1, "s": "x"}\n{"a": 2, "s": "y"}\n'
        native = ajson.read_json(data)
        monkeypatch.setattr(ajson, "_native_json_table",
                            lambda *a, **k: None)
        fallback = ajson.read_json(data)
        assert native.to_pydict() == fallback.to_pydict()
        assert [f.type for f in native.schema] == \
            [f.type for f in fallback.schema]


def test_write_csv_dictionary_numeric_decodes_values():
    """ADVICE r3 (high): the fast format path must decode dictionary
    columns to VALUES, not emit the index codes."""
    import arrow_tpu as at
    darr = at.array([100, 200, 100, 300]).dictionary_encode()
    t = at.Table.from_arrays([darr], names=["a"])
    buf = io.BytesIO()
    atcsv.write_csv(t, buf)
    body = buf.getvalue().decode().strip().splitlines()
    assert body[1:] == ["100", "200", "100", "300"]
