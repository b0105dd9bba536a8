"""pyarrow-parity convenience methods on Array / ChunkedArray /
RecordBatch / Table + RecordBatchReader.

Reference analogues: pyarrow table.pxi / array.pxi method surfaces over
chunked_array.h / record_batch.h / table.h.
"""

import numpy as np
import pytest

import arrow_tpu as at


@pytest.fixture
def tbl():
    return at.table({"a": at.array([3, 1, None, 3], at.int64()),
                     "b": at.array(["x", "y", "z", None], at.string())})


def test_array_methods_vs_pyarrow():
    pa = pytest.importorskip("pyarrow")
    ours = at.array([3, 1, None, 3], at.int64())
    ref = pa.array([3, 1, None, 3], pa.int64())
    mask_o = at.array([True, False, True, True], at.bool_())
    mask_r = pa.array([True, False, True, True])
    assert ours.filter(mask_o).to_pylist() == ref.filter(mask_r).to_pylist()
    assert ours.take(at.array([0, 3], at.int64())).to_pylist() == \
        ref.take(pa.array([0, 3])).to_pylist()
    assert ours.drop_null().to_pylist() == ref.drop_null().to_pylist()
    assert ours.sort().to_pylist() == ref.sort().to_pylist()
    assert ours.unique().to_pylist() == ref.unique().to_pylist()
    assert ours.value_counts().to_pylist() == \
        ref.value_counts().to_pylist()
    assert ours.fill_null(9).to_pylist() == ref.fill_null(9).to_pylist()
    assert ours.is_null().to_pylist() == ref.is_null().to_pylist()
    assert ours.is_valid().to_pylist() == ref.is_valid().to_pylist()
    assert ours.index(3) == ref.index(3).as_py()
    assert ours.index(3, 1) == ref.index(3, 1).as_py()
    assert ours.index(99) == ref.index(99).as_py() == -1
    assert ours.tolist() == ref.tolist()
    assert ours.get_total_buffer_size() > 0
    ours.validate(full=True)


def test_array_dictionary_encode_vs_pyarrow():
    pa = pytest.importorskip("pyarrow")
    for vals, t, pt in [(["x", "y", None, "x"], at.string(), pa.string()),
                        ([5, 5, None, 2], at.int64(), pa.int64())]:
        ours = at.array(vals, t).dictionary_encode()
        ref = pa.array(vals, pt).dictionary_encode()
        assert ours.indices.to_pylist() == ref.indices.to_pylist()
        assert ours.dictionary.to_pylist() == ref.dictionary.to_pylist()


def test_array_from_buffers_and_view():
    b = at.Array.from_buffers(
        at.int32(), 3, [None, np.array([1, 2, 3], np.int32).tobytes()])
    assert b.to_pylist() == [1, 2, 3]
    v = at.array([1, 2], at.int32()).view(at.uint32())
    assert v.type == at.uint32() and v.to_pylist() == [1, 2]
    assert at.array([1, 2]).diff(at.array([1, 3])) != ""
    assert at.array([1, 2]).diff(at.array([1, 2])) == ""


def test_chunked_array_methods(tbl):
    ca = at.chunked_array([[3, 1], [None, 3]], at.int64())
    assert ca.combine_chunks().to_pylist() == [3, 1, None, 3]
    assert len(list(ca.iterchunks())) == 2
    assert ca.drop_null().to_pylist() == [3, 1, 3]
    assert ca.sort("descending").to_pylist()[:3] == [3, 3, 1]
    assert ca.unique().to_pylist() == [3, 1, None]
    assert ca.fill_null(0).to_pylist() == [3, 1, 0, 3]
    assert ca.take(at.array([1], at.int64())).to_pylist() == [1]
    assert ca.is_valid().to_pylist() == [True, True, False, True]
    assert ca.index(3) == 0 and ca.index(99) == -1
    assert ca.cast(at.float64()).to_pylist() == [3.0, 1.0, None, 3.0]
    assert ca.nbytes > 0
    ca.validate(full=True)


def test_record_batch_methods(tbl):
    rb = tbl.to_batches()[0]
    assert rb.shape == (4, 2)
    assert rb.field("a").type == at.int64()
    assert [c.to_pylist()[0] for c in rb.itercolumns()] == [3, "x"]
    assert rb.take(at.array([0, 1], at.int64())).num_rows == 2
    assert rb.drop_null().num_rows == 2
    assert rb.sort_by([("a", "ascending")]).column(0).to_pylist()[0] == 1
    assert rb.rename_columns(["p", "q"]).schema.names == ["p", "q"]
    assert rb.drop_columns(["b"]).schema.names == ["a"]
    assert rb.remove_column(0).schema.names == ["b"]
    rb2 = rb.append_column(at.Field("c", at.int64()),
                           at.array([1, 2, 3, 4], at.int64()))
    assert rb2.schema.names == ["a", "b", "c"]
    assert rb.replace_schema_metadata({b"k": b"v"}).schema.metadata == \
        {b"k": b"v"}
    assert rb.nbytes > 0 and rb.is_cpu
    rb.validate(full=True)


def test_record_batch_struct_roundtrip(tbl):
    rb = tbl.to_batches()[0]
    sa = rb.to_struct_array()
    back = at.RecordBatch.from_struct_array(sa)
    assert back.to_pylist() == rb.to_pylist()
    assert at.RecordBatch.from_pylist(
        [{"a": 1}, {"a": 2}]).column(0).to_pylist() == [1, 2]


def test_record_batch_serialize_pyarrow_readable(tbl):
    pa = pytest.importorskip("pyarrow")
    rb = tbl.to_batches()[0]
    buf = rb.serialize().to_pybytes()
    got = pa.ipc.open_stream(buf).read_all()
    assert got.column("a").to_pylist() == [3, 1, None, 3]


def test_table_methods(tbl):
    assert tbl.shape == (4, 2)
    assert tbl.drop(["b"]).column_names == ["a"]
    assert tbl.field("b").type == at.string()
    assert len(list(tbl.itercolumns())) == 2
    assert tbl.nbytes > 0 and tbl.is_cpu
    assert tbl.replace_schema_metadata({b"x": b"1"}).schema.metadata == \
        {b"x": b"1"}
    tbl.validate(full=True)
    t2 = at.Table.from_pylist([{"a": 1, "b": "u"}, {"a": 2, "b": None}])
    assert t2.to_pydict() == {"a": [1, 2], "b": ["u", None]}
    sa = t2.to_struct_array()
    back = at.Table.from_struct_array(sa)
    assert back.to_pydict() == t2.to_pydict()


def test_table_flatten():
    t = at.table({"s": at.array(
        [{"p": 1, "q": "u"}, {"p": 2, "q": None}],
        at.struct([("p", at.int64()), ("q", at.string())])),
        "k": at.array([7, 8], at.int64())})
    f = t.flatten()
    assert f.column_names == ["s.p", "s.q", "k"]
    assert f.column("s.p").to_pylist() == [1, 2]


def test_table_to_tensor():
    t = at.table({"x": [1.0, 2.0], "y": [3.0, 4.0]})
    tn = t.to_tensor()
    assert tn.shape == (2, 2)
    with pytest.raises(ValueError):
        at.table({"x": at.array([1.0, None], at.float64())}).to_tensor()


def test_table_join_asof():
    left = at.table({"t": at.array([1, 5, 10], at.int64()),
                     "k": at.array(["a", "a", "a"], at.string()),
                     "v": at.array([10, 20, 30], at.int64())})
    right = at.table({"t": at.array([0, 4, 9], at.int64()),
                      "k": at.array(["a", "a", "a"], at.string()),
                      "w": at.array([100, 200, 300], at.int64())})
    out = left.join_asof(right, on="t", by="k", tolerance=-2)
    assert out.num_rows == 3


def test_record_batch_reader():
    t = at.table({"a": list(range(10))})
    r = t.to_reader(4)
    sizes = [b.num_rows for b in r]
    assert sizes == [4, 4, 2]
    r2 = t.to_reader()
    assert r2.read_all().num_rows == 10
    with at.Table.from_pydict({"z": [1]}).to_reader() as r3:
        assert r3.read_next_batch().num_rows == 1
        with pytest.raises(StopIteration):
            r3.read_next_batch()


def test_record_batch_reader_c_stream_interop():
    pa = pytest.importorskip("pyarrow")
    t = at.table({"a": [3, 1], "s": at.array(["p", None], at.string())})
    # export: pyarrow consumes our reader
    got = pa.RecordBatchReader.from_stream(t.to_reader())
    assert got.read_all().to_pydict() == {"a": [3, 1], "s": ["p", None]}
    # import: we consume a pyarrow reader
    par = pa.RecordBatchReader.from_batches(
        pa.schema([("k", pa.int64()), ("s", pa.string())]),
        [pa.record_batch({"k": [1, 2], "s": ["a", None]}),
         pa.record_batch({"k": [3], "s": ["c"]})])
    ours = at.RecordBatchReader.from_stream(par)
    assert ours.read_all().to_pydict() == \
        {"k": [1, 2, 3], "s": ["a", None, "c"]}


def test_module_level_name_parity():
    """Every public pyarrow module-level name resolves in arrow_tpu
    (directly or via arrow_tpu.api)."""
    pa = pytest.importorskip("pyarrow")
    import types
    import arrow_tpu.api
    # submodules appear in dir(pa) lazily depending on import order;
    # compare non-module names only
    ref = {n for n in dir(pa) if not n.startswith("_") and
           not isinstance(getattr(pa, n, None), types.ModuleType)}
    ours = {n for n in dir(at) if not n.startswith("_")}
    missing = sorted(n for n in ref - ours
                     if not hasattr(arrow_tpu.api, n))
    assert missing == [], missing


def test_typed_class_isinstance_semantics():
    a = at.array([1, 2], at.int32())
    assert isinstance(a, at.Int32Array)
    assert not isinstance(a, at.Int64Array)
    assert isinstance(a, at.IntegerArray)
    assert isinstance(a, at.NumericArray)
    assert not isinstance(a, at.FloatingPointArray)
    s = at.scalar("x")
    assert isinstance(s, at.StringScalar)
    assert not isinstance(s, at.Int8Scalar)
    t = at.decimal128(10, 2)
    assert isinstance(t, at.Decimal128Type)
    assert not isinstance(t, at.Decimal32Type)
    d = at.array(["a", "b"], at.string()).dictionary_encode()
    assert isinstance(d, at.DictionaryArray)
    assert isinstance(at.array([[1]], at.list_(at.int64())),
                      at.ListArray)
    assert isinstance(at.array([{"x": 1}], at.struct([("x", at.int64())])),
                      at.StructArray)


def test_misc_compat_names():
    import io
    assert at.NA.value is None and at.NULL is at.NA
    assert at.union([at.field("a", at.int32())], "sparse").mode == "sparse"
    assert at.arange(3).to_pylist() == [0, 1, 2]
    assert at.arange(1, 7, 2).to_pylist() == [1, 3, 5]
    buf = at.ResizableBuffer(b"ab")
    buf.resize(4)
    assert buf.size == 4
    assert at.BufferedInputStream(io.BytesIO(b"hi")).read() == b"hi"
    ts = at.transcoding_input_stream(
        io.BytesIO("héllo".encode("latin-1")), "latin-1", "utf-8")
    assert ts.read().decode("utf-8") == "héllo"
    assert at.cpp_version_info()[0] >= 0
    assert not at.have_libhdfs()
    md = at.KeyValueMetadata({"k": "v"})
    assert md[b"k"] == b"v"
    assert at.MonthDayNano((1, 2, 3)).days == 2
    with pytest.raises(NotImplementedError):
        at.jemalloc_memory_pool()
    mm = at.default_cpu_memory_manager()
    assert mm.is_cpu


def test_compute_module_name_parity():
    pa = pytest.importorskip("pyarrow")
    import types
    import pyarrow.compute as ppc
    import arrow_tpu.compute as apc
    ref = {n for n in dir(ppc) if not n.startswith("_") and
           not isinstance(getattr(ppc, n), types.ModuleType)}
    ours = {n for n in dir(apc) if not n.startswith("_")}
    # dedent/namedtuple are accidental stdlib re-exports in pyarrow
    missing = sorted(ref - ours - {"dedent", "namedtuple"})
    assert missing == [], missing


def test_top_bottom_k_vs_pyarrow():
    pa = pytest.importorskip("pyarrow")
    import pyarrow.compute as ppc
    import arrow_tpu.compute as apc
    a = at.array([5, 1, 9, 3], at.int64())
    ra = pa.array([5, 1, 9, 3])
    assert apc.top_k_unstable(a, 2).to_pylist() == \
        [i.as_py() for i in ppc.top_k_unstable(ra, 2)]
    assert apc.bottom_k_unstable(a, 2).to_pylist() == \
        [i.as_py() for i in ppc.bottom_k_unstable(ra, 2)]
    assert apc.utf8_zfill(at.array(["7", "-7"], at.string()),
                          width=3).to_pylist() == \
        [s.as_py() for s in ppc.utf8_zfill(pa.array(["7", "-7"]),
                                           width=3)]


def test_select_k_sort_keys_respected():
    """Regression: list-of-tuples options (sort_keys) must survive the
    jit-cache freeze/thaw round trip."""
    from arrow_tpu.compute import call_function
    a = at.array([5, 1, 9, 3], at.int64())
    asc = call_function("select_k_unstable", [a],
                        {"k": 2, "sort_keys": [("x", "ascending")]})
    desc = call_function("select_k_unstable", [a],
                         {"k": 2, "sort_keys": [("x", "descending")]})
    assert asc.to_pylist() == [1, 3]
    assert desc.to_pylist() == [2, 0]


def test_udf_registrations():
    import arrow_tpu.compute as apc

    def times_two(ctx, x):
        return at.array([v * 2 if v is not None else None
                         for v in x.to_pylist()], x.type)

    apc.register_vector_function(
        times_two, "my_times_two_vec", {"summary": "x*2"},
        {"x": at.int64()}, at.int64())
    out = apc.call_function("my_times_two_vec",
                            [at.array([1, None, 3], at.int64())])
    assert out.to_pylist() == [2, None, 6]

    def my_total(ctx, x):
        return sum(v for v in x.to_pylist() if v is not None)

    apc.register_aggregate_function(
        my_total, "my_total_agg", {"summary": "sum"},
        {"x": at.int64()}, at.int64())
    s = apc.call_function("my_total_agg",
                          [at.array([1, 2, 3], at.int64())])
    assert s.value == 6

    def make_table(ctx):
        return at.table({"n": [1, 2]})

    apc.register_tabular_function(
        make_table, "my_table_fn", {"summary": "t"}, {}, None)
    rdr = apc.call_tabular_function("my_table_fn")
    assert rdr.read_all().to_pydict() == {"n": [1, 2]}


def test_submodule_name_parity():
    """Every public name in pyarrow's format/fs/ipc submodules resolves
    in the matching arrow_tpu module."""
    pa = pytest.importorskip("pyarrow")
    import types
    import pyarrow.csv, pyarrow.dataset, pyarrow.feather, pyarrow.fs
    import pyarrow.ipc, pyarrow.json, pyarrow.orc, pyarrow.parquet
    import arrow_tpu.dataset, arrow_tpu.feather, arrow_tpu.fs
    import arrow_tpu.io.csv, arrow_tpu.io.json, arrow_tpu.io.orc
    import arrow_tpu.io.parquet, arrow_tpu.ipc
    pairs = [
        (pa.parquet, arrow_tpu.io.parquet, "parquet"),
        (pa.dataset, arrow_tpu.dataset, "dataset"),
        (pa.csv, arrow_tpu.io.csv, "csv"),
        (pa.json, arrow_tpu.io.json, "json"),
        (pa.fs, arrow_tpu.fs, "fs"),
        (pa.ipc, arrow_tpu.ipc, "ipc"),
        (pa.feather, arrow_tpu.feather, "feather"),
        (pa.orc, arrow_tpu.io.orc, "orc"),
    ]
    import pyarrow.acero, pyarrow.parquet.encryption
    import pyarrow.flight, pyarrow.substrait
    import arrow_tpu.acero, arrow_tpu.io.parquet.encryption
    import arrow_tpu.flight, arrow_tpu.substrait
    pairs += [
        (pa.acero, arrow_tpu.acero, "acero"),
        (pa.parquet.encryption, arrow_tpu.io.parquet.encryption,
         "parquet.encryption"),
        (pa.flight, arrow_tpu.flight, "flight"),
        (pa.substrait, arrow_tpu.substrait, "substrait"),
    ]
    for ref, ours, label in pairs:
        r = {n for n in dir(ref) if not n.startswith("_") and
             not isinstance(getattr(ref, n, None), types.ModuleType)}
        o = {n for n in dir(ours) if not n.startswith("_")}
        missing = sorted(r - o)
        assert missing == [], (label, missing)


def test_feather_dataset_and_orc_writer(tmp_path):
    import arrow_tpu.feather as af
    import arrow_tpu.io.orc as aorc
    t1, t2 = at.table({"a": [1, 2]}), at.table({"a": [3]})
    p1, p2 = str(tmp_path / "f1.feather"), str(tmp_path / "f2.feather")
    af.write_feather(t1, p1)
    af.write_feather(t2, p2)
    assert af.FeatherDataset([p1, p2]).read_table().column(
        "a").to_pylist() == [1, 2, 3]
    po = str(tmp_path / "o.orc")
    with aorc.ORCWriter(po) as w:
        w.write(t1)
        w.write(t2)
    assert aorc.read_table(po).column("a").to_pylist() == [1, 2, 3]


def test_pyfs_and_copy_files(tmp_path):
    import arrow_tpu.fs as afs
    src = tmp_path / "sub" / "a.txt"
    src.parent.mkdir()
    src.write_text("hi")
    afs.copy_files(str(tmp_path / "sub"), str(tmp_path / "out"))
    assert (tmp_path / "out" / "a.txt").read_text() == "hi"
    fsspec = pytest.importorskip("fsspec")
    mem = fsspec.filesystem("memory")
    pyfs = afs.PyFileSystem(afs.FSSpecHandler(mem))
    with pyfs.open_output_stream("/t/f.bin") as f:
        f.write(b"abc")
    assert pyfs.open_input_stream("/t/f.bin").read() == b"abc"
    assert pyfs.get_file_info("/t/f.bin").type == afs.FileType.File


def test_parquet_write_metadata(tmp_path):
    from arrow_tpu.io import parquet as atpq
    papq = pytest.importorskip("pyarrow.parquet")
    p = str(tmp_path / "_common_metadata")
    atpq.write_metadata(at.schema([at.field("a", at.int64())]), p)
    assert atpq.ParquetFile(p).num_rows == 0
    assert papq.read_schema(p).names == ["a"]


def test_schema_field_datatype_parity():
    pa = pytest.importorskip("pyarrow")
    for rc, oc in [(pa.Schema, at.Schema), (pa.Field, at.Field),
                   (pa.DataType, at.DataType), (pa.Scalar, at.Scalar),
                   (pa.Buffer, at.Buffer)]:
        missing = sorted({n for n in dir(rc) if not n.startswith("_")} -
                         {n for n in dir(oc) if not n.startswith("_")})
        assert missing == [], (rc.__name__, missing)


def test_schema_methods():
    s = at.schema([at.field("a", at.int64()), at.field("b", at.string()),
                   at.field("a", at.int32())])
    assert s.field_by_name("b").type == at.string()
    assert s.field_by_name("zzz") is None
    assert s.get_all_field_indices("a") == [0, 2]
    s2 = s.insert(1, at.field("x", at.bool_()))
    assert s2.names == ["a", "x", "b", "a"]
    assert s.empty_table().num_rows == 0
    assert s.remove_metadata().metadata is None
    # serialized schema is readable by pyarrow
    pa = pytest.importorskip("pyarrow")
    buf = at.schema([at.field("k", at.int64())]).serialize()
    got = pa.ipc.read_schema(pa.py_buffer(buf.to_pybytes()))
    assert got.names == ["k"]


def test_field_datatype_methods():
    f = at.field("s", at.struct([("x", at.int8()), ("y", at.string())]))
    flat = f.flatten()
    assert [x.name for x in flat] == ["s.x", "s.y"]
    assert at.field("p", at.int8()).flatten()[0].name == "p"
    fm = at.field("a", at.int64()).with_metadata({b"k": b"v"})
    assert fm.metadata == {b"k": b"v"}
    assert fm.remove_metadata().metadata is None
    t = at.struct([("x", at.int8())])
    assert t.field(0).name == "x"
    assert at.int64().num_buffers == 2
    assert at.string().num_buffers == 3
    assert at.struct([]).num_buffers == 1
    assert at.string_view().has_variadic_buffers
    import numpy as _np
    assert at.int32().to_pandas_dtype() == _np.int32
    assert at.timestamp("ns").to_pandas_dtype() == \
        _np.dtype("datetime64[ns]").type


def test_scalar_and_buffer_methods():
    s = at.scalar(3)
    assert s.cast(at.float64()).value == 3.0
    assert s.equals(at.scalar(3)) and not s.equals(at.scalar(4))
    s.validate(full=True)
    b = at.Buffer(b"\x01\x02")
    assert b.address > 0
    assert b.hex() == b"0102"
    assert b.is_cpu and not b.is_mutable or b.is_mutable  # defined
    assert b.parent is None
    assert b.device.is_cpu and b.memory_manager.is_cpu


def test_expression_parity_and_substrait():
    pa = pytest.importorskip("pyarrow")
    import pyarrow.compute as ppc
    from arrow_tpu.acero import field
    from arrow_tpu.acero.expression import Expression
    missing = sorted({n for n in dir(ppc.Expression)
                      if not n.startswith("_")} -
                     {n for n in dir(Expression) if not n.startswith("_")})
    assert missing == [], missing
    sch = at.schema([at.field("a", at.int64())])
    buf = (field("a") > 1).to_substrait(sch)
    got = ppc.Expression.from_substrait(pa.py_buffer(buf.to_pybytes()))
    assert "FieldPath(0)" in str(got)
    pbuf = (ppc.field("a") > 1).to_substrait(pa.schema([("a",
                                                         pa.int64())]))
    back = Expression.from_substrait(bytes(pbuf))
    assert at.table({"a": [0, 2]}).filter(back).num_rows == 1
    # cast / is_nan expression builders execute
    t = at.table({"x": [0.0, float("nan")]})
    assert t.filter(field("x").is_nan()).num_rows == 1


def test_to_pandas_dtype_fidelity():
    pa = pytest.importorskip("pyarrow")
    pd = pytest.importorskip("pandas")
    t = at.table({
        "ts": at.array([0, None, 86400_000000], at.timestamp("us")),
        "du": at.array([5, 6, None], at.duration("ms")),
        "d": at.array(["a", "b", None],
                      at.dictionary(at.int32(), at.string()))})
    df = t.to_pandas()
    ref = pa.table({
        "ts": pa.array([0, None, 86400_000000], pa.timestamp("us")),
        "du": pa.array([5, 6, None], pa.duration("ms")),
        "d": pa.array(["a", "b", None]).dictionary_encode()}).to_pandas()
    assert str(df["ts"].dtype) == str(ref["ts"].dtype)
    assert str(df["du"].dtype) == str(ref["du"].dtype)
    assert df["ts"].isna().tolist() == ref["ts"].isna().tolist()
    assert df["ts"].dropna().tolist() == ref["ts"].dropna().tolist()
    assert list(df["d"].cat.categories) == list(ref["d"].cat.categories)


def test_parquetfile_and_dataset_class_parity():
    papq = pytest.importorskip("pyarrow.parquet")
    import pyarrow.dataset as pds

    import arrow_tpu.dataset as atds
    import arrow_tpu.io.parquet as atpq
    for rc, oc in [(papq.ParquetFile, atpq.ParquetFile),
                   (papq.ParquetWriter, atpq.ParquetWriter),
                   (pds.Dataset, atds.Dataset),
                   (pds.Scanner, atds.Scanner)]:
        missing = sorted({n for n in dir(rc) if not n.startswith("_")} -
                         {n for n in dir(oc) if not n.startswith("_")})
        assert missing == [], (rc.__name__, missing)


def test_parquetfile_methods(tmp_path):
    import io
    import arrow_tpu.io.parquet as atpq
    t = at.table({"a": list(range(100))})
    buf = io.BytesIO()
    with atpq.ParquetWriter(buf, t.schema) as w:
        w.write(t, row_group_size=30)
        w.add_key_value_metadata({"creator": "test"})
    pf = atpq.ParquetFile(buf.getvalue())
    assert pf.key_value_metadata == {"creator": "test"}
    assert [b.num_rows for b in pf.iter_batches(batch_size=25)] == \
        [25, 5, 25, 5, 25, 5, 10]
    assert pf.read_row_groups([0, 2]).num_rows == 60
    assert pf.scan_contents() == 100
    assert pf.schema.names == ["a"]
    papq = pytest.importorskip("pyarrow.parquet")
    assert papq.ParquetFile(io.BytesIO(buf.getvalue())).metadata \
        .metadata == {b"creator": b"test"}


def test_dataset_scanner_methods(tmp_path):
    import arrow_tpu.dataset as ds
    import arrow_tpu.io.parquet as atpq
    from arrow_tpu.acero import field
    t = at.table({"a": list(range(100))})
    atpq.write_table(t, str(tmp_path / "f.parquet"))
    dset = ds.dataset(str(tmp_path))
    assert dset.head(3).num_rows == 3
    assert dset.take(at.array([0, 5], at.int64())).column(
        "a").to_pylist() == [0, 5]
    assert dset.filter(field("a") < 10).to_table().num_rows == 10
    assert dset.sort_by([("a", "descending")]).to_table().column(
        "a").to_pylist()[0] == 99
    sc = ds.Scanner.from_dataset(dset, columns=["a"])
    assert sc.projected_schema.names == ["a"]
    assert sc.to_reader().read_all().num_rows == 100
    assert sum(c.record_batch.num_rows for c in sc.scan_batches()) == 100


def test_csv_json_options_surfaces():
    pcsv = pytest.importorskip("pyarrow.csv")
    pjson = pytest.importorskip("pyarrow.json")
    import arrow_tpu.io.csv as acsv
    import arrow_tpu.io.json as ajson
    for rc, oc in [(pcsv.ReadOptions, acsv.ReadOptions),
                   (pcsv.ParseOptions, acsv.ParseOptions),
                   (pcsv.ConvertOptions, acsv.ConvertOptions),
                   (pcsv.WriteOptions, acsv.WriteOptions),
                   (pjson.ReadOptions, ajson.ReadOptions),
                   (pjson.ParseOptions, ajson.ParseOptions)]:
        inst = oc()
        missing = sorted(n for n in dir(rc) if not n.startswith("_")
                         and not hasattr(inst, n))
        assert missing == [], (oc.__name__, missing)
    ro = acsv.ReadOptions(block_size=5)
    assert ro.equals(acsv.ReadOptions(block_size=5))
    assert not ro.equals(acsv.ReadOptions())
    ro.validate()


def test_csv_convert_options_semantics():
    import io as _io
    pcsv = pytest.importorskip("pyarrow.csv")
    pa = pytest.importorskip("pyarrow")
    import arrow_tpu.io.csv as acsv
    # decimal_point
    data = b"x\n1,5\n2,25\n"
    ours = acsv.read_csv(
        _io.BytesIO(data), parse_options=acsv.ParseOptions(delimiter=";"),
        convert_options=acsv.ConvertOptions(decimal_point=","))
    assert ours.column("x").to_pylist() == [1.5, 2.25]
    # default_column_type suppresses inference
    t2 = acsv.read_csv(
        _io.BytesIO(b"a\n1\n2\n"),
        convert_options=acsv.ConvertOptions(
            default_column_type=at.string()))
    assert t2.column("a").to_pylist() == ["1", "2"]
    # auto_dict_encode matches pyarrow's type choice
    t3 = acsv.read_csv(
        _io.BytesIO(b"s\nx\ny\nx\n"),
        convert_options=acsv.ConvertOptions(auto_dict_encode=True))
    assert t3.schema.types[0].id == at.TypeId.DICTIONARY
    assert t3.column("s").to_pylist() == ["x", "y", "x"]
    # cardinality cap falls back to plain strings
    t3b = acsv.read_csv(
        _io.BytesIO(b"s\nx\ny\nz\n"),
        convert_options=acsv.ConvertOptions(auto_dict_encode=True,
                                            auto_dict_max_cardinality=2))
    assert t3b.schema.types[0] == at.string()
    # timestamp_parsers (strptime formats)
    t4 = acsv.read_csv(
        _io.BytesIO(b"t\n01/02/2020\n"),
        convert_options=acsv.ConvertOptions(
            column_types={"t": at.timestamp("s")},
            timestamp_parsers=["%d/%m/%Y"]))
    ref4 = pcsv.read_csv(
        _io.BytesIO(b"t\n01/02/2020\n"),
        convert_options=pcsv.ConvertOptions(
            column_types={"t": pa.timestamp("s")},
            timestamp_parsers=["%d/%m/%Y"]))
    assert t4.column("t").to_pylist() == ref4.column("t").to_pylist()


def test_csv_invalid_row_handler():
    import io as _io
    import arrow_tpu.io.csv as acsv
    data = b"a,b\n1,2\n3\n4,5\n"
    seen = []

    def skip(row):
        seen.append((row.number, row.actual_columns,
                     row.expected_columns))
        return "skip"

    t = acsv.read_csv(_io.BytesIO(data),
                      parse_options=acsv.ParseOptions(
                          invalid_row_handler=skip))
    assert t.num_rows == 2 and seen == [(1, 1, 2)]
    with pytest.raises(Exception):
        acsv.read_csv(_io.BytesIO(data),
                      parse_options=acsv.ParseOptions(
                          invalid_row_handler=lambda r: "error"))
