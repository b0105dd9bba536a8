"""Top-level API surface (api.py / io_streams.py / errors.py vs pyarrow's
module-level helpers)."""

import pytest

import arrow_tpu as at


class TestApiHelpers:
    def test_scalar_nulls_repeat_infer(self):
        s = at.scalar(5)
        assert s.as_py() == 5 and s.type == at.int64()
        assert at.nulls(3, at.int64()).to_pylist() == [None] * 3
        assert at.repeat("x", 2).to_pylist() == ["x", "x"]
        assert at.infer_type([1.5]).id == at.TypeId.DOUBLE

    def test_concat(self):
        assert at.concat_arrays(
            [at.array([1, 2]), at.array([3])]).to_pylist() == [1, 2, 3]
        t1, t2 = at.table({"a": [1]}), at.table({"a": [2]})
        assert at.concat_tables([t1, t2]).to_pydict() == {"a": [1, 2]}
        b = at.concat_batches(t1.to_batches() + t2.to_batches())
        assert b.to_pydict() == {"a": [1, 2]}

    def test_concat_tables_promote(self):
        t1 = at.table({"a": [1], "b": ["x"]})
        t3 = at.table({"a": [3], "c": [True]})
        with pytest.raises(at.ArrowInvalid):
            at.concat_tables([t1, t3])
        out = at.concat_tables([t1, t3], promote_options="default")
        assert out.to_pydict() == {"a": [1, 3], "b": ["x", None],
                                   "c": [None, True]}

    def test_unify_schemas_and_aliases(self):
        u = at.unify_schemas([at.table({"a": [1]}).schema,
                              at.table({"b": [1.0]}).schema])
        assert [f.name for f in u] == ["a", "b"]
        assert at.type_for_alias("f8") == at.float64()
        assert at.utf8() == at.string()
        assert at.large_utf8() == at.large_string()

    def test_pandas_serialization(self):
        pd = pytest.importorskip("pandas")
        df = pd.DataFrame({"x": [1, 2], "y": ["a", "b"]})
        back = at.deserialize_pandas(at.serialize_pandas(df))
        assert list(back["x"]) == [1, 2]
        assert list(back["y"]) == ["a", "b"]

    def test_errors_exist(self):
        for name in ("ArrowInvalid", "ArrowTypeError", "ArrowKeyError",
                     "ArrowIndexError", "ArrowMemoryError",
                     "ArrowCapacityError", "ArrowNotImplementedError",
                     "ArrowSerializationError", "ArrowCancelled",
                     "ArrowIOError", "ArrowException"):
            assert isinstance(getattr(at, name), type), name


class TestIoStreams:
    @pytest.mark.parametrize("codec", ["zstd", "gzip", "snappy", "lz4"])
    def test_codec_roundtrip(self, codec):
        data = b"hello world " * 100
        z = at.Codec(codec).compress(data)
        assert at.Codec(codec).decompress(z, len(data)) == data
        assert at.Codec.is_available(codec)

    def test_codec_unavailable(self):
        # brotli is now available (system libbrotli); lzo is not
        assert at.Codec.is_available("brotli")
        with pytest.raises(at.ArrowInvalid):
            at.Codec("lzo")

    def test_compress_decompress(self):
        z = at.compress(b"abc" * 100, codec="zstd", asbytes=True)
        assert at.decompress(z, codec="zstd", asbytes=True) == b"abc" * 100

    def test_buffer_streams(self):
        r = at.BufferReader(b"hello")
        assert r.read(2) == b"he" and r.size() == 5
        o = at.BufferOutputStream()
        o.write(b"xy")
        assert o.finish().to_pybytes() == b"xy"
        assert at.py_buffer(b"zz").to_pybytes() == b"zz"

    def test_memory_map(self, tmp_path):
        p = str(tmp_path / "f.bin")
        open(p, "wb").write(b"mapdata")
        with at.memory_map(p) as mm:
            assert mm.read(3) == b"map" and mm.size() == 7
        m2 = at.create_memory_map(str(tmp_path / "g.bin"), 4)
        m2.write(b"0123")
        m2.close()
        assert open(str(tmp_path / "g.bin"), "rb").read() == b"0123"

    def test_input_output_stream(self, tmp_path):
        assert at.input_stream(b"data123").read() == b"data123"
        p = str(tmp_path / "x.bin")
        w = at.output_stream(p)
        w.write(b"abc")
        w.close()
        assert at.input_stream(p).read() == b"abc"
        pz = str(tmp_path / "x.zst")
        w = at.output_stream(pz, compression="zstd")
        w.write(b"abcabc")
        w.close()
        assert at.input_stream(open(pz, "rb"),
                               compression="zstd").read() == b"abcabc"

    def test_ipc_file_via_memory_map(self, tmp_path):
        from arrow_tpu import ipc
        t = at.table({"a": [1, 2, 3]})
        p = str(tmp_path / "t.arrow")
        with open(p, "wb") as f:
            with ipc.new_file(f, t.schema) as w:
                w.write_table(t)
        with at.memory_map(p) as mm:
            got = ipc.open_file(mm).read_all()
        assert got.to_pydict() == {"a": [1, 2, 3]}
