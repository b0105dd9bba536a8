"""IPC differential tests against pyarrow (the reference implementation).

Strategy per SURVEY §4: golden-file round-trips are the bit-exactness
backbone. pyarrow is used ONLY as a test oracle; the engine never imports it.
"""

import datetime
import decimal
import io

import numpy as np
import pyarrow as pa
import pyarrow.ipc as paipc
import pytest

import arrow_tpu as at
from arrow_tpu import ipc
from arrow_tpu.array.array import pylist_equal


def our_to_pa(data: bytes) -> pa.Table:
    return paipc.open_stream(data).read_all()


def pa_to_bytes(tbl: pa.Table) -> bytes:
    sink = pa.BufferOutputStream()
    with paipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return sink.getvalue().to_pybytes()


SIMPLE_CASES = [
    {"i64": [1, 2, None, -4]},
    {"i8": at.array([1, None], at.int8()),
     "u8": at.array([250, None], at.uint8()),
     "i16": at.array([-300, None], at.int16()),
     "u16": at.array([60000, None], at.uint16()),
     "i32": at.array([-70000, None], at.int32()),
     "u32": at.array([4000000000, None], at.uint32()),
     "u64": at.array([2**63, None], at.uint64())},
    {"f32": at.array([1.5, None, float("nan")], at.float32()),
     "f64": [2.5, None, float("inf")]},
    {"b": [True, None, False]},
    {"s": ["", "hello", None, "世界"]},
    {"bin": at.array([b"\x00\x01", None, b""], at.binary())},
    {"ls": at.array(["big", None], at.large_string()),
     "lb": at.array([b"raw", None], at.large_binary())},
    {"fsb": at.array([b"abc", None, b"xyz"], at.fixed_size_binary(3))},
    {"dec": at.array([decimal.Decimal("1.23"), None], at.decimal128(10, 2))},
    {"dec256": at.array([decimal.Decimal("999.99"), None],
                        at.decimal256(50, 2))},
    {"d32": at.array([datetime.date(2020, 1, 1), None])},
    {"ts": at.array([datetime.datetime(2021, 2, 3, 4, 5, 6, 789)],
                    at.timestamp("us"))},
    {"tstz": at.array([0, None], at.timestamp("ms", "UTC"))},
    {"t32": at.array([1000, None], at.time32("ms")),
     "t64": at.array([123456789, None], at.time64("us"))},
    {"dur": at.array([datetime.timedelta(days=2), None], at.duration("us"))},
    {"list": at.array([[1, 2], None, []], at.list_(at.int64()))},
    {"ll": at.array([[1.5], None], at.large_list(at.float64()))},
    {"fsl": at.array([[1, 2, 3], None], at.fixed_size_list(at.int32(), 3))},
    {"struct": at.array([{"a": 1, "b": "x"}, None],
                        at.struct([("a", at.int64()), ("b", at.string())]))},
    {"map": at.array([[("k", 1)], None, []], at.map_(at.string(), at.int64()))},
    {"dict": at.array(["a", "b", "a", None],
                      at.dictionary(at.int32(), at.string()))},
    {"nested_list": at.array([[[1], None], None],
                             at.list_(at.list_(at.int64())))},
    {"null_col": at.array([None, None, None], at.null())},
]


@pytest.mark.parametrize("case", range(len(SIMPLE_CASES)))
def test_stream_roundtrip_and_pyarrow_read(case):
    tbl = at.table(SIMPLE_CASES[case])
    data = ipc.serialize_table(tbl)
    # self round-trip
    back = ipc.deserialize_table(data)
    assert back.equals(tbl)
    # pyarrow reads our bytes and sees the same values
    pa_tbl = our_to_pa(data)
    assert pylist_equal(pa_tbl.to_pylist(), tbl.to_pylist())
    # pyarrow re-writes; we read it back identically
    ours = ipc.deserialize_table(pa_to_bytes(pa_tbl))
    assert pylist_equal(ours.to_pylist(), tbl.to_pylist())


def test_file_format_roundtrip():
    tbl = at.table({"x": [1, None, 3], "y": ["a", "b", None]})
    buf = io.BytesIO()
    with ipc.new_file(buf, tbl.schema) as w:
        w.write_table(tbl, max_chunksize=2)
    fr = ipc.open_file(buf.getvalue())
    assert fr.num_record_batches == 2
    assert fr.read_all().equals(tbl)
    assert fr.get_batch(1).to_pydict() == {"x": [3], "y": [None]}
    # pyarrow reads our file
    pf = paipc.open_file(pa.BufferReader(buf.getvalue()))
    assert pf.read_all().to_pylist() == tbl.to_pylist()


def test_file_format_from_pyarrow():
    pa_tbl = pa.table({"x": [1, 2, None], "d": pa.array(["u", "v", "u"]).dictionary_encode()})
    sink = pa.BufferOutputStream()
    with paipc.new_file(sink, pa_tbl.schema) as w:
        w.write_table(pa_tbl)
    fr = ipc.open_file(sink.getvalue().to_pybytes())
    assert fr.read_all().to_pylist() == pa_tbl.to_pylist()


def test_zstd_compression():
    tbl = at.table({"x": list(range(10000))})
    data = ipc.serialize_table(tbl, codec="zstd")
    raw = ipc.serialize_table(tbl)
    assert len(data) < len(raw)
    assert ipc.deserialize_table(data).equals(tbl)
    # pyarrow reads our compressed stream
    assert our_to_pa(data).to_pylist() == tbl.to_pylist()
    # and we read pyarrow's compressed stream
    sink = pa.BufferOutputStream()
    opts = paipc.IpcWriteOptions(compression="zstd")
    pa_tbl = pa.table({"x": list(range(10000))})
    with paipc.new_stream(sink, pa_tbl.schema, options=opts) as w:
        w.write_table(pa_tbl)
    assert ipc.deserialize_table(
        sink.getvalue().to_pybytes()).to_pydict() == tbl.to_pydict()


def test_sliced_arrays_serialize_rebased():
    a = at.array([1, 2, None, 4, 5]).slice(1, 3)
    tbl = at.Table.from_batches(
        [at.RecordBatch.from_arrays([a], ["x"])])
    data = ipc.serialize_table(tbl)
    assert ipc.deserialize_table(data).column("x").to_pylist() == [2, None, 4]
    assert our_to_pa(data).column("x").to_pylist() == [2, None, 4]


def test_schema_metadata_roundtrip():
    s = at.schema([at.field("x", at.int64(), metadata={"k": "v"})],
                  metadata={"tbl": "meta"})
    tbl = at.Table.from_batches(
        [at.RecordBatch(s, [at.array([1, 2])])], schema=s)
    data = ipc.serialize_table(tbl)
    back = ipc.open_stream(data)
    assert back.schema.metadata == {b"tbl": b"meta"}
    assert back.schema.fields[0].metadata == {b"k": b"v"}
    pa_schema = our_to_pa(data).schema
    assert pa_schema.metadata == {b"tbl": b"meta"}


def test_multi_batch_stream_with_shared_dictionary():
    t = at.dictionary(at.int32(), at.string())
    b1 = at.RecordBatch.from_arrays([at.array(["x", "y"], t)], ["d"])
    b2 = at.RecordBatch.from_arrays([at.array(["x", "y"], t)], ["d"])
    buf = io.BytesIO()
    with ipc.new_stream(buf, b1.schema) as w:
        w.write_batch(b1)
        w.write_batch(b2)
    batches = list(ipc.open_stream(buf.getvalue()))
    assert len(batches) == 2
    assert batches[1].column("d").to_pylist() == ["x", "y"]


def test_random_differential_vs_pyarrow():
    rng = np.random.default_rng(42)
    n = 1000
    mask = rng.random(n) < 0.2
    ints = rng.integers(-1000, 1000, n)
    floats = rng.normal(size=n)
    strs = [None if m else f"s{v}" for m, v in zip(mask, ints)]
    tbl = at.table({
        "i": [None if m else int(v) for m, v in zip(mask, ints)],
        "f": [None if m else float(v) for m, v in zip(mask, floats)],
        "s": strs,
    })
    data = ipc.serialize_table(tbl)
    assert our_to_pa(data).to_pylist() == tbl.to_pylist()
    assert ipc.deserialize_table(pa_to_bytes(our_to_pa(data))).equals(tbl)


def test_interval_day_time_and_month_day_nano():
    """INTERVAL_DAY_TIME / INTERVAL_MONTH_DAY_NANO construction, decode,
    and IPC (format/Schema.fbs Interval units)."""
    import io
    t = at.table(
        {"mi": at.array([(1, 2, 3), None], at.month_day_nano_interval()),
         "dt": at.array([(5, 250), None], at.day_time_interval())},
        schema=at.schema([at.field("mi", at.month_day_nano_interval()),
                          at.field("dt", at.day_time_interval())]))
    buf = io.BytesIO()
    with ipc.new_stream(buf, t.schema) as w:
        w.write_table(t)
    buf.seek(0)
    assert ipc.open_stream(buf).read_all().to_pydict() == t.to_pydict()
    buf.seek(0)
    pt = pa.ipc.open_stream(buf).read_all()
    # pyarrow v25 cannot to_pylist day_time intervals; check what it can
    assert pt.column("mi").to_pylist() == [
        pa.MonthDayNano([1, 2, 3]), None]
    # pyarrow-written MDN stream read by us
    src = pa.table({"mi": pa.array([(9, 8, 7)],
                                   pa.month_day_nano_interval())})
    b2 = io.BytesIO()
    with pa.ipc.new_stream(b2, src.schema) as w:
        w.write_table(src)
    b2.seek(0)
    assert ipc.open_stream(b2).read_all().to_pydict() == {
        "mi": [(9, 8, 7)]}


# --- pyarrow.ipc compat layer (ipc/compat.py) --------------------------------


class TestIpcCompat:
    def test_message_reader_and_schema(self):
        t = at.table({"a": [1, 2, None], "s": ["x", None, "z"]})
        raw = ipc.serialize_table(t)
        msgs = list(ipc.MessageReader(raw))
        assert [m.header_type for m in msgs] == [1, 3]  # schema, batch
        sch = ipc.read_schema(raw)
        assert [f.name for f in sch] == ["a", "s"]
        rb = ipc.read_record_batch(msgs[1], sch)
        assert rb.to_pydict() == t.to_pydict()
        assert ipc.read_message(raw).header_type == 1

    def test_batch_size_and_options(self):
        t = at.table({"a": list(range(100))})
        raw = ipc.serialize_table(t)
        sz = ipc.get_record_batch_size(t.to_batches()[0])
        assert 0 < sz < len(raw)
        assert ipc.IpcWriteOptions(compression="zstd").compression == \
            "zstd"
        assert ipc.IpcReadOptions().use_threads
        assert ipc.MetadataVersion.V5 == 5

    def test_tensor_reexport(self):
        import io as _io

        import numpy as np
        from arrow_tpu.tensor import Tensor
        sink = _io.BytesIO()
        ipc.write_tensor(Tensor(np.arange(6).reshape(2, 3)), sink)
        back = ipc.read_tensor(_io.BytesIO(sink.getvalue()))
        assert back.to_numpy().tolist() == [[0, 1, 2], [3, 4, 5]]
