import datetime
import decimal

import numpy as np
import pytest

import arrow_tpu as at


def test_primitive_roundtrip():
    vals = [1, None, 3, -5]
    a = at.array(vals)
    assert a.type == at.int64()
    assert a.to_pylist() == vals
    assert a.null_count == 1
    assert len(a) == 4


def test_infer_types():
    assert at.array([1.5, 2]).type == at.float64()
    assert at.array([True, None]).type == at.bool_()
    assert at.array(["x"]).type == at.string()
    assert at.array([b"x"]).type == at.binary()
    assert at.array([None, None]).type == at.null()
    assert at.array([[1]]).type == at.list_(at.int64())
    assert at.array([{"a": 1}]).type == at.struct([("a", at.int64())])


def test_numpy_zero_copy():
    arr = np.arange(10, dtype=np.int32)
    a = at.array(arr)
    assert a.type == at.int32()
    assert a.to_pylist() == list(range(10))
    np.testing.assert_array_equal(a.to_numpy(), arr)


def test_slice_semantics():
    a = at.array([1, None, 3, 4, 5])
    s = a.slice(1, 3)
    assert s.to_pylist() == [None, 3, 4]
    assert s.null_count == 1
    ss = s.slice(1)
    assert ss.to_pylist() == [3, 4]
    # slices share buffers
    assert s.data.buffers[1] is a.data.buffers[1]


def test_binary_like():
    a = at.array(["", "abc", None, "Δδ"])
    assert a.to_pylist() == ["", "abc", None, "Δδ"]
    b = at.array([b"\x00\xff", None], at.binary())
    assert b.to_pylist() == [b"\x00\xff", None]
    ls = at.array(["x", None], at.large_string())
    assert ls.to_pylist() == ["x", None]


def test_fixed_size_binary_and_decimal():
    a = at.array([b"abcd", None], at.fixed_size_binary(4))
    assert a.to_pylist() == [b"abcd", None]
    d = at.array([decimal.Decimal("12.34"), None], at.decimal128(9, 2))
    assert d.to_pylist() == [decimal.Decimal("12.34"), None]
    neg = at.array([decimal.Decimal("-0.01")], at.decimal128(9, 2))
    assert neg.to_pylist() == [decimal.Decimal("-0.01")]


def test_temporal():
    d = at.array([datetime.date(2021, 6, 1), None])
    assert d.type == at.date32()
    assert d.to_pylist() == [datetime.date(2021, 6, 1), None]
    ts = at.array([datetime.datetime(2021, 6, 1, 12, 30, 15, 123456)])
    assert ts.to_pylist() == [datetime.datetime(2021, 6, 1, 12, 30, 15, 123456)]
    td = at.array([datetime.timedelta(seconds=90), None])
    assert td.to_pylist() == [datetime.timedelta(seconds=90), None]


def test_nested():
    l = at.array([[1, 2], None, []], at.list_(at.int64()))
    assert l.to_pylist() == [[1, 2], None, []]
    s = at.array([{"a": 1, "b": [2.5]}, None],
                 at.struct([("a", at.int64()), ("b", at.list_(at.float64()))]))
    assert s.to_pylist() == [{"a": 1, "b": [2.5]}, None]
    m = at.array([[("k1", 1), ("k2", 2)], None], at.map_(at.string(), at.int64()))
    assert m.to_pylist() == [[("k1", 1), ("k2", 2)], None]
    fsl = at.array([[1, 2], None], at.fixed_size_list(at.int16(), 2))
    assert fsl.to_pylist() == [[1, 2], None]
    deep = at.array([[[1], [None]], None], at.list_(at.list_(at.int64())))
    assert deep.to_pylist() == [[[1], [None]], None]


def test_dictionary():
    a = at.array(["a", "b", "a", None, "c"],
                 at.dictionary(at.int32(), at.string()))
    assert a.to_pylist() == ["a", "b", "a", None, "c"]
    assert a.dictionary.to_pylist() == ["a", "b", "c"]
    assert a.indices.to_pylist() == [0, 1, 0, None, 2]


def test_chunked_and_table():
    ca = at.chunked_array([[1, 2], [3, None]], at.int64())
    assert len(ca) == 4
    assert ca.to_pylist() == [1, 2, 3, None]
    assert ca.slice(1, 2).to_pylist() == [2, 3]
    assert ca.combine().to_pylist() == [1, 2, 3, None]

    t = at.table({"x": [1, 2, 3], "y": ["a", None, "c"]})
    assert t.num_rows == 3
    assert t.column("y").to_pylist() == ["a", None, "c"]
    assert t.select(["y"]).column_names == ["y"]
    assert t.slice(1, 1).to_pydict() == {"x": [2], "y": [None]}
    batches = t.to_batches(2)
    assert [b.num_rows for b in batches] == [2, 1]


def test_table_equality():
    t1 = at.table({"x": [1, None]})
    t2 = at.table({"x": [1, None]})
    t3 = at.table({"x": [1, 2]})
    assert t1.equals(t2)
    assert not t1.equals(t3)


def test_concat_chunked_strings():
    ca = at.chunked_array([["a", None], ["bb"]], at.string())
    assert ca.combine().to_pylist() == ["a", None, "bb"]


def test_concat_sliced_chunks():
    a = at.array([1, 2, 3, 4]).slice(1, 2)
    b = at.array([9, None]).slice(1)
    ca = at.ChunkedArray([a, b])
    assert ca.combine().to_pylist() == [2, 3, None]


def test_builders():
    """Incremental builders (reference: array/builder_base.h:97 ff)."""
    b = at.Int64Builder()
    b.append(1).append_null().extend([3, None, 5])
    arr = b.finish()
    assert arr.to_pylist() == [1, None, 3, None, 5]
    assert arr.type == at.int64()
    assert len(b) == 0  # reset after finish

    sb = at.StringBuilder()
    sb.extend(["x", None, "y"])
    assert sb.finish().to_pylist() == ["x", None, "y"]

    ab = at.AdaptiveIntBuilder()
    ab.extend([1, 2, 3])
    assert ab.finish().type == at.int8()
    ab.extend([1, 1 << 40])
    assert ab.finish().type == at.int64()

    lb = at.ListBuilder(at.int64())
    lb.append([1, 2]).append_null().append([])
    assert lb.finish().to_pylist() == [[1, 2], None, []]

    stb = at.StructBuilder([("a", at.int64()), ("b", at.string())])
    stb.append({"a": 1, "b": "q"}).append_null()
    assert stb.finish().to_pylist() == [{"a": 1, "b": "q"}, None]

    db = at.DictionaryBuilder(at.string())
    db.extend(["u", "v", "u", None])
    d = db.finish()
    assert d.to_pylist() == ["u", "v", "u", None]
    assert d.type.id == at.TypeId.DICTIONARY

    fb = at.builder_for(at.float64())
    fb.extend([1.5, None])
    assert fb.finish().to_pylist() == [1.5, None]
