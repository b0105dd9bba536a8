"""JSON reader, PyCapsule protocol, pandas conversion, gandiva shim."""

import pyarrow as pa
import pytest

import arrow_tpu as at
from arrow_tpu.acero import field
from arrow_tpu.io.json import ParseOptions, read_json


def test_json_inference_matches_pyarrow():
    data = b'{"a": 1, "b": "x"}\n{"a": null, "b": "y", "c": 2.5}\n'
    ours = read_json(data)
    import pyarrow.json as pajson
    theirs = pajson.read_json(pa.BufferReader(data))
    assert ours.to_pydict() == theirs.to_pydict()


def test_json_nested_and_schema():
    data = b'{"s": {"x": 1}, "l": [1, 2]}\n{"s": null, "l": []}\n'
    t = read_json(data)
    assert t.column("s").to_pylist() == [{"x": 1}, None]
    assert t.column("l").to_pylist() == [[1, 2], []]

    schema = at.schema([("a", at.float64())])
    t2 = read_json(b'{"a": 3}\n', parse_options=ParseOptions(
        explicit_schema=schema, unexpected_field_behavior="error"))
    assert t2.column("a").to_pylist() == [3.0]
    with pytest.raises(ValueError):
        read_json(b'{"a": 3, "zz": 1}\n', parse_options=ParseOptions(
            explicit_schema=schema, unexpected_field_behavior="error"))


def test_capsule_array_to_pyarrow():
    a = at.array([1, None, 3])
    assert pa.array(a).to_pylist() == [1, None, 3]
    s = at.array(["x", None])
    assert pa.array(s).to_pylist() == ["x", None]


def test_capsule_table_stream_to_pyarrow():
    t = at.table({"x": [1, 2], "s": ["a", None]})
    pa_t = pa.table(t)
    assert pa_t.to_pydict() == {"x": [1, 2], "s": ["a", None]}
    rb = at.record_batch({"y": [1.5]})
    assert pa.table(rb).to_pydict() == {"y": [1.5]}


def test_pandas_roundtrip():
    pd = pytest.importorskip("pandas")
    t = at.table({"x": [1, 2, 3], "f": [0.5, None, 2.5],
                  "s": ["a", "b", None]})
    df = t.to_pandas()
    assert list(df.columns) == ["x", "f", "s"]
    assert df["x"].tolist() == [1, 2, 3]
    back = at.Table.from_pandas(df)
    assert back.column("x").to_pylist() == [1, 2, 3]
    assert back.column("s").to_pylist() == ["a", "b", None]


def test_gandiva_projector_filter():
    from arrow_tpu import gandiva
    rb = at.record_batch({"a": [1.0, 2.0, 3.0], "b": [10.0, 20.0, 30.0]})
    proj = gandiva.make_projector(rb.schema, [
        (field("a") + field("b"), "sum"),
        gandiva.TreeExprBuilder.make_expression(field("a") * 2.0, "dbl"),
    ])
    out = proj.evaluate(rb)
    assert out[0].to_pylist() == [11.0, 22.0, 33.0]
    assert out[1].to_pylist() == [2.0, 4.0, 6.0]

    filt = gandiva.make_filter(
        rb.schema, gandiva.TreeExprBuilder.make_and(
            [field("a") > 1.0, field("b") < 30.0]))
    sel = filt.evaluate(rb)
    assert sel.to_array().to_pylist() == [1]

    # selection-vector projection (Projector::Evaluate w/ selection)
    out_sel = proj.evaluate(rb, selection=sel)
    assert out_sel[0].to_pylist() == [22.0]

    # projector/filter cache (gandiva/cache.h analogue): same schema +
    # exprs -> same compiled object
    filt2 = gandiva.make_filter(
        rb.schema, gandiva.TreeExprBuilder.make_and(
            [field("a") > 1.0, field("b") < 30.0]))
    assert filt2 is filt

    # compiled projector reused across many batches (the Gandiva
    # "compile once, evaluate many" contract)
    rb2 = at.record_batch({"a": [5.0, 6.0, 7.0], "b": [1.0, 1.0, 1.0]})
    out2 = proj.evaluate(rb2)
    assert out2[0].to_pylist() == [6.0, 7.0, 8.0]

    assert "add" in gandiva.get_registered_function_signatures()
