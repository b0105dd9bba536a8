"""DataFrame interchange protocol + canonical extension types.

Reference analogues: python/pyarrow/interchange/ and
cpp/src/arrow/extension/ (fixed_shape_tensor.h, uuid/json/bool8/opaque).
"""

import io

import numpy as np
import pytest

import arrow_tpu as at
from arrow_tpu import ipc


def _table():
    return at.table({
        "i": at.array([1, None, 3], at.int64()),
        "f": at.array([1.5, 2.5, None], at.float64()),
        "s": at.array(["x", None, "zzz"], at.string()),
        "b": at.array([True, False, None], at.bool_()),
        "ts": at.array([1000, 2000, 3000], at.timestamp("us")),
        "d": at.array(["a", "b", "a"],
                      at.dictionary(at.int32(), at.string())),
    })


def test_protocol_shape():
    t = _table()
    df = t.__dataframe__()
    assert df.num_columns() == 6
    assert df.num_rows() == 3
    assert df.column_names() == ["i", "f", "s", "b", "ts", "d"]
    col = df.get_column_by_name("i")
    assert col.size() == 3
    assert col.null_count == 1
    kind, bits, fmt, _ = col.dtype
    assert (int(kind), bits, fmt) == (0, 64, "l")
    bufs = col.get_buffers()
    assert bufs["validity"] is not None
    assert bufs["offsets"] is None
    s = df.get_column_by_name("s")
    assert s.get_buffers()["offsets"] is not None
    d = df.get_column_by_name("d")
    assert int(d.dtype[0]) == 23  # CATEGORICAL
    assert d.describe_categorical["is_dictionary"]


def test_pyarrow_consumes_ours():
    pa = pytest.importorskip("pyarrow")
    from pyarrow.interchange import from_dataframe
    t = _table()
    pt = from_dataframe(t)
    assert pt.num_rows == 3
    assert pt.column("i").to_pylist() == [1, None, 3]
    assert pt.column("s").to_pylist() == ["x", None, "zzz"]
    assert pt.column("b").to_pylist() == [True, False, None]
    assert pt.column("d").to_pylist() == ["a", "b", "a"]


def test_we_consume_pandas():
    pd = pytest.importorskip("pandas")
    df = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", None],
                       "z": [0.5, None, 2.0]})
    t = at.interchange.from_dataframe(df)
    assert t.column("x").to_pylist() == [1, 2, 3]
    assert t.column("y").to_pylist() == ["a", "b", None]
    assert t.column("z").to_pylist() == [0.5, None, 2.0]


def test_we_consume_pyarrow():
    pa = pytest.importorskip("pyarrow")
    src = pa.table({"k": [10, None], "s": ["u", "vv"],
                    "c": pa.array(["p", "q"]).dictionary_encode()})
    t = at.interchange.from_dataframe(src)
    assert t.column("k").to_pylist() == [10, None]
    assert t.column("s").to_pylist() == ["u", "vv"]
    assert t.column("c").to_pylist() == ["p", "q"]


def test_roundtrip_through_protocol():
    t = _table()
    back = at.interchange.from_dataframe(t.__dataframe__()) \
        if not isinstance(t, at.Table) else at.interchange.from_dataframe(t)
    assert back.column("i").to_pylist() == [1, None, 3]


def test_chunked_protocol():
    t = _table()
    df = t.__dataframe__()
    chunks = list(df.get_chunks(n_chunks=2))
    assert sum(c.num_rows() for c in chunks) == 3


# --- extension types --------------------------------------------------------

def test_extension_factories():
    assert at.uuid().extension_name == "arrow.uuid"
    assert at.bool8().storage_type == at.int8()
    assert at.json_().storage_type == at.string()
    op = at.opaque(at.binary(), "geometry", "postgis")
    assert b"postgis" in op.extension_metadata()
    fst = at.fixed_shape_tensor(at.float32(), [2, 3])
    assert fst.storage_type == at.fixed_size_list(at.float32(), 6)
    assert fst.shape == [2, 3]
    vst = at.variable_shape_tensor(at.float32(), 2)
    assert vst.ndim == 2


def test_fixed_shape_tensor_array():
    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    ta = at.FixedShapeTensorArray.from_numpy_ndarray(arr)
    assert ta.type.shape == [3, 4]
    back = ta.to_numpy_ndarray()
    np.testing.assert_array_equal(back, arr)


def test_extension_array_from_storage():
    fst = at.fixed_shape_tensor(at.float32(), [2])
    storage = at.array([[1.0, 2.0], [3.0, 4.0]],
                       at.fixed_size_list(at.float32(), 2))
    ea = at.ExtensionArray.from_storage(fst, storage)
    assert isinstance(ea, at.FixedShapeTensorArray)
    assert len(ea) == 2
    with pytest.raises(TypeError):
        at.ExtensionArray.from_storage(
            fst, at.array([1.0], at.float64()))


def test_tensor_extension_ipc_pyarrow_interop():
    pa = pytest.importorskip("pyarrow")
    import pyarrow.ipc as paipc
    fst = at.fixed_shape_tensor(at.float32(), [2, 2])
    storage = at.array([[1.0, 2.0, 3.0, 4.0]],
                       at.fixed_size_list(at.float32(), 4))
    from arrow_tpu.types import Field, Schema
    rb = at.RecordBatch(Schema([Field("t", fst, True)]), [storage])
    buf = io.BytesIO()
    with ipc.new_stream(buf, rb.schema) as w:
        w.write_batch(rb)
    got = paipc.open_stream(buf.getvalue()).read_all()
    assert "fixed_shape_tensor" in str(got.schema.field("t").type)
    assert got.column("t").combine_chunks().storage.to_pylist() == \
        [[1.0, 2.0, 3.0, 4.0]]
