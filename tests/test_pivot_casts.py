"""Parse casts, random, host grouped aggs (list/distinct/pivot_wider),
pivot_longer node, runtime info."""

import datetime
from decimal import Decimal

import pyarrow as pa
import pyarrow.compute as ppc
import pytest

import arrow_tpu as at
import arrow_tpu.compute as pc
from arrow_tpu import acero as ac
from arrow_tpu.compute import ArrowInvalid


# --- string -> value casts ---------------------------------------------------

def test_cast_string_to_int():
    s = at.array(["1", " 42 ", "-7", None])
    assert pc.cast(s, options={"to_type": at.int64()}).to_pylist() == \
        [1, 42, -7, None]


def test_cast_string_to_float_and_bool():
    assert pc.cast(at.array(["1.5", "2e3", None]),
                   options={"to_type": at.float64()}).to_pylist() == \
        [1.5, 2000.0, None]
    assert pc.cast(at.array(["true", "0", "YES", None]),
                   options={"to_type": at.bool_()}).to_pylist() == \
        [True, False, True, None]


def test_cast_string_to_temporal():
    d = pc.cast(at.array(["2020-01-02", "1969-12-31", None]),
                options={"to_type": at.date32()})
    assert d.to_pylist() == [datetime.date(2020, 1, 2),
                             datetime.date(1969, 12, 31), None]
    ts = pc.cast(at.array(["2020-01-02 03:04:05.250000"]),
                 options={"to_type": at.timestamp("ms")})
    assert ts.to_pylist() == [
        datetime.datetime(2020, 1, 2, 3, 4, 5, 250000)]


def test_cast_string_parse_errors():
    bad = at.array(["12", "xx"])
    with pytest.raises(ArrowInvalid):
        pc.cast(bad, options={"to_type": at.int64()})
    assert pc.cast(bad, options={"to_type": at.int64(),
                                 "safe": False}).to_pylist() == [12, None]


# --- value -> string casts (differential vs pyarrow) ------------------------

@pytest.mark.parametrize("vals,patype", [
    ([1, -2, None], pa.int64()),
    ([1.5, 2.0, None], pa.float64()),
    ([True, False, None], pa.bool_()),
    ([datetime.date(2020, 1, 2), None], pa.date32()),
])
def test_cast_to_string_matches_pyarrow(vals, patype):
    mine = pc.cast(at.array(vals),
                   options={"to_type": at.string()}).to_pylist()
    ref = ppc.cast(pa.array(vals, patype), pa.string()).to_pylist()
    assert mine == ref


@pytest.mark.parametrize("unit", ["s", "ms", "us", "ns"])
def test_cast_timestamp_to_string_matches_pyarrow(unit):
    tv = [datetime.datetime(2020, 1, 2, 3, 4, 5,
                            250000 if unit != "s" else 0), None]
    mine = pc.cast(at.array(tv, at.timestamp(unit)),
                   options={"to_type": at.string()}).to_pylist()
    ref = ppc.cast(pa.array(tv, pa.timestamp(unit)),
                   pa.string()).to_pylist()
    assert mine == ref


# --- random ------------------------------------------------------------------

def test_random():
    r1 = pc.random(64, initializer=7).to_pylist()
    r2 = pc.random(64, initializer=7).to_pylist()
    assert r1 == r2
    assert all(0.0 <= v < 1.0 for v in r1)
    assert len(set(r1)) > 32
    rs = pc.random(8).to_pylist()
    assert len(rs) == 8


# --- host grouped aggregations ----------------------------------------------

def test_hash_list_matches_pyarrow():
    data = {"v": [1, None, 1, None, 5], "g": [1, 1, 2, 2, 1]}
    mine = at.table(data).group_by("g").aggregate([("v", "list")])
    ref = pa.table(data).group_by("g").aggregate([("v", "list")])
    assert mine.column("v_list").combine().to_pylist() == \
        ref.column("v_list").to_pylist()
    assert mine.column("g").combine().to_pylist() == \
        ref.column("g").to_pylist()


def test_hash_distinct_matches_pyarrow():
    data = {"v": [1, None, 1, 2, 2], "g": [1, 1, 1, 2, 2]}
    for opts in (None, {"mode": "all"}):
        spec = [("v", "distinct", opts)] if opts else [("v", "distinct")]
        mine = at.table(data).group_by("g").aggregate(spec)
        ref = pa.table(data).group_by("g").aggregate(
            [("v", "distinct", ppc.CountOptions(**(opts or {})))]
            if opts else [("v", "distinct")])
        assert mine.column("v_distinct").combine().to_pylist() == \
            ref.column("v_distinct").to_pylist()


def test_hash_list_strings():
    t = at.table({"v": ["x", "y", "x"], "g": [1, 1, 2]})
    r = t.group_by("g").aggregate([("v", "list")])
    assert r.column("v_list").combine().to_pylist() == [["x", "y"], ["x"]]


def test_mixed_device_and_host_aggs():
    t = at.table({"v": [1.0, 2.0, 3.0, 4.0], "g": [1, 1, 2, 2]})
    r = t.group_by("g").aggregate([("v", "sum"), ("v", "list")])
    assert r.column_names == ["g", "v_sum", "v_list"]
    assert r.column("v_sum").combine().to_pylist() == [3.0, 7.0]
    assert r.column("v_list").combine().to_pylist() == \
        [[1.0, 2.0], [3.0, 4.0]]


def test_hash_pivot_wider_matches_pyarrow():
    data = {"k": ["a", "b", "a", "b"], "v": [1.0, 2.0, 3.0, 4.0],
            "g": [1, 1, 2, 2]}
    mine = at.table(data).group_by("g").aggregate(
        [(["k", "v"], "pivot_wider", {"key_names": ["a", "b"]})])
    ref = pa.table(data).group_by("g").aggregate(
        [(["k", "v"], "pivot_wider", ppc.PivotWiderOptions(["a", "b"]))])
    assert mine.column("k_v_pivot_wider").combine().to_pylist() == \
        ref.column("k_v_pivot_wider").to_pylist()


def test_pivot_wider_missing_key_is_null():
    t = at.table({"k": ["a"], "v": [1.0], "g": [1]})
    r = t.group_by("g").aggregate(
        [(["k", "v"], "pivot_wider", {"key_names": ["a", "b"]})])
    assert r.column("k_v_pivot_wider").combine().to_pylist() == \
        [{"a": 1.0, "b": None}]


def test_pivot_wider_duplicate_raises():
    t = at.table({"k": ["a", "a"], "v": [1.0, 2.0], "g": [1, 1]})
    with pytest.raises(ArrowInvalid):
        t.group_by("g").aggregate(
            [(["k", "v"], "pivot_wider", {"key_names": ["a"]})])


def test_pivot_wider_unexpected_key():
    t = at.table({"k": ["a", "zz"], "v": [1.0, 2.0], "g": [1, 1]})
    r = t.group_by("g").aggregate(
        [(["k", "v"], "pivot_wider", {"key_names": ["a"]})])
    assert r.column("k_v_pivot_wider").combine().to_pylist() == [{"a": 1.0}]
    with pytest.raises(ArrowInvalid):
        t.group_by("g").aggregate(
            [(["k", "v"], "pivot_wider",
              {"key_names": ["a"], "unexpected_key_behavior": "raise"})])


def test_scalar_pivot_wider_no_keys():
    t = at.table({"k": ["a", "b"], "v": [1.0, 2.0]})
    r = t.group_by([]).aggregate(
        [(["k", "v"], "pivot_wider", {"key_names": ["a", "b"]})])
    assert r.column("k_v_pivot_wider").combine().to_pylist() == \
        [{"a": 1.0, "b": 2.0}]


# --- pivot_longer node (examples from reference acero/options.h:800) --------

def _src(t):
    return ac.Declaration("table_source", ac.TableSourceNodeOptions(t))


def test_pivot_longer_basic():
    t = at.table({"time": [1, 2], "left_temp": [10, 15],
                  "right_temp": [20, 18]})
    opts = ac.PivotLongerNodeOptions(
        [ac.PivotLongerRowTemplate(["left"], ["left_temp"]),
         ac.PivotLongerRowTemplate(["right"], ["right_temp"])],
        ["location"], ["temp"])
    r = ac.Declaration("pivot_longer", opts, [_src(t)]).to_table()
    assert r.column_names == ["time", "location", "temp"]
    assert r.column("time").combine().to_pylist() == [1, 1, 2, 2]
    assert r.column("location").combine().to_pylist() == \
        ["left", "right", "left", "right"]
    assert r.column("temp").combine().to_pylist() == [10, 20, 15, 18]


def test_pivot_longer_null_measurements():
    t = at.table({"time": [0], "ax1": [1], "ay1": [2], "bx1": [3],
                  "ay2": [4]})
    opts = ac.PivotLongerNodeOptions(
        [(["a", "x"], ["ax1", None]), (["a", "y"], ["ay1", "ay2"]),
         (["b", "x"], ["bx1", None])],
        ["a/b", "x/y"], ["f1", "f2"])
    r = ac.Declaration("pivot_longer", opts, [_src(t)]).to_table()
    assert r.column("f1").combine().to_pylist() == [1, 2, 3]
    assert r.column("f2").combine().to_pylist() == [None, 4, None]


# --- runtime info ------------------------------------------------------------

def test_runtime_info():
    assert at.cpu_count() >= 1
    at.set_io_thread_count(4)
    assert at.io_thread_count() == 4
    info = at.runtime_info()
    assert info["version"] == at.__version__
    with pytest.raises(ValueError):
        at.set_cpu_count(0)


# --- view types --------------------------------------------------------------

def test_view_types_construct_and_decode():
    sv = at.array(["hello", "a-very-long-string-over-12-bytes", None],
                  at.string_view())
    assert sv.to_pylist() == ["hello",
                              "a-very-long-string-over-12-bytes", None]
    bv = at.array([b"ab", b"this-is-a-long-binary-value!!"],
                  at.binary_view())
    assert bv.to_pylist() == [b"ab", b"this-is-a-long-binary-value!!"]
    lv = at.array([[1, 2], [3], None], at.list_view(at.int64()))
    assert lv.to_pylist() == [[1, 2], [3], None]
    llv = at.array([[1.5], None], at.large_list_view(at.float64()))
    assert llv.to_pylist() == [[1.5], None]


def test_view_types_ipc_pyarrow_interop():
    import io
    from arrow_tpu import ipc
    sv = at.array(["short", "a-very-long-string-over-12-bytes", None],
                  at.string_view())
    lv = at.array([[1, 2], None, [3]], at.list_view(at.int64()))
    t = at.table({"sv": sv, "lv": lv})
    buf = io.BytesIO()
    with ipc.new_stream(buf, t.schema) as w:
        w.write_table(t)
    # we -> pyarrow
    pt = pa.ipc.open_stream(buf.getvalue()).read_all()
    pt.validate(full=True)
    assert str(pt.schema.field("sv").type) == "string_view"
    assert pt.to_pydict() == {
        "sv": ["short", "a-very-long-string-over-12-bytes", None],
        "lv": [[1, 2], None, [3]]}
    # pyarrow -> us
    pb = io.BytesIO()
    src = pa.table({
        "sv": pa.array(["x", "another-quite-long-string-here", None],
                       pa.string_view()),
        "llv": pa.array([[1.5], None, [2.5, 3.5]],
                        pa.large_list_view(pa.float64()))})
    with pa.ipc.new_stream(pb, src.schema) as w:
        w.write_table(src)
    t2 = ipc.open_stream(pb.getvalue()).read_all()
    assert t2.schema.field("sv").type == at.string_view()
    assert t2.column("sv").combine().to_pylist() == \
        ["x", "another-quite-long-string-here", None]
    assert t2.column("llv").combine().to_pylist() == \
        [[1.5], None, [2.5, 3.5]]


def test_view_strings_in_compute():
    sv = at.array(["b", "a", "b", None], at.string_view())
    t = at.table({"k": sv, "v": [1.0, 2.0, 3.0, 4.0]})
    r = t.group_by("k").aggregate([("v", "sum")])
    got = dict(zip(r.column("k").combine().to_pylist(),
                   r.column("v_sum").combine().to_pylist()))
    assert got == {"b": 4.0, "a": 2.0, None: 4.0}


# --- host cast matrix (cast_host.py vs scalar_cast_nested/dictionary.cc) ---


class TestHostCastMatrix:
    def test_list_casts(self):
        a = at.array([[1, 2], [3], None], at.list_(at.int64()))
        assert a.cast(at.list_(at.float64())).to_pylist() == \
            [[1.0, 2.0], [3.0], None]
        assert a.cast(at.large_list(at.int32())).to_pylist() == \
            [[1, 2], [3], None]
        fsl = at.array([[1, 2], [3, 4]], at.list_(at.int64()))
        out = fsl.cast(at.fixed_size_list(at.int32(), 2))
        assert out.to_pylist() == [[1, 2], [3, 4]]
        with pytest.raises(Exception):
            a.cast(at.fixed_size_list(at.int32(), 2))  # ragged

    def test_struct_cast(self):
        s = at.array([{"x": 1, "y": "2"}, None],
                     at.struct([at.field("x", at.int64()),
                                at.field("y", at.string())]))
        out = s.cast(at.struct([at.field("x", at.float32()),
                                at.field("y", at.int32())]))
        assert out.to_pylist() == [{"x": 1.0, "y": 2}, None]

    def test_dictionary_casts(self):
        d = at.array(["a", "b", "a"], at.string()).cast(
            at.dictionary(at.int8(), at.string()))
        assert d.type.id == at.TypeId.DICTIONARY
        assert d.cast(at.string()).to_pylist() == ["a", "b", "a"]
        di = at.array([1, 2, 1], at.int64()).cast(
            at.dictionary(at.int32(), at.int64()))
        assert di.cast(at.float64()).to_pylist() == [1.0, 2.0, 1.0]

    def test_binary_string_fsb(self):
        sb = at.array(["hé", None], at.string()).cast(at.binary())
        assert sb.to_pylist() == ["hé".encode(), None]
        assert sb.cast(at.string()).to_pylist() == ["hé", None]
        with pytest.raises(Exception):
            at.array([b"\xff\xfe"], at.binary()).cast(at.string())
        assert at.array([b"ab"], at.fixed_size_binary(2)) \
            .cast(at.binary()).to_pylist() == [b"ab"]
        assert at.array([b"ab"], at.binary()) \
            .cast(at.fixed_size_binary(2)).to_pylist() == [b"ab"]
        with pytest.raises(Exception):
            at.array([b"abc"], at.binary()).cast(at.fixed_size_binary(2))

    def test_decimal_casts(self):
        dec = at.array([Decimal("1.25"), None], at.decimal128(10, 2))
        assert dec.cast(at.float64()).to_pylist() == [1.25, None]
        assert dec.cast(at.decimal128(12, 4)).to_pylist() == \
            [Decimal("1.2500"), None]
        with pytest.raises(Exception):
            dec.cast(at.decimal128(10, 1))  # lossy rescale
        assert at.array([3], at.int64()).cast(
            at.decimal128(5, 2)).to_pylist() == [Decimal("3.00")]
        assert at.array([Decimal("7.00")], at.decimal128(5, 2)).cast(
            at.int64()).to_pylist() == [7]
        with pytest.raises(Exception):
            at.array([Decimal("7.50")], at.decimal128(5, 2)).cast(
                at.int64())

    def test_null_and_map(self):
        assert at.array([None, None], at.null()).cast(
            at.int64()).to_pylist() == [None, None]
        m = at.array([[("k", 1)]], at.map_(at.string(), at.int64()))
        assert m.cast(at.map_(at.string(), at.float64())).to_pylist() == \
            [[("k", 1.0)]]

    def test_vs_pyarrow(self):
        import pyarrow as pa
        import pyarrow.compute as ppc
        ours = at.array([[1, 2], [3], None], at.list_(at.int64())).cast(
            at.list_(at.float64())).to_pylist()
        ref = ppc.cast(pa.array([[1, 2], [3], None], pa.list_(pa.int64())),
                       pa.list_(pa.float64())).to_pylist()
        assert ours == ref

    def test_extension_casts(self):
        from arrow_tpu import extension as ext
        et = ext.ExtensionType(at.fixed_size_binary(4), "at.test_ext")
        storage = at.array([b"abcd"], at.fixed_size_binary(4))
        e = storage.cast(et)
        assert e.type.extension_name_ == "at.test_ext"
        assert e.cast(at.binary()).to_pylist() == [b"abcd"]
        assert e.cast(at.string()).to_pylist() == ["abcd"]
