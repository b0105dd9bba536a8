import pytest

import arrow_tpu as at
from arrow_tpu.types import TypeId


def test_type_ids_match_arrow():
    # discriminants are part of the interop contract
    assert TypeId.NA == 0
    assert TypeId.BOOL == 1
    assert TypeId.INT64 == 9
    assert TypeId.DOUBLE == 12
    assert TypeId.STRING == 13
    assert TypeId.DICTIONARY == 29
    assert TypeId.LARGE_LIST_VIEW == 42


def test_singletons_and_equality():
    assert at.int64() is at.int64()
    assert at.int64() == at.int64()
    assert at.int64() != at.int32()
    assert at.timestamp("us") == at.timestamp("us")
    assert at.timestamp("us") != at.timestamp("ns")
    assert at.timestamp("us", "UTC") != at.timestamp("us")
    assert at.decimal128(10, 2) == at.decimal128(10, 2)
    assert at.decimal128(10, 2) != at.decimal128(10, 3)
    assert at.list_(at.int32()) == at.list_(at.int32())
    assert at.struct([("a", at.int8())]) == at.struct([("a", at.int8())])
    assert hash(at.list_(at.int32())) == hash(at.list_(at.int32()))


def test_predicates():
    assert at.int32().is_integer and at.int32().is_signed_integer
    assert at.uint16().is_unsigned_integer
    assert at.float64().is_floating and at.float64().is_numeric
    assert at.date32().is_temporal
    assert at.list_(at.int32()).is_nested
    assert at.int64().bit_width == 64
    assert at.fixed_size_binary(7).byte_width == 7
    with pytest.raises(ValueError):
        at.string().bit_width


def test_schema_ops():
    s = at.schema([("a", at.int64()), ("b", at.string())])
    assert s.names == ["a", "b"]
    assert s.field("b").type == at.string()
    assert s.get_field_index("a") == 0
    assert s.get_field_index("zz") == -1
    s2 = s.append(at.field("c", at.bool_()))
    assert len(s2) == 3 and len(s) == 2
    assert s2.remove(0).names == ["b", "c"]
    assert s == at.schema([("a", at.int64()), ("b", at.string())])


def test_map_and_union_types():
    m = at.map_(at.string(), at.int64())
    assert m.key_type == at.string()
    assert m.item_type == at.int64()
    u = at.dense_union([at.field("i", at.int8()), at.field("s", at.string())])
    assert u.mode == "dense"
    assert u.type_codes == (0, 1)


def test_decimal32_64_types_and_ipc():
    """DECIMAL32=43 / DECIMAL64=44 (type_fwd.h:470,473): construction,
    IPC both directions vs pyarrow, C-data format strings."""
    import io
    from decimal import Decimal

    import pyarrow as pa

    from arrow_tpu import ipc
    for mk, pamk, bits in ((at.decimal32, pa.decimal32, 32),
                           (at.decimal64, pa.decimal64, 64)):
        t = mk(7, 2)
        assert t.bit_width == bits and t.byte_width == bits // 8
        a = at.array([Decimal("12.34"), None], t)
        assert a.to_pylist() == [Decimal("12.34"), None]
        out = pa.ipc.open_stream(
            ipc.serialize_table(at.table({"d": a}))).read_all()
        assert out.column("d").type == pamk(7, 2)
        pt = pa.table({"d": pa.array([Decimal("9.99")], pamk(6, 2))})
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, pt.schema) as w:
            w.write_table(pt)
        back = ipc.open_stream(io.BytesIO(sink.getvalue())).read_all()
        assert back.column("d").combine().to_pylist() == [Decimal("9.99")]
        assert pa.array(at.array([Decimal("1.25")], mk(6, 2))).type == \
            pamk(6, 2)


def test_type_predicates_match_pyarrow():
    """pa.types.is_* module-level predicates (python/pyarrow/types.py)."""
    import pytest
    pa = pytest.importorskip("pyarrow")
    import pyarrow.types as pt
    import arrow_tpu.types as att
    import arrow_tpu as at
    pairs = [
        (at.int32(), pa.int32()), (at.uint8(), pa.uint8()),
        (at.string(), pa.string()), (at.large_string(), pa.large_string()),
        (at.binary(), pa.binary()), (at.bool_(), pa.bool_()),
        (at.float16(), pa.float16()), (at.float64(), pa.float64()),
        (at.list_(at.int8()), pa.list_(pa.int8())),
        (at.fixed_size_list(at.int8(), 3), pa.list_(pa.int8(), 3)),
        (at.struct([("a", at.int8())]), pa.struct([("a", pa.int8())])),
        (at.map_(at.string(), at.int32()), pa.map_(pa.string(), pa.int32())),
        (at.timestamp("us"), pa.timestamp("us")),
        (at.duration("ms"), pa.duration("ms")),
        (at.time32("s"), pa.time32("s")), (at.date64(), pa.date64()),
        (at.decimal128(10, 2), pa.decimal128(10, 2)),
        (at.decimal32(4, 1), pa.decimal32(4, 1)),
        (at.dictionary(at.int32(), at.string()),
         pa.dictionary(pa.int32(), pa.string())),
        (at.null(), pa.null()),
    ]
    preds = [n for n in dir(pt)
             if n.startswith("is_") and not n.endswith("_value")]
    for ours_t, ref_t in pairs:
        for p in preds:
            assert getattr(att, p)(ours_t) == getattr(pt, p)(ref_t), \
                (p, str(ref_t))
    assert att.is_integer_value(3) and not att.is_integer_value(True)
    assert att.is_float_value(1.5) and att.is_boolean_value(False)
