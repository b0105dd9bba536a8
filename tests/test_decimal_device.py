"""Device decimal arithmetic: decimal128/256 (precision <= 18) as scaled
int64 on device (SURVEY §2.2 'decimals -> int64 on TPU'; reference:
util/decimal.h + compute/kernels scalar_arithmetic.cc decimal paths)."""
from decimal import Decimal

import pytest

import arrow_tpu as at
import arrow_tpu.compute as pc
from arrow_tpu.compute.registry import ArrowInvalid
from arrow_tpu.device.column import download_table, upload_table


def _dec_table():
    return at.table(
        {"a": [Decimal("1.25"), Decimal("3.50"), None],
         "b": [Decimal("0.75"), Decimal("-1.00"), Decimal("2.00")]},
        schema=at.schema([at.field("a", at.decimal128(10, 2)),
                          at.field("b", at.decimal128(10, 2))]))


def test_decimal_upload_download_roundtrip():
    t = _dec_table()
    back = download_table(upload_table(t))
    assert back.to_pydict() == t.to_pydict()


def test_decimal_add_subtract_multiply():
    t = _dec_table()
    a, b = t.column("a").combine(), t.column("b").combine()
    s = pc.add(a, b)
    assert s.to_pylist() == [Decimal("2.00"), Decimal("2.50"), None]
    assert s.type.scale == 2
    d = pc.subtract(a, b)
    assert d.to_pylist() == [Decimal("0.50"), Decimal("4.50"), None]
    m = pc.multiply(a, b)
    assert m.to_pylist() == [Decimal("0.9375"), Decimal("-3.5000"), None]
    assert m.type.scale == 4
    m3 = pc.multiply(a, 3)
    assert m3.to_pylist() == [Decimal("3.75"), Decimal("10.50"), None]


def test_decimal_divide_and_product_raise():
    t = _dec_table()
    a, b = t.column("a").combine(), t.column("b").combine()
    with pytest.raises(ArrowInvalid):
        pc.divide(a, b)
    with pytest.raises(ArrowInvalid):
        pc.product(a)


def test_decimal_scalar_aggregates():
    t = _dec_table()
    a = t.column("a").combine()
    assert pc.sum(a).as_py() == Decimal("4.75")
    assert pc.sum(a).type.scale == 2
    assert pc.mean(a).as_py() == Decimal("2.38")  # pyarrow parity:
    # decimal mean stays decimal, rounded half away from zero
    mm = pc.min_max(a).as_py()
    assert mm == {"min": Decimal("1.25"), "max": Decimal("3.50")}
    assert pc.variance(a).as_py() == pytest.approx(1.265625)


def test_decimal_grouped_aggregates_and_sort():
    t = at.table(
        {"k": ["x", "y", "x"],
         "v": [Decimal("1.10"), Decimal("2.20"), Decimal("0.90")]},
        schema=at.schema([at.field("k", at.string()),
                          at.field("v", at.decimal128(9, 2))]))
    g = t.group_by("k").aggregate([("v", "sum"), ("v", "mean")])
    rows = sorted(zip(g.column("k").to_pylist(),
                      g.column("v_sum").to_pylist(),
                      g.column("v_mean").to_pylist()))
    assert rows == [("x", Decimal("2.00"), Decimal("1.00")),
                    ("y", Decimal("2.20"), Decimal("2.20"))]
    assert t.sort_by("v").column("v").to_pylist() == [
        Decimal("0.90"), Decimal("1.10"), Decimal("2.20")]


def test_decimal_add_scale_mismatch_raises():
    t = at.table(
        {"a": [Decimal("1.25")], "b": [Decimal("0.750")]},
        schema=at.schema([at.field("a", at.decimal128(10, 2)),
                          at.field("b", at.decimal128(10, 3))]))
    with pytest.raises(ArrowInvalid):
        pc.add(t.column("a").combine(), t.column("b").combine())


def test_decimal_precision_over_18_uploads_as_codes():
    # wide decimals ride as dictionary codes (tests/test_passthrough.py
    # covers the full key/sort/join semantics)
    t = at.table({"a": [Decimal("1.5")]},
                 schema=at.schema([at.field("a", at.decimal128(38, 1))]))
    back = download_table(upload_table(t))
    assert back.to_pydict() == t.to_pydict()


def test_decimal_join_key():
    l = at.table({"k": [Decimal("1.00"), Decimal("2.00")], "lv": [1, 2]},
                 schema=at.schema([at.field("k", at.decimal128(10, 2)),
                                   at.field("lv", at.int64())]))
    r = at.table({"k": [Decimal("2.00")], "rv": [9]},
                 schema=at.schema([at.field("k", at.decimal128(10, 2)),
                                   at.field("rv", at.int64())]))
    out = l.join(r, keys="k", join_type="inner")
    assert out.column("lv").to_pylist() == [2]
    assert out.column("rv").to_pylist() == [9]
