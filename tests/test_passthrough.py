"""Host-passthrough device tier: columns with no fixed-width device
representation (nested types, fixed-size binary, decimals wider than 18
digits) ride plans as dictionary/row-id codes and rehydrate at download.

Reference parity target: Acero moves such columns through
filter/take/sort/join unchanged (vector_selection.cc handles every nested
layout); its Grouper accepts fixed-size binary and decimal keys
(compute/row/encode_internal.h fixed-width encoders).
"""
from decimal import Decimal

import pytest

import arrow_tpu as at
import arrow_tpu.types as T
from arrow_tpu.acero import field

pa = pytest.importorskip("pyarrow")


def _roundtrip_pa(t):
    import pyarrow as _pa
    from arrow_tpu import ipc
    return _pa.ipc.open_stream(ipc.serialize_table(t)).read_all()


def test_filter_table_with_list_column():
    t = at.table({"k": [1, 2, 3], "v": [[1, 2], [3], [4, 5]]})
    out = t.filter(field("k") > 1)
    assert out.to_pylist() == [{"k": 2, "v": [3]}, {"k": 3, "v": [4, 5]}]


def test_sort_table_with_struct_column():
    s = at.array([{"a": 1}, {"a": 2}, None],
                 T.struct([("a", T.int64())]))
    t = at.Table.from_arrays([at.array([3, 1, 2]), s], names=["k", "s"])
    out = t.sort_by([("k", "ascending")])
    assert out.to_pylist() == [
        {"k": 1, "s": {"a": 2}}, {"k": 2, "s": None},
        {"k": 3, "s": {"a": 1}}]


def test_take_map_column_through_fetch():
    m = at.array([[("x", 1)], [("y", 2)], [("z", 3)]],
                 T.map_(T.string(), T.int64()))
    t = at.Table.from_arrays([at.array([1, 2, 3]), m], names=["k", "m"])
    from arrow_tpu import acero
    out = acero.Declaration.from_sequence([
        acero.Declaration("table_source",
                          acero.TableSourceNodeOptions(t)),
        acero.Declaration("fetch", acero.FetchNodeOptions(1, 2)),
    ]).to_table()
    assert out.to_pylist() == [{"k": 2, "m": [("y", 2)]},
                               {"k": 3, "m": [("z", 3)]}]


class TestFixedSizeBinary:
    def _table(self):
        fsb = at.array([b"abc", b"def", b"abc", None],
                       T.fixed_size_binary(3))
        v = at.array([1.0, 2.0, 3.0, 4.0])
        return at.Table.from_arrays([fsb, v], names=["f", "v"])

    def _pa_table(self):
        return _roundtrip_pa(self._table())

    def test_roundtrip(self):
        from arrow_tpu.device.column import download_table, upload_table
        t = self._table()
        assert download_table(upload_table(t)).to_pydict() == t.to_pydict()

    def test_group_by_fsb_key_matches_pyarrow(self):
        ours = self._table().group_by("f").aggregate([("v", "sum")])
        theirs = self._pa_table().group_by("f").aggregate([("v", "sum")])
        assert sorted(ours.to_pylist(),
                      key=lambda r: (r["f"] is None, r["f"])) == \
            sorted(theirs.to_pylist(),
                   key=lambda r: (r["f"] is None, r["f"]))

    def test_sort_matches_pyarrow(self):
        ours = self._table().sort_by([("f", "descending")])
        theirs = self._pa_table().sort_by([("f", "descending")])
        assert ours.to_pylist() == theirs.to_pylist()

    def test_join_on_fsb_key(self):
        left = self._table()
        right = at.Table.from_arrays(
            [at.array([b"abc", b"zzz"], T.fixed_size_binary(3)),
             at.array(["hit", "miss"])], names=["f", "tag"])
        out = left.join(right, keys="f", join_type="inner")
        assert sorted(r["v"] for r in out.to_pylist()) == [1.0, 3.0]
        assert {r["tag"] for r in out.to_pylist()} == {"hit"}


class TestWideDecimal:
    BIG = Decimal("12345678901234567890.123")

    def _table(self):
        d = at.array([self.BIG, Decimal("-1.5"), None, self.BIG],
                     T.decimal128(38, 3))
        return at.Table.from_arrays([d, at.array([1, 2, 3, 4])],
                                    names=["d", "i"])

    def test_roundtrip(self):
        from arrow_tpu.device.column import download_table, upload_table
        t = self._table()
        assert download_table(upload_table(t)).to_pydict() == t.to_pydict()

    def test_filter_carries_wide_decimal(self):
        out = self._table().filter(field("i") > 2)
        assert out.column("d").combine().to_pylist() == [None, self.BIG]

    def test_sort_by_wide_decimal_matches_pyarrow(self):
        ours = self._table().sort_by([("d", "ascending")])
        theirs = _roundtrip_pa(self._table()).sort_by([("d", "ascending")])
        assert ours.to_pylist() == theirs.to_pylist()

    def test_group_by_wide_decimal_key(self):
        out = self._table().group_by("d").aggregate([("i", "count")])
        by_key = {r["d"]: r["i_count"] for r in out.to_pylist()}
        assert by_key == {self.BIG: 2, Decimal("-1.500"): 1, None: 1}

    def test_join_on_wide_decimal_key(self):
        right = at.Table.from_arrays(
            [at.array([Decimal("-1.5"), Decimal("99.9")],
                      T.decimal128(38, 3)),
             at.array(["x", "y"])], names=["d", "tag"])
        out = self._table().join(right, keys="d", join_type="inner")
        assert out.to_pylist() == [{"d": Decimal("-1.500"), "i": 2,
                                    "tag": "x"}]

    def test_decimal256_roundtrip(self):
        from arrow_tpu.device.column import download_table, upload_table
        huge = Decimal(10) ** 50 + Decimal("0.25")
        d = at.array([huge, None, -huge], T.decimal256(76, 2))
        t = at.Table.from_arrays([d], names=["d"])
        assert download_table(upload_table(t)).to_pydict() == t.to_pydict()


class TestWideDecimalCompute:
    """Wide-decimal kernels run on the exact host tier; results diff-
    tested against pyarrow (reference decimal semantics: aggregate_basic
    /scalar_arithmetic decimal paths)."""

    def _arr(self):
        return [Decimal("12345678901234567890.12"), Decimal("-1.50"),
                None, Decimal("0.04")]

    def _ours(self):
        return at.array(self._arr(), T.decimal128(38, 2))

    def _theirs(self):
        return pa.array(self._arr(), pa.decimal128(38, 2))

    @pytest.mark.parametrize("fn", ["sum", "mean", "min", "max",
                                    "variance", "stddev"])
    def test_scalar_aggs_match_pyarrow(self, fn):
        import arrow_tpu.compute as pc
        import pyarrow.compute as ppc
        ours = getattr(pc, fn)(self._ours())
        theirs = getattr(ppc, fn)(self._theirs())
        assert ours.as_py() == theirs.as_py()

    def test_arithmetic_matches_pyarrow(self):
        import arrow_tpu.compute as pc
        import pyarrow.compute as ppc
        a = at.array([Decimal("1.5"), None], T.decimal128(19, 1))
        b = at.array([Decimal("2.55"), Decimal("1.00")], T.decimal128(10, 2))
        pa_a = pa.array([Decimal("1.5"), None], pa.decimal128(19, 1))
        pa_b = pa.array([Decimal("2.55"), Decimal("1.00")],
                        pa.decimal128(10, 2))
        for fn in ["add", "subtract", "multiply"]:
            ours = getattr(pc, fn)(a, b)
            theirs = getattr(ppc, fn)(pa_a, pa_b)
            assert ours.to_pylist() == theirs.to_pylist(), fn
            assert str(ours.type) == str(theirs.type), fn

    def test_multiply_overflow_raises_like_pyarrow(self):
        import arrow_tpu.compute as pc
        from arrow_tpu.compute.registry import ArrowInvalid
        a = at.array([Decimal("1.5")], T.decimal128(38, 1))
        with pytest.raises(ArrowInvalid):
            pc.multiply(a, a)

    def test_group_sum_mean_match_pyarrow(self):
        t = at.Table.from_arrays(
            [at.array([1, 1, 2, 2]), self._ours()], names=["k", "d"])
        pt = _roundtrip_pa(t)
        ours = t.group_by("k").aggregate(
            [("d", "sum"), ("d", "mean")]).sort_by([("k", "ascending")])
        theirs = pt.group_by("k").aggregate(
            [("d", "sum"), ("d", "mean")]).sort_by([("k", "ascending")])
        assert ours.to_pylist() == theirs.to_pylist()

    def test_filter_on_wide_decimal_predicate(self):
        t = at.Table.from_arrays(
            [self._ours(), at.array([1, 2, 3, 4])], names=["d", "i"])
        out = t.filter(field("d") > Decimal("0"))
        assert [r["i"] for r in out.to_pylist()] == [1, 4]


class TestDictMinMaxFix:
    """min/max on dictionary-coded columns must compare VALUES, not
    first-appearance codes (reference: aggregate_basic.cc MinMax on
    strings)."""

    def test_scalar_string_min_max(self):
        import arrow_tpu.compute as pc
        s = at.array(["zeta", "alpha", "mid"])
        assert pc.min(s).as_py() == "alpha"
        assert pc.max(s).as_py() == "zeta"

    def test_grouped_string_min_max_match_pyarrow(self):
        import pyarrow  # noqa
        t = at.Table.from_arrays(
            [at.array([1, 1, 2]), at.array(["zeta", "alpha", "mid"])],
            names=["k", "s"])
        pt = _roundtrip_pa(t)
        ours = t.group_by("k").aggregate(
            [("s", "min"), ("s", "max")]).sort_by([("k", "ascending")])
        theirs = pt.group_by("k").aggregate(
            [("s", "min"), ("s", "max")]).sort_by([("k", "ascending")])
        assert ours.to_pylist() == theirs.to_pylist()


def test_nested_grouping_raises_like_pyarrow():
    """Reference parity: the Grouper rejects nested key types
    (compute/row/grouper.cc); row-id passthrough codes must not silently
    group by row identity."""
    import arrow_tpu.compute as pc
    from arrow_tpu.compute.registry import ArrowInvalid
    l = at.array([[1, 2], [3], [1, 2]], T.list_(T.int64()))
    for fn in (pc.unique, pc.value_counts, pc.dictionary_encode):
        with pytest.raises(ArrowInvalid):
            fn(l)
    t = at.Table.from_arrays([l, at.array([1, 2, 3])], names=["l", "v"])
    with pytest.raises(ArrowInvalid):
        t.group_by("l").aggregate([("v", "sum")])
