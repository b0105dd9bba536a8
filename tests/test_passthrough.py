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
