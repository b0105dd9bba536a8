"""Differential tests: arrow_tpu.compute vs pyarrow.compute (the reference
oracle), per SURVEY §4 kernel-test strategy — deterministic cases plus a
randomized sweep with nulls."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as ppc
import pytest

import arrow_tpu as at
import arrow_tpu.compute as pc
from arrow_tpu.array.array import pylist_equal


def pa_of(arr: at.Array) -> pa.Array:
    return pa.array(arr.to_pylist(),
                    type=_pa_type(arr.type)) if arr.type.id != 0 else \
        pa.array(arr.to_pylist(), type=pa.null())


def _pa_type(t):
    m = {"int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(),
         "int64": pa.int64(), "uint8": pa.uint8(), "uint16": pa.uint16(),
         "uint32": pa.uint32(), "uint64": pa.uint64(),
         "float": pa.float32(), "double": pa.float64(), "bool": pa.bool_(),
         "string": pa.string()}
    return m[repr(t)]


def assert_same(ours, theirs, approx=False):
    ours_l = ours.to_pylist() if hasattr(ours, "to_pylist") else ours.as_py()
    theirs_l = (theirs.to_pylist() if isinstance(theirs, (pa.Array,
                                                          pa.ChunkedArray))
                else theirs.as_py())
    if approx:
        np.testing.assert_allclose(
            np.array(ours_l, dtype=np.float64),
            np.array(theirs_l, dtype=np.float64), rtol=1e-12, equal_nan=True)
    else:
        assert pylist_equal(ours_l, theirs_l), f"{ours_l} != {theirs_l}"


INT_DATA = [1, 2, None, -4, 5, 5, None, 0]
FLOAT_DATA = [1.5, None, -2.25, float("nan"), 0.0, 7.5, None, -0.0]
BOOL_DATA = [True, False, None, True, None, False, True, None]


BINARY_NUMERIC = ["add", "subtract", "multiply"]


@pytest.mark.parametrize("fname", BINARY_NUMERIC)
def test_binary_arithmetic(fname):
    a, b = at.array(INT_DATA), at.array(INT_DATA[::-1])
    ours = getattr(pc, fname)(a, b)
    theirs = getattr(ppc, fname)(pa_of(a), pa_of(b))
    assert_same(ours, theirs)


def test_arith_scalar_and_floats():
    a = at.array(FLOAT_DATA)
    assert_same(pc.add(a, 2.5), ppc.add(pa_of(a), 2.5))
    assert_same(pc.multiply(a, -1.0), ppc.multiply(pa_of(a), -1.0))
    assert_same(pc.negate(a), ppc.negate(pa_of(a)))
    assert_same(pc.abs(a), ppc.abs(pa_of(a)))


def test_divide_matches():
    a, b = at.array([7, -7, 8, None]), at.array([2, 2, -3, 5])
    assert_same(pc.divide(a, b), ppc.divide(pa_of(a), pa_of(b)))
    f = at.array([1.0, -3.0, None])
    g = at.array([0.0, 2.0, 4.0])
    assert_same(pc.divide(f, g), ppc.divide(pa_of(f), pa_of(g)))
    with pytest.raises(pc.ArrowInvalid):
        pc.divide(at.array([1]), at.array([0]))


def test_checked_overflow():
    big = at.array([2**62, 2**62], at.int64())
    with pytest.raises(pc.ArrowInvalid):
        pc.add_checked(big, big)
    # unchecked wraps like the reference
    assert_same(pc.add(big, big), ppc.add(pa_of(big), pa_of(big)))


UNARY_FLOAT = ["sqrt", "exp", "ln", "log2", "log10", "log1p", "sin", "cos",
               "tan", "asin", "atan", "sinh", "cosh", "tanh", "floor",
               "ceil", "trunc", "sign"]


@pytest.mark.parametrize("fname", UNARY_FLOAT)
def test_unary_float(fname):
    vals = [0.1, 0.5, None, 0.9, 0.25]
    a = at.array(vals)
    assert_same(getattr(pc, fname)(a), getattr(ppc, fname)(pa_of(a)),
                approx=True)


def test_round():
    a = at.array([2.5, 3.5, -2.5, 1.25, None, -1.75])
    assert_same(pc.round(a), ppc.round(pa_of(a)))
    assert_same(pc.round(a, ndigits=1), ppc.round(pa_of(a), ndigits=1))
    for mode in ["down", "up", "towards_zero", "towards_infinity",
                 "half_down", "half_up", "half_towards_zero",
                 "half_towards_infinity", "half_to_even"]:
        assert_same(pc.round(a, round_mode=mode),
                    ppc.round(pa_of(a), round_mode=mode))


COMPARE = ["equal", "not_equal", "less", "less_equal", "greater",
           "greater_equal"]


@pytest.mark.parametrize("fname", COMPARE)
def test_compare(fname):
    a, b = at.array(INT_DATA), at.array(INT_DATA[::-1])
    assert_same(getattr(pc, fname)(a, b),
                getattr(ppc, fname)(pa_of(a), pa_of(b)))
    assert_same(getattr(pc, fname)(a, 2), getattr(ppc, fname)(pa_of(a), 2))


BOOL_FNS = ["and_kleene", "or_kleene", "xor", "and_not"]


@pytest.mark.parametrize("fname", BOOL_FNS)
def test_boolean(fname):
    a, b = at.array(BOOL_DATA), at.array(BOOL_DATA[::-1])
    assert_same(getattr(pc, fname)(a, b),
                getattr(ppc, fname)(pa_of(a), pa_of(b)))


def test_and_or_plain():
    a, b = at.array(BOOL_DATA), at.array(BOOL_DATA[::-1])
    assert_same(pc.and_(a, b), ppc.and_(pa_of(a), pa_of(b)))
    assert_same(pc.or_(a, b), ppc.or_(pa_of(a), pa_of(b)))
    assert_same(pc.invert(a), ppc.invert(pa_of(a)))


def test_validity_fns():
    a = at.array(FLOAT_DATA)
    for f in ["is_null", "is_valid", "is_nan", "is_finite", "is_inf",
              "true_unless_null"]:
        assert_same(getattr(pc, f)(a), getattr(ppc, f)(pa_of(a)))


def test_if_else_coalesce():
    cond = at.array(BOOL_DATA)
    a, b = at.array(INT_DATA), at.array(INT_DATA[::-1])
    assert_same(pc.if_else(cond, a, b),
                ppc.if_else(pa_of(cond), pa_of(a), pa_of(b)))
    assert_same(pc.coalesce(a, b), ppc.coalesce(pa_of(a), pa_of(b)))
    assert_same(pc.fill_null(a, 99), ppc.fill_null(pa_of(a), 99))


def test_min_max_element_wise():
    a, b = at.array(INT_DATA), at.array(INT_DATA[::-1])
    assert_same(pc.min_element_wise(a, b),
                ppc.min_element_wise(pa_of(a), pa_of(b)))
    assert_same(pc.max_element_wise(a, b),
                ppc.max_element_wise(pa_of(a), pa_of(b)))


# --- aggregates --------------------------------------------------------

AGGS = ["sum", "mean", "min", "max", "product"]


@pytest.mark.parametrize("fname", AGGS)
@pytest.mark.parametrize("data", [INT_DATA, FLOAT_DATA[:3] + [4.5, 5.5]])
def test_aggregates(fname, data):
    a = at.array(data)
    ours = getattr(pc, fname)(a).as_py()
    theirs = getattr(ppc, fname)(pa_of(a)).as_py()
    if isinstance(theirs, float):
        assert ours == pytest.approx(theirs, rel=1e-12)
    else:
        assert ours == theirs


def test_agg_options_and_counts():
    a = at.array(INT_DATA)
    assert pc.count(a).as_py() == ppc.count(pa_of(a)).as_py()
    assert pc.count(a, mode="only_null").as_py() == \
        ppc.count(pa_of(a), mode="only_null").as_py()
    assert pc.count(a, mode="all").as_py() == \
        ppc.count(pa_of(a), mode="all").as_py()
    assert pc.sum(a, min_count=10).as_py() is None
    assert pc.sum(at.array([None, None], at.int64())).as_py() is None
    mm = pc.min_max(a).as_py()
    tm = ppc.min_max(pa_of(a)).as_py()
    assert mm == tm


def test_any_all_first_last():
    b = at.array(BOOL_DATA)
    assert pc.any(b).as_py() == ppc.any(pa_of(b)).as_py()
    assert pc.all(b).as_py() == ppc.all(pa_of(b)).as_py()
    a = at.array(INT_DATA)
    assert pc.first(a).as_py() == ppc.first(pa_of(a)).as_py()
    assert pc.last(a).as_py() == ppc.last(pa_of(a)).as_py()


def test_variance_stddev_quantile():
    a = at.array([1.0, 2.0, 3.0, 4.0, None, 6.0])
    assert pc.variance(a).as_py() == pytest.approx(
        ppc.variance(pa_of(a)).as_py())
    assert pc.variance(a, ddof=1).as_py() == pytest.approx(
        ppc.variance(pa_of(a), ddof=1).as_py())
    assert pc.stddev(a).as_py() == pytest.approx(
        ppc.stddev(pa_of(a)).as_py())
    for interp in ["linear", "lower", "higher", "nearest", "midpoint"]:
        assert pc.quantile(a, q=0.25, interpolation=interp).as_py() == \
            pytest.approx(ppc.quantile(pa_of(a), q=0.25,
                                       interpolation=interp)[0].as_py())
    assert pc.count_distinct(a).as_py() == \
        ppc.count_distinct(pa_of(a)).as_py()


# --- selection -----------------------------------------------------------

def test_filter_matches():
    a = at.array(INT_DATA)
    m = at.array(BOOL_DATA)
    assert_same(pc.filter(a, m), ppc.filter(pa_of(a), pa_of(m)))
    assert_same(pc.filter(a, m, null_selection_behavior="emit_null"),
                ppc.filter(pa_of(a), pa_of(m),
                           null_selection_behavior="emit_null"))


def test_take_matches():
    a = at.array(INT_DATA)
    idx = at.array([7, 0, None, 3])
    assert_same(pc.take(a, idx), ppc.take(pa_of(a), pa_of(idx)))


def test_drop_null():
    a = at.array(INT_DATA)
    assert_same(pc.drop_null(a), ppc.drop_null(pa_of(a)))


# --- sorts -----------------------------------------------------------------

def test_sort_indices_matches():
    a = at.array([3.0, None, 1.0, float("nan"), 2.0, 1.0])
    assert_same(pc.sort_indices(a), ppc.sort_indices(pa_of(a)))
    assert_same(pc.sort_indices(a, order="descending"),
                ppc.sort_indices(pa_of(a), sort_keys=[("x", "descending")][:0]
                                 or [("", "descending")]) if False else
                ppc.array_sort_indices(pa_of(a), order="descending"))
    assert_same(
        pc.sort_indices(a, null_placement="at_start"),
        ppc.array_sort_indices(pa_of(a), null_placement="at_start"))


def test_sort_table_multikey():
    t = at.table({"a": [2, 1, 2, 1, None], "b": [9.0, 8.0, None, 7.5, 1.0]})
    pt = pa.table({"a": [2, 1, 2, 1, None], "b": [9.0, 8.0, None, 7.5, 1.0]})
    keys = [("a", "ascending"), ("b", "descending")]
    assert_same(pc.sort_indices(t, sort_keys=keys),
                ppc.sort_indices(pt, sort_keys=keys))


def test_sort_strings():
    a = at.array(["pear", "apple", None, "fig", "apple"])
    assert_same(pc.sort_indices(a),
                ppc.array_sort_indices(pa_of(a)))


def test_select_k_and_rank():
    a = at.array([5, 1, 4, None, 2])
    assert_same(pc.select_k_unstable(a, k=3),
                ppc.select_k_unstable(pa_of(a), k=3,
                                      sort_keys=[("x", "ascending")]))
    for tb in ["first", "min", "max", "dense"]:
        assert_same(pc.rank(a, tiebreaker=tb),
                    ppc.rank(pa_of(a), sort_keys="ascending",
                             tiebreaker=tb))


# --- hash/distinct ----------------------------------------------------------

def test_unique_value_counts():
    a = at.array([3, 1, 3, None, 1, 7])
    assert_same(pc.unique(a), ppc.unique(pa_of(a)))
    ours = pc.value_counts(a)
    theirs = ppc.value_counts(pa_of(a))
    assert ours.to_pylist() == theirs.to_pylist()


def test_unique_strings():
    a = at.array(["b", "a", "b", None, "c"])
    assert_same(pc.unique(a), ppc.unique(pa_of(a)))


# --- cumulative --------------------------------------------------------------

def test_cumulative():
    a = at.array([1, 2, None, 4])
    assert_same(pc.cumulative_sum(a), ppc.cumulative_sum(pa_of(a)))
    assert_same(pc.cumulative_sum(a, skip_nulls=True),
                ppc.cumulative_sum(pa_of(a), skip_nulls=True))
    f = at.array([1.0, 3.0, None, 2.0])
    assert_same(pc.cumulative_max(f, skip_nulls=True),
                ppc.cumulative_max(pa_of(f), skip_nulls=True))
    assert_same(pc.cumulative_min(f, skip_nulls=True),
                ppc.cumulative_min(pa_of(f), skip_nulls=True))
    assert_same(pc.pairwise_diff(a), ppc.pairwise_diff(pa_of(a)))


def test_cast():
    a = at.array([1.7, -2.3, None])
    with pytest.raises(pc.ArrowInvalid):
        pc.cast(a, to_type=at.int32())  # safe cast refuses truncation
    assert_same(pc.cast(a, to_type=at.int32(), safe=False),
                ppc.cast(pa_of(a), pa.int32(), safe=False))
    c = at.array([1.0, -2.0, None])
    assert_same(pc.cast(c, to_type=at.int32()),
                ppc.cast(pa_of(c), pa.int32()))
    b = at.array([1, 0, None])
    assert_same(pc.cast(b, to_type=at.bool_()),
                ppc.cast(pa_of(b), pa.bool_()))
    with pytest.raises(pc.ArrowInvalid):
        pc.cast(at.array([300]), to_type=at.int8())


# --- randomized sweep -------------------------------------------------------

def test_randomized_differential():
    rng = np.random.default_rng(7)
    n = 4000
    mask = rng.random(n) < 0.15
    ints = [None if m else int(v) for m, v in
            zip(mask, rng.integers(-50, 50, n))]
    floats = [None if m else float(v) for m, v in
              zip(rng.random(n) < 0.1, rng.normal(size=n))]
    a, fa = at.array(ints), at.array(floats)
    pa_a, pa_f = pa_of(a), pa_of(fa)

    assert_same(pc.add(a, 3), ppc.add(pa_a, 3))
    assert pc.sum(a).as_py() == ppc.sum(pa_a).as_py()
    assert pc.mean(fa).as_py() == pytest.approx(ppc.mean(pa_f).as_py())
    assert_same(pc.sort_indices(a), ppc.array_sort_indices(pa_a))
    assert_same(pc.unique(a), ppc.unique(pa_a))
    m = at.array([None if x is None else x > 0 for x in ints])
    assert_same(pc.filter(a, m), ppc.filter(pa_a, pa_of(m)))
    assert pc.count_distinct(a).as_py() == \
        ppc.count_distinct(pa_a).as_py()


def test_hash32():
    a = at.array(list(range(100)) * 5)
    h = pc.hash32(a)
    assert h.type == at.uint32()
    vals = h.to_pylist()
    # deterministic, equal inputs hash equal, good spread
    assert vals[:100] == vals[100:200]
    assert len(set(vals[:100])) == 100
    f = at.array([1.5, -2.25, 1.5, None])
    hf = pc.hash32(f).to_pylist()
    assert hf[0] == hf[2] and hf[0] != hf[1]
    assert hf[3] is None


def test_register_scalar_function_udf():
    """python UDF registration (pyarrow.compute.register_scalar_function
    analogue; the reference interprets UDFs outside the kernel JIT too)."""
    def plus_one(ctx, x):
        return at.array([None if v is None else v + 1
                         for v in x.to_pylist()], x.type)

    pc.register_scalar_function(plus_one, "test_plus_one",
                                {"summary": "adds one"},
                                {"x": at.int64()}, at.int64())
    assert pc.call_function("test_plus_one",
                            [at.array([1, 2, None])]).to_pylist() == \
        [2, 3, None]
    assert "test_plus_one" in pc.list_functions()


def test_expression_export():
    assert pc.Expression is not None
    e = (pc.field("a") > 1) & (pc.field("b") == "x")
    assert e.kind == pc.Expression.KIND_CALL
