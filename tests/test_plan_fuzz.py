"""Random-plan differential fuzzer: generate random tables and random
plan shapes (filter → project → aggregate / join / order_by / fetch) and
compare results against pyarrow Acero on the same data.

Reference analogue: acero/hash_join_node_test.cc and
hash_aggregate_test.cc run randomized plans against a naive reference
engine; here the reference engine IS pyarrow (SURVEY §4)."""

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.acero as pacero
import pyarrow.compute as ppc
import pytest

import arrow_tpu as at
from arrow_tpu import acero
from arrow_tpu.acero import Declaration, Expression, field

N_CASES = 25


def _random_table(rng, n):
    cols = {}
    cols["i64"] = [int(v) if rng.random() > 0.1 else None
                   for v in rng.integers(-50, 50, n)]
    cols["f64"] = [float(np.round(v, 3)) if rng.random() > 0.1 else None
                   for v in rng.normal(size=n)]
    cols["s"] = [f"cat{v}" if rng.random() > 0.1 else None
                 for v in rng.integers(0, 8, n)]
    cols["b"] = [bool(v) if rng.random() > 0.1 else None
                 for v in rng.integers(0, 2, n)]
    return cols


def _to_at(cols):
    return at.table({
        "i64": at.array(cols["i64"], at.int64()),
        "f64": at.array(cols["f64"], at.float64()),
        "s": at.array(cols["s"], at.string()),
        "b": at.array(cols["b"], at.bool_()),
    })


def _to_pa(cols):
    return pa.table({
        "i64": pa.array(cols["i64"], pa.int64()),
        "f64": pa.array(cols["f64"], pa.float64()),
        "s": pa.array(cols["s"], pa.string()),
        "b": pa.array(cols["b"], pa.bool_()),
    })


def _random_predicate(rng):
    """Returns (ours, theirs) expression pair."""
    k = rng.integers(0, 6)
    if k == 0:
        c = int(rng.integers(-20, 20))
        return field("i64") > c, ppc.greater(ppc.field("i64"), c)
    if k == 1:
        c = float(np.round(rng.normal(), 2))
        return field("f64") <= c, ppc.less_equal(ppc.field("f64"), c)
    if k == 2:
        v = f"cat{int(rng.integers(0, 8))}"
        return field("s") == v, ppc.equal(ppc.field("s"), v)
    if k == 3:
        vs = [f"cat{i}" for i in
              rng.choice(8, size=int(rng.integers(1, 4)), replace=False)]
        return (Expression.call("is_in", field("s"), value_set=vs),
                ppc.is_in(ppc.field("s"), value_set=pa.array(vs)))
    if k == 4:
        return field("b") == True, ppc.equal(ppc.field("b"), True)  # noqa
    v = f"cat{int(rng.integers(0, 8))}"
    return ((field("i64") > 0) & (field("s") != v),
            ppc.and_kleene(ppc.greater(ppc.field("i64"), 0),
                           ppc.not_equal(ppc.field("s"), v)))


AGGS = [("i64", "sum"), ("f64", "sum"), ("f64", "mean"), ("i64", "min"),
        ("f64", "max"), ("i64", "count"), ("f64", "count")]


def _sorted_rows(tbl_dict, names):
    cols = [tbl_dict[n] for n in names]
    rows = list(zip(*cols))
    return sorted(rows, key=lambda r: tuple(
        (v is None, str(type(v)), v if v is not None else 0) for v in r))


def _compare(ours: at.Table, theirs: pa.Table, seed):
    assert ours.num_rows == theirs.num_rows, f"seed {seed}: row count"
    assert ours.column_names == theirs.column_names, f"seed {seed}"
    od, td = ours.to_pydict(), theirs.to_pydict()
    o_rows = _sorted_rows(od, ours.column_names)
    t_rows = _sorted_rows(td, ours.column_names)
    for orow, trow in zip(o_rows, t_rows):
        for ov, tv in zip(orow, trow):
            if isinstance(ov, float) and isinstance(tv, float):
                assert ov == pytest.approx(tv, rel=1e-9), f"seed {seed}"
            else:
                assert ov == tv, f"seed {seed}: {orow} != {trow}"


@pytest.mark.parametrize("seed", range(N_CASES))
def test_random_filter_aggregate_plan(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 400))
    cols = _random_table(rng, n)
    ot, pt = _to_at(cols), _to_pa(cols)

    opred, tpred = _random_predicate(rng)
    n_aggs = int(rng.integers(1, 4))
    picks = [AGGS[i] for i in rng.choice(len(AGGS), n_aggs, replace=False)]
    keys = ["s"] if rng.random() < 0.7 else ["s", "b"]

    ours = Declaration.from_sequence([
        Declaration("table_source", acero.TableSourceNodeOptions(ot)),
        Declaration("filter", acero.FilterNodeOptions(opred)),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [(c, f, None, f"{f}_{c}") for c, f in picks], keys=keys)),
    ]).to_table()
    theirs = pacero.Declaration.from_sequence([
        pacero.Declaration("table_source",
                           pacero.TableSourceNodeOptions(pt)),
        pacero.Declaration("filter", pacero.FilterNodeOptions(tpred)),
        pacero.Declaration("aggregate", pacero.AggregateNodeOptions(
            [(c, f"hash_{f}", None, f"{f}_{c}") for c, f in picks],
            keys=keys)),
    ]).to_table()
    _compare(ours, theirs, seed)


@pytest.mark.parametrize("seed", range(N_CASES))
def test_random_join_plan(seed):
    rng = np.random.default_rng(1000 + seed)
    n1, n2 = int(rng.integers(5, 300)), int(rng.integers(5, 300))
    c1, c2 = _random_table(rng, n1), _random_table(rng, n2)
    # join keys must be non-null on at least one side sometimes; keep as-is
    jt = ["inner", "left outer", "left semi", "left anti"][
        int(rng.integers(0, 4))]
    key = ["i64", "s"][int(rng.integers(0, 2))]

    ot1, ot2 = _to_at(c1), _to_at(c2)
    pt1, pt2 = _to_pa(c1), _to_pa(c2)
    # project right side to avoid duplicate names
    r_ours = Declaration.from_sequence([
        Declaration("table_source", acero.TableSourceNodeOptions(ot2)),
        Declaration("project", acero.ProjectNodeOptions(
            [field(key), field("f64")], ["rk", "rv"])),
    ])
    r_theirs = pacero.Declaration.from_sequence([
        pacero.Declaration("table_source",
                           pacero.TableSourceNodeOptions(pt2)),
        pacero.Declaration("project", pacero.ProjectNodeOptions(
            [ppc.field(key), ppc.field("f64")], ["rk", "rv"])),
    ])
    right_out = None if jt in ("left semi", "left anti") else ["rv"]
    ours = Declaration("hashjoin", acero.HashJoinNodeOptions(
        jt, left_keys=[key], right_keys=["rk"], right_output=right_out),
        inputs=[Declaration("table_source",
                            acero.TableSourceNodeOptions(ot1)), r_ours]
    ).to_table()
    kw = {}
    if jt not in ("left semi", "left anti"):
        kw = {"left_output": ["i64", "f64", "s", "b"],
              "right_output": ["rv"]}
    theirs = pacero.Declaration("hashjoin", pacero.HashJoinNodeOptions(
        jt, left_keys=[key], right_keys=["rk"], **kw),
        inputs=[pacero.Declaration(
            "table_source", pacero.TableSourceNodeOptions(pt1)),
            r_theirs]).to_table()
    _compare(ours, theirs, seed)


@pytest.mark.parametrize("seed", range(N_CASES))
def test_random_sort_fetch_plan(seed):
    rng = np.random.default_rng(2000 + seed)
    n = int(rng.integers(5, 400))
    cols = _random_table(rng, n)
    ot, pt = _to_at(cols), _to_pa(cols)
    sort_keys = [("i64", "ascending"), ("f64", "descending"),
                 ("s", "ascending")]
    picks = [sort_keys[i] for i in
             rng.choice(3, int(rng.integers(1, 4)), replace=False)]
    # make ordering total so both engines agree on ties
    if ("i64", "ascending") not in picks:
        picks.append(("i64", "ascending"))
    if ("f64", "descending") not in picks:
        picks.append(("f64", "descending"))
    if ("s", "ascending") not in picks:
        picks.append(("s", "ascending"))
    picks.append(("b", "ascending"))
    off = int(rng.integers(0, 10))
    lim = int(rng.integers(1, 50))

    ours = Declaration.from_sequence([
        Declaration("table_source", acero.TableSourceNodeOptions(ot)),
        Declaration("order_by", acero.OrderByNodeOptions(picks)),
        Declaration("fetch", acero.FetchNodeOptions(off, lim)),
    ]).to_table()
    theirs = pacero.Declaration.from_sequence([
        pacero.Declaration("table_source",
                           pacero.TableSourceNodeOptions(pt)),
        pacero.Declaration("order_by", pacero.OrderByNodeOptions(
            picks, null_placement="at_end")),
    ]).to_table().slice(off, lim)
    od, td = ours.to_pydict(), theirs.to_pydict()
    assert ours.num_rows == theirs.num_rows, f"seed {seed}"
    for name in ours.column_names:
        for ov, tv in zip(od[name], td[name]):
            if isinstance(ov, float) and isinstance(tv, float):
                assert ov == pytest.approx(tv, rel=1e-12), f"seed {seed}"
            else:
                assert ov == tv, f"seed {seed} col {name}"


@pytest.mark.parametrize("seed", range(12))
def test_aggregate_options_differential(seed):
    """FunctionOptions semantics in plans (SURVEY A.6: skip_nulls,
    min_count, CountOptions mode, VarianceOptions ddof) vs pyarrow."""
    rng = np.random.default_rng(3000 + seed)
    n = int(rng.integers(10, 200))
    cols = _random_table(rng, n)
    ot, pt = _to_at(cols), _to_pa(cols)

    skip = bool(rng.integers(0, 2))
    min_count = int(rng.integers(0, 4))
    ddof = int(rng.integers(0, 2))
    count_mode = ["only_valid", "only_null", "all"][int(rng.integers(0, 3))]

    o_opts = {"skip_nulls": skip, "min_count": min_count}
    ours = Declaration.from_sequence([
        Declaration("table_source", acero.TableSourceNodeOptions(ot)),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("f64", "sum", dict(o_opts), "s"),
             ("f64", "mean", dict(o_opts), "m"),
             ("i64", "min", dict(o_opts), "mn"),
             ("f64", "stddev", {"ddof": ddof, "skip_nulls": skip},
              "sd"),
             ("f64", "count", {"mode": count_mode}, "c")],
            keys=["s"])),
    ]).to_table()

    p_agg = ppc.ScalarAggregateOptions(skip_nulls=skip,
                                       min_count=min_count)
    theirs = pacero.Declaration.from_sequence([
        pacero.Declaration("table_source",
                           pacero.TableSourceNodeOptions(pt)),
        pacero.Declaration("aggregate", pacero.AggregateNodeOptions(
            [("f64", "hash_sum", p_agg, "s"),
             ("f64", "hash_mean", p_agg, "m"),
             ("i64", "hash_min", p_agg, "mn"),
             ("f64", "hash_stddev",
              ppc.VarianceOptions(ddof=ddof, skip_nulls=skip,
                                  min_count=0), "sd"),
             ("f64", "hash_count", ppc.CountOptions(mode=count_mode),
              "c")],
            keys=["s"])),
    ]).to_table()
    _compare(ours, theirs, seed)


@pytest.mark.parametrize("seed", range(15))
def test_scalar_aggregate_options_differential(seed):
    """Scalar (non-grouped) aggregate options vs pyarrow.compute,
    including the empty-input/min_count=0 edge (mean -> valid NaN,
    min/max -> null; reference: aggregate_basic.cc)."""
    import arrow_tpu.compute as pc
    r = np.random.default_rng(seed)
    n = int(r.integers(0, 60))
    vals = [float(np.round(v, 3)) if r.random() > 0.3 else None
            for v in r.normal(size=n)]
    oa, pa_arr = at.array(vals, at.float64()), pa.array(vals, pa.float64())
    skip = bool(r.integers(0, 2))
    mc = int(r.integers(0, 4))
    for fn in ("sum", "mean", "min", "max", "product"):
        kw = dict(skip_nulls=skip, min_count=mc)
        ov = getattr(pc, fn)(oa, **kw).as_py()
        tv = getattr(ppc, fn)(pa_arr, **kw).as_py()
        if ov is None or tv is None:
            assert ov is tv, (fn, skip, mc, ov, tv)
        elif isinstance(tv, float) and np.isnan(tv):
            assert np.isnan(ov), (fn, skip, mc, ov, tv)
        else:
            assert ov == pytest.approx(tv, rel=1e-9), (fn, skip, mc)


@pytest.mark.parametrize("seed", range(15))
def test_random_passthrough_plan(seed):
    """Plans over tables holding passthrough-tier columns (wide decimals,
    fixed-size binary, lists): filter/sort/group/join them and diff
    against pyarrow (the tier: device/column.py dictionary/row-id
    codes)."""
    from decimal import Decimal
    rng = np.random.default_rng(3000 + seed)
    n = int(rng.integers(5, 200))

    i64 = [int(v) if rng.random() > 0.1 else None
           for v in rng.integers(-20, 20, n)]
    dec = [Decimal(int(v)).scaleb(-2) * (10 ** 18 if rng.random() < 0.3
                                         else 1)
           if rng.random() > 0.15 else None
           for v in rng.integers(-10**6, 10**6, n)]
    fsb = [bytes([65 + int(v)] * 4) if rng.random() > 0.1 else None
           for v in rng.integers(0, 6, n)]
    lst = [[int(x) for x in rng.integers(0, 5, int(rng.integers(0, 4)))]
           if rng.random() > 0.1 else None for _ in range(n)]

    ot = at.table({
        "i64": at.array(i64, at.int64()),
        "dec": at.array(dec, at.decimal128(38, 2)),
        "fsb": at.array(fsb, at.fixed_size_binary(4)),
        "lst": at.array(lst, at.list_(at.int64())),
    })
    pt = pa.table({
        "i64": pa.array(i64, pa.int64()),
        "dec": pa.array(dec, pa.decimal128(38, 2)),
        "fsb": pa.array(fsb, pa.binary(4)),
        "lst": pa.array(lst, pa.list_(pa.int64())),
    })

    shape = int(rng.integers(0, 4))
    c = int(rng.integers(-10, 10))
    if shape == 0:
        # filter on i64, carry every passthrough column through compaction
        ours = ot.filter(field("i64") > c)
        theirs = pt.filter(ppc.greater(ppc.field("i64"), c))
        _compare(ours, theirs, seed)
    elif shape == 1:
        # sort by wide decimal (+ i64 tiebreak), lists ride as payload
        ours = ot.sort_by([("dec", "ascending"), ("i64", "ascending"),
                           ("fsb", "ascending")])
        theirs = pt.sort_by([("dec", "ascending"), ("i64", "ascending"),
                             ("fsb", "ascending")])
        assert ours.to_pylist() == theirs.to_pylist(), f"seed {seed}"
    elif shape == 2:
        # group by fsb, aggregate the wide decimal exactly
        ours = ot.group_by("fsb").aggregate(
            [("dec", "sum"), ("dec", "min"), ("i64", "count")])
        theirs = pt.group_by("fsb").aggregate(
            [("dec", "sum"), ("dec", "min"), ("i64", "count")])
        _compare(ours.sort_by([("fsb", "ascending")]),
                 theirs.sort_by([("fsb", "ascending")]), seed)
    else:
        # join on the wide-decimal key
        m = int(rng.integers(2, 30))
        rdec = [Decimal(int(v)).scaleb(-2) for v in
                rng.integers(-10**6, 10**6, m)] + [d for d in dec[:3]
                                                   if d is not None]
        rt_o = at.table({"dec": at.array(rdec, at.decimal128(38, 2)),
                         "tag": at.array(list(range(len(rdec))),
                                         at.int64())})
        rt_p = pa.table({"dec": pa.array(rdec, pa.decimal128(38, 2)),
                         "tag": pa.array(list(range(len(rdec))),
                                         pa.int64())})
        ours = ot.select(["i64", "dec"]).join(
            rt_o, keys="dec", join_type="inner")
        theirs = pt.select(["i64", "dec"]).join(
            rt_p, keys="dec", join_type="inner")
        _compare(ours.sort_by([("tag", "ascending"),
                               ("i64", "ascending")]),
                 theirs.sort_by([("tag", "ascending"),
                                 ("i64", "ascending")]), seed)
