"""TPC-H style benchmark plans over the arrow_tpu engine.

Q1 (pricing summary), Q3-style (join + group-by + top-k), Q9-style
(multi-join + aggregate) — the BASELINE.json config suite shapes.
Reference plan shapes: acero/tpch_benchmark.cc:39 (Plan_Q1).
"""

from __future__ import annotations

import datetime

from .. import acero
from ..acero import Declaration, field
from ..table import Table

DATE_1998_09_02 = (datetime.date(1998, 9, 2)
                   - datetime.date(1970, 1, 1)).days
DATE_1995_03_15 = (datetime.date(1995, 3, 15)
                   - datetime.date(1970, 1, 1)).days


def q1_plan(lineitem: Table) -> Declaration:
    disc_price = field("l_extendedprice") * (1.0 - field("l_discount"))
    charge = disc_price * (1.0 + field("l_tax"))
    return Declaration.from_sequence([
        Declaration("table_source", acero.TableSourceNodeOptions(lineitem)),
        Declaration("filter", acero.FilterNodeOptions(
            field("l_shipdate") <= DATE_1998_09_02)),
        Declaration("project", acero.ProjectNodeOptions(
            [field("l_returnflag"), field("l_linestatus"),
             field("l_quantity"), field("l_extendedprice"),
             disc_price, charge, field("l_discount")],
            ["l_returnflag", "l_linestatus", "l_quantity",
             "l_extendedprice", "disc_price", "charge", "l_discount"])),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("l_quantity", "sum", None, "sum_qty"),
             ("l_extendedprice", "sum", None, "sum_base_price"),
             ("disc_price", "sum", None, "sum_disc_price"),
             ("charge", "sum", None, "sum_charge"),
             ("l_quantity", "mean", None, "avg_qty"),
             ("l_extendedprice", "mean", None, "avg_price"),
             ("l_discount", "mean", None, "avg_disc"),
             ("l_quantity", "count", None, "count_order")],
            keys=["l_returnflag", "l_linestatus"])),
        Declaration("order_by", acero.OrderByNodeOptions(
            [("l_returnflag", "ascending"), ("l_linestatus", "ascending")])),
    ])


def q3_plan(customer: Table, orders: Table, lineitem: Table,
            limit: int = 10) -> Declaration:
    cust = Declaration.from_sequence([
        Declaration("table_source", acero.TableSourceNodeOptions(customer)),
        Declaration("filter", acero.FilterNodeOptions(
            field("c_mktsegment") == "BUILDING")),
    ])
    ords = Declaration.from_sequence([
        Declaration("table_source", acero.TableSourceNodeOptions(orders)),
        Declaration("filter", acero.FilterNodeOptions(
            field("o_orderdate") < DATE_1995_03_15)),
    ])
    li = Declaration.from_sequence([
        Declaration("table_source", acero.TableSourceNodeOptions(lineitem)),
        Declaration("filter", acero.FilterNodeOptions(
            field("l_shipdate") > DATE_1995_03_15)),
    ])
    co = Declaration("hashjoin", acero.HashJoinNodeOptions(
        "inner", left_keys=["o_custkey"], right_keys=["c_custkey"],
        right_output=[]), inputs=[ords, cust])
    col = Declaration("hashjoin", acero.HashJoinNodeOptions(
        "inner", left_keys=["l_orderkey"], right_keys=["o_orderkey"],
        right_output=["o_orderdate", "o_shippriority"]), inputs=[li, co])
    return Declaration.from_sequence([
        col,
        Declaration("project", acero.ProjectNodeOptions(
            [field("l_orderkey"),
             field("l_extendedprice") * (1.0 - field("l_discount")),
             field("o_orderdate"), field("o_shippriority")],
            ["l_orderkey", "volume", "o_orderdate", "o_shippriority"])),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("volume", "sum", None, "revenue")],
            keys=["l_orderkey", "o_orderdate", "o_shippriority"])),
        Declaration("order_by", acero.OrderByNodeOptions(
            [("revenue", "descending"), ("o_orderdate", "ascending")])),
        Declaration("fetch", acero.FetchNodeOptions(0, limit)),
    ])


def q9_style_plan(part: Table, supplier: Table, lineitem: Table,
                  partsupp: Table, orders: Table, nation: Table
                  ) -> Declaration:
    """Multi-way join + high-cardinality aggregate (BASELINE config 4
    shape): part ⋈ partsupp ⋈ lineitem ⋈ supplier ⋈ nation ⋈ orders,
    grouped by nation and order-year."""
    li = Declaration("table_source", acero.TableSourceNodeOptions(lineitem))
    ps = Declaration("table_source", acero.TableSourceNodeOptions(partsupp))
    pt = Declaration.from_sequence([
        Declaration("table_source", acero.TableSourceNodeOptions(part)),
        Declaration("filter", acero.FilterNodeOptions(
            Expression_match(field("p_type"), "BRASS"))),
    ])
    sup = Declaration("table_source", acero.TableSourceNodeOptions(supplier))
    nat = Declaration("table_source", acero.TableSourceNodeOptions(nation))
    ords = Declaration("table_source", acero.TableSourceNodeOptions(orders))

    j1 = Declaration("hashjoin", acero.HashJoinNodeOptions(
        "inner", left_keys=["l_partkey"], right_keys=["p_partkey"],
        right_output=[]), inputs=[li, pt])
    j2 = Declaration("hashjoin", acero.HashJoinNodeOptions(
        "inner", left_keys=["l_partkey", "l_suppkey"],
        right_keys=["ps_partkey", "ps_suppkey"],
        right_output=["ps_supplycost"]), inputs=[j1, ps])
    j3 = Declaration("hashjoin", acero.HashJoinNodeOptions(
        "inner", left_keys=["l_suppkey"], right_keys=["s_suppkey"],
        right_output=["s_nationkey"]), inputs=[j2, sup])
    j4 = Declaration("hashjoin", acero.HashJoinNodeOptions(
        "inner", left_keys=["s_nationkey"], right_keys=["n_nationkey"],
        right_output=["n_name"]), inputs=[j3, nat])
    j5 = Declaration("hashjoin", acero.HashJoinNodeOptions(
        "inner", left_keys=["l_orderkey"], right_keys=["o_orderkey"],
        right_output=["o_orderdate"]), inputs=[j4, ords])
    return Declaration.from_sequence([
        j5,
        Declaration("project", acero.ProjectNodeOptions(
            [field("n_name"),
             acero.Expression.call("divide", field("o_orderdate"), 365),
             field("l_extendedprice") * (1.0 - field("l_discount"))
             - field("ps_supplycost") * field("l_quantity")],
            ["nation", "o_year", "amount"])),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("amount", "sum", None, "sum_profit")],
            keys=["nation", "o_year"])),
        Declaration("order_by", acero.OrderByNodeOptions(
            [("nation", "ascending"), ("o_year", "descending")])),
    ])


def Expression_match(f, pattern):
    from ..acero.expression import Expression
    return Expression.call("match_substring", f, pattern=pattern)


DATE_1994_01_01 = (datetime.date(1994, 1, 1)
                   - datetime.date(1970, 1, 1)).days
DATE_1995_01_01 = (datetime.date(1995, 1, 1)
                   - datetime.date(1970, 1, 1)).days


def q6_plan(lineitem: Table) -> Declaration:
    """Q6 forecasting-revenue-change: pure filter + scalar aggregate
    (tpch_benchmark.cc suite)."""
    cond = ((field("l_shipdate") >= DATE_1994_01_01)
            & (field("l_shipdate") < DATE_1995_01_01)
            & (field("l_discount") >= 0.05)
            & (field("l_discount") <= 0.07)
            & (field("l_quantity") < 24.0))
    return Declaration.from_sequence([
        Declaration("table_source", acero.TableSourceNodeOptions(lineitem)),
        Declaration("filter", acero.FilterNodeOptions(cond)),
        Declaration("project", acero.ProjectNodeOptions(
            [field("l_extendedprice") * field("l_discount")],
            ["revenue"])),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("revenue", "sum", None, "revenue")], keys=[])),
    ])


def q10_style_plan(customer: Table, orders: Table, lineitem: Table,
                   limit: int = 20) -> Declaration:
    """Q10 returned-item reporting: 2 joins + grouped revenue + top-k."""
    ords = Declaration.from_sequence([
        Declaration("table_source", acero.TableSourceNodeOptions(orders)),
        Declaration("filter", acero.FilterNodeOptions(
            (field("o_orderdate") >= DATE_1994_01_01)
            & (field("o_orderdate") < DATE_1994_01_01 + 92))),
    ])
    li = Declaration.from_sequence([
        Declaration("table_source", acero.TableSourceNodeOptions(lineitem)),
        Declaration("filter", acero.FilterNodeOptions(
            field("l_returnflag") == "R")),
    ])
    lo = Declaration("hashjoin", acero.HashJoinNodeOptions(
        "inner", left_keys=["l_orderkey"], right_keys=["o_orderkey"],
        right_output=["o_custkey"]), inputs=[li, ords])
    loc = Declaration("hashjoin", acero.HashJoinNodeOptions(
        "inner", left_keys=["o_custkey"], right_keys=["c_custkey"],
        right_output=["c_custkey", "c_mktsegment"]), inputs=[lo, Declaration(
            "table_source", acero.TableSourceNodeOptions(customer))])
    return Declaration.from_sequence([
        loc,
        Declaration("project", acero.ProjectNodeOptions(
            [field("c_custkey"), field("c_mktsegment"),
             field("l_extendedprice") * (1.0 - field("l_discount"))],
            ["c_custkey", "c_mktsegment", "volume"])),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("volume", "sum", None, "revenue")],
            keys=["c_custkey", "c_mktsegment"])),
        Declaration("order_by", acero.OrderByNodeOptions(
            [("revenue", "descending"), ("c_custkey", "ascending")])),
        Declaration("fetch", acero.FetchNodeOptions(0, limit)),
    ])


def q12_style_plan(orders: Table, lineitem: Table) -> Declaration:
    """Q12 shipping-modes: join + boolean-bucketed counts per shipmode."""
    li = Declaration.from_sequence([
        Declaration("table_source", acero.TableSourceNodeOptions(lineitem)),
        Declaration("filter", acero.FilterNodeOptions(
            (field("l_receiptdate") >= DATE_1994_01_01)
            & (field("l_receiptdate") < DATE_1995_01_01)
            & ((field("l_shipmode") == "MAIL")
               | (field("l_shipmode") == "SHIP")))),
    ])
    lo = Declaration("hashjoin", acero.HashJoinNodeOptions(
        "inner", left_keys=["l_orderkey"], right_keys=["o_orderkey"],
        right_output=["o_orderpriority"]), inputs=[li, Declaration(
            "table_source", acero.TableSourceNodeOptions(orders))])
    is_urgent = ((field("o_orderpriority") == "1-URGENT")
                 | (field("o_orderpriority") == "2-HIGH"))
    return Declaration.from_sequence([
        lo,
        Declaration("project", acero.ProjectNodeOptions(
            [field("l_shipmode"),
             acero.Expression.call("if_else", is_urgent,
                                   acero.Expression.literal(1),
                                   acero.Expression.literal(0)),
             acero.Expression.call("if_else", is_urgent,
                                   acero.Expression.literal(0),
                                   acero.Expression.literal(1))],
            ["l_shipmode", "high_line", "low_line"])),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("high_line", "sum", None, "high_line_count"),
             ("low_line", "sum", None, "low_line_count")],
            keys=["l_shipmode"])),
        Declaration("order_by", acero.OrderByNodeOptions(
            [("l_shipmode", "ascending")])),
    ])


def q5_plan(customer: Table, orders: Table, lineitem: Table,
            supplier: Table, nation: Table, region: Table,
            region_name: str = "ASIA") -> Declaration:
    """TPC-H Q5 (local supplier volume): customer ⋈ orders ⋈ lineitem ⋈
    supplier (with c_nationkey = s_nationkey) ⋈ nation ⋈ region, revenue
    per nation within one region and a one-year order window."""
    cust = Declaration("table_source", acero.TableSourceNodeOptions(customer))
    ords = Declaration.from_sequence([
        Declaration("table_source", acero.TableSourceNodeOptions(orders)),
        Declaration("filter", acero.FilterNodeOptions(
            (field("o_orderdate") >= DATE_1994_01_01)
            & (field("o_orderdate") < DATE_1995_01_01))),
    ])
    li = Declaration("table_source", acero.TableSourceNodeOptions(lineitem))
    sup = Declaration("table_source", acero.TableSourceNodeOptions(supplier))
    reg = Declaration.from_sequence([
        Declaration("table_source", acero.TableSourceNodeOptions(region)),
        Declaration("filter", acero.FilterNodeOptions(
            field("r_name") == region_name)),
    ])
    nat = Declaration("hashjoin", acero.HashJoinNodeOptions(
        "inner", left_keys=["n_regionkey"], right_keys=["r_regionkey"],
        right_output=[]), inputs=[
            Declaration("table_source",
                        acero.TableSourceNodeOptions(nation)), reg])
    oc = Declaration("hashjoin", acero.HashJoinNodeOptions(
        "inner", left_keys=["o_custkey"], right_keys=["c_custkey"],
        right_output=["c_nationkey"]), inputs=[ords, cust])
    lo = Declaration("hashjoin", acero.HashJoinNodeOptions(
        "inner", left_keys=["l_orderkey"], right_keys=["o_orderkey"],
        right_output=["c_nationkey"]), inputs=[li, oc])
    ls = Declaration("hashjoin", acero.HashJoinNodeOptions(
        "inner", left_keys=["l_suppkey", "c_nationkey"],
        right_keys=["s_suppkey", "s_nationkey"],
        right_output=["s_nationkey"]), inputs=[lo, sup])
    ln = Declaration("hashjoin", acero.HashJoinNodeOptions(
        "inner", left_keys=["s_nationkey"], right_keys=["n_nationkey"],
        right_output=["n_name"]), inputs=[ls, nat])
    return Declaration.from_sequence([
        ln,
        Declaration("project", acero.ProjectNodeOptions(
            [field("n_name"),
             field("l_extendedprice") * (1.0 - field("l_discount"))],
            ["n_name", "volume"])),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("volume", "sum", None, "revenue")], keys=["n_name"])),
        Declaration("order_by", acero.OrderByNodeOptions(
            [("revenue", "descending")])),
    ])


# ---------------------------------------------------------------------------
# Full 22-query suite. Each helper returns a Declaration over the generator's
# schema (io/tpch.py). Scalar subqueries (Q11/Q15/Q22 thresholds) are
# expressed in-plan as keys=[] aggregates joined back on a literal key, so
# every query is ONE executable plan. Reference query shapes:
# TPC-H spec via acero/tpch_benchmark.cc + tpch_node.cc distributions.
# ---------------------------------------------------------------------------

def _src(t: Table) -> Declaration:
    return Declaration("table_source", acero.TableSourceNodeOptions(t))


def _proj(exprs, names) -> Declaration:
    return Declaration("project", acero.ProjectNodeOptions(exprs, names))


def _filter(expr) -> Declaration:
    return Declaration("filter", acero.FilterNodeOptions(expr))


def _agg(aggs, keys=()) -> Declaration:
    return Declaration("aggregate", acero.AggregateNodeOptions(aggs, keys=keys))


def _join(jt, lk, rk, right_output=None, inputs=None, **kw) -> Declaration:
    return Declaration("hashjoin", acero.HashJoinNodeOptions(
        jt, left_keys=lk, right_keys=rk, right_output=right_output, **kw),
        inputs=inputs)


def _order(keys) -> Declaration:
    return Declaration("order_by", acero.OrderByNodeOptions(keys))


def _fetch(limit, offset=0) -> Declaration:
    return Declaration("fetch", acero.FetchNodeOptions(offset, limit))


def _days(y, m, d) -> int:
    return (datetime.date(y, m, d) - datetime.date(1970, 1, 1)).days


_LIT = acero.Expression.literal
_CALL = acero.Expression.call


def _with_unit_key(decl: Declaration, cols, names) -> Declaration:
    """Append a constant int64 join key (the scalar-subquery bridge)."""
    import numpy as np
    return Declaration.from_sequence([
        decl, _proj([field(c) if isinstance(c, str) else c for c in cols]
                    + [_LIT(np.int64(1))], list(names) + ["__k1"])])


def q2_plan(part: Table, supplier: Table, partsupp: Table, nation: Table,
            region: Table, size: int = 15, type_suffix: str = "BRASS",
            region_name: str = "EUROPE", limit: int = 100) -> Declaration:
    """Q2 minimum-cost supplier: min ps_supplycost per part within a
    region, joined back on (partkey, cost) equality."""
    sup = _join("inner", ["s_nationkey"], ["n_nationkey"],
                ["n_name", "n_regionkey"],
                [_src(supplier),
                 _join("inner", ["n_regionkey"], ["r_regionkey"], [],
                       [_src(nation),
                        Declaration.from_sequence([
                            _src(region),
                            _filter(field("r_name") == region_name)])])])
    eu_ps = _join("inner", ["ps_suppkey"], ["s_suppkey"],
                  ["s_name", "s_address", "s_phone", "s_acctbal",
                   "s_comment", "n_name"],
                  [_src(partsupp), sup])
    minc = Declaration.from_sequence([
        eu_ps,
        _agg([("ps_supplycost", "min", None, "min_cost")],
             keys=["ps_partkey"])])
    pt = Declaration.from_sequence([
        _src(part),
        _filter((field("p_size") == size)
                & _CALL("ends_with", field("p_type"), pattern=type_suffix))])
    pm = _join("inner", ["p_partkey"], ["ps_partkey"], ["min_cost"],
               [pt, minc])
    res = _join("inner", ["p_partkey", "min_cost"],
                ["ps_partkey", "ps_supplycost"],
                ["s_name", "s_address", "s_phone", "s_acctbal",
                 "s_comment", "n_name"],
                [pm, eu_ps])
    return Declaration.from_sequence([
        res,
        _proj([field(c) for c in
               ["s_acctbal", "s_name", "n_name", "p_partkey", "p_mfgr",
                "s_address", "s_phone", "s_comment"]],
              ["s_acctbal", "s_name", "n_name", "p_partkey", "p_mfgr",
               "s_address", "s_phone", "s_comment"]),
        _order([("s_acctbal", "descending"), ("n_name", "ascending"),
                ("s_name", "ascending"), ("p_partkey", "ascending")]),
        _fetch(limit)])


def q4_plan(orders: Table, lineitem: Table,
            date_lo: int | None = None) -> Declaration:
    """Q4 order-priority checking: EXISTS late-lineitem semi-join."""
    lo = _days(1993, 7, 1) if date_lo is None else date_lo
    late = Declaration.from_sequence([
        _src(lineitem),
        _filter(field("l_commitdate") < field("l_receiptdate"))])
    ords = Declaration.from_sequence([
        _src(orders),
        _filter((field("o_orderdate") >= lo)
                & (field("o_orderdate") < lo + 92))])
    return Declaration.from_sequence([
        _join("left semi", ["o_orderkey"], ["l_orderkey"], None,
              [ords, late]),
        _agg([([], "count_all", None, "order_count")],
             keys=["o_orderpriority"]),
        _order([("o_orderpriority", "ascending")])])


def q7_plan(supplier: Table, lineitem: Table, orders: Table,
            customer: Table, nation: Table,
            nation1: str = "FRANCE", nation2: str = "GERMANY"
            ) -> Declaration:
    """Q7 volume shipping between two nations, grouped by ship year."""
    n1 = Declaration.from_sequence([
        _src(nation),
        _proj([field("n_nationkey"), field("n_name")],
              ["n1_key", "supp_nation"])])
    n2 = Declaration.from_sequence([
        _src(nation),
        _proj([field("n_nationkey"), field("n_name")],
              ["n2_key", "cust_nation"])])
    sup = _join("inner", ["s_nationkey"], ["n1_key"], ["supp_nation"],
                [_src(supplier), n1])
    cus = _join("inner", ["c_nationkey"], ["n2_key"], ["cust_nation"],
                [_src(customer), n2])
    li = Declaration.from_sequence([
        _src(lineitem),
        _filter((field("l_shipdate") >= _days(1995, 1, 1))
                & (field("l_shipdate") <= _days(1996, 12, 31)))])
    j1 = _join("inner", ["l_orderkey"], ["o_orderkey"], ["o_custkey"],
               [li, _src(orders)])
    j2 = _join("inner", ["o_custkey"], ["c_custkey"], ["cust_nation"],
               [j1, cus])
    j3 = _join("inner", ["l_suppkey"], ["s_suppkey"], ["supp_nation"],
               [j2, sup])
    pair_ok = (((field("supp_nation") == nation1)
                & (field("cust_nation") == nation2))
               | ((field("supp_nation") == nation2)
                  & (field("cust_nation") == nation1)))
    return Declaration.from_sequence([
        j3, _filter(pair_ok),
        _proj([field("supp_nation"), field("cust_nation"),
               _CALL("year", field("l_shipdate")),
               field("l_extendedprice") * (1.0 - field("l_discount"))],
              ["supp_nation", "cust_nation", "l_year", "volume"]),
        _agg([("volume", "sum", None, "revenue")],
             keys=["supp_nation", "cust_nation", "l_year"]),
        _order([("supp_nation", "ascending"), ("cust_nation", "ascending"),
                ("l_year", "ascending")])])


def q8_plan(part: Table, supplier: Table, lineitem: Table, orders: Table,
            customer: Table, nation: Table, region: Table,
            p_type: str = "ECONOMY ANODIZED STEEL",
            nation_name: str = "BRAZIL", region_name: str = "AMERICA"
            ) -> Declaration:
    """Q8 national market share within a region, by order year."""
    pt = Declaration.from_sequence([
        _src(part), _filter(field("p_type") == p_type)])
    rg = Declaration.from_sequence([
        _src(region), _filter(field("r_name") == region_name)])
    cust_nat = _join("inner", ["n_regionkey"], ["r_regionkey"], [],
                     [_src(nation), rg])
    supp_nat = Declaration.from_sequence([
        _src(nation),
        _proj([field("n_nationkey"), field("n_name")],
              ["sn_key", "supp_nation"])])
    ords = Declaration.from_sequence([
        _src(orders),
        _filter((field("o_orderdate") >= _days(1995, 1, 1))
                & (field("o_orderdate") <= _days(1996, 12, 31)))])
    j1 = _join("inner", ["l_partkey"], ["p_partkey"], [],
               [_src(lineitem), pt])
    j2 = _join("inner", ["l_orderkey"], ["o_orderkey"],
               ["o_custkey", "o_orderdate"], [j1, ords])
    j3 = _join("inner", ["o_custkey"], ["c_custkey"], ["c_nationkey"],
               [j2, _src(customer)])
    j4 = _join("left semi", ["c_nationkey"], ["n_nationkey"], None,
               [j3, cust_nat])
    j5 = _join("inner", ["l_suppkey"], ["s_suppkey"], ["s_nationkey"],
               [j4, _src(supplier)])
    j6 = _join("inner", ["s_nationkey"], ["sn_key"], ["supp_nation"],
               [j5, supp_nat])
    vol = field("l_extendedprice") * (1.0 - field("l_discount"))
    return Declaration.from_sequence([
        j6,
        _proj([_CALL("year", field("o_orderdate")), vol,
               _CALL("if_else", field("supp_nation") == nation_name,
                     vol, _LIT(0.0))],
              ["o_year", "volume", "nation_volume"]),
        _agg([("nation_volume", "sum", None, "nation_vol"),
              ("volume", "sum", None, "total_vol")], keys=["o_year"]),
        _proj([field("o_year"),
               field("nation_vol") / field("total_vol")],
              ["o_year", "mkt_share"]),
        _order([("o_year", "ascending")])])


def q11_plan(partsupp: Table, supplier: Table, nation: Table,
             nation_name: str = "GERMANY", fraction: float = 0.0001
             ) -> Declaration:
    """Q11 important stock: per-part value above a global threshold
    (scalar subquery as keys=[] aggregate + literal-key join)."""
    nat = Declaration.from_sequence([
        _src(nation), _filter(field("n_name") == nation_name)])
    sup = _join("left semi", ["s_nationkey"], ["n_nationkey"], None,
                [_src(supplier), nat])
    ps = Declaration.from_sequence([
        _join("left semi", ["ps_suppkey"], ["s_suppkey"], None,
              [_src(partsupp), sup]),
        _proj([field("ps_partkey"),
               field("ps_supplycost") * _CALL(
                   "cast", field("ps_availqty"),
                   target_type="float64")],
              ["ps_partkey", "value"])])
    per_part = _with_unit_key(Declaration.from_sequence([
        ps, _agg([("value", "sum", None, "value")], keys=["ps_partkey"])]),
        ["ps_partkey", "value"], ["ps_partkey", "value"])
    total = _with_unit_key(Declaration.from_sequence([
        ps, _agg([("value", "sum", None, "total")], keys=[])]),
        ["total"], ["total"])
    return Declaration.from_sequence([
        _join("inner", ["__k1"], ["__k1"], ["total"], [per_part, total]),
        _filter(field("value") > field("total") * fraction),
        _proj([field("ps_partkey"), field("value")],
              ["ps_partkey", "value"]),
        _order([("value", "descending"), ("ps_partkey", "ascending")])])


def q13_plan(customer: Table, orders: Table,
             word1: str = "special", word2: str = "requests"
             ) -> Declaration:
    """Q13 customer distribution: left-outer join + two-level count."""
    ords = Declaration.from_sequence([
        _src(orders),
        _filter(_CALL("invert", _CALL(
            "match_like", field("o_comment"),
            pattern=f"%{word1}%{word2}%")))])
    return Declaration.from_sequence([
        _join("left outer", ["c_custkey"], ["o_custkey"], ["o_orderkey"],
              [_src(customer), ords]),
        _agg([("o_orderkey", "count", None, "c_count")],
             keys=["c_custkey"]),
        _agg([([], "count_all", None, "custdist")], keys=["c_count"]),
        _order([("custdist", "descending"), ("c_count", "descending")])])


def q14_plan(lineitem: Table, part: Table,
             date_lo: int | None = None) -> Declaration:
    """Q14 promotion effect: 100 * promo revenue / total revenue."""
    lo = _days(1995, 9, 1) if date_lo is None else date_lo
    li = Declaration.from_sequence([
        _src(lineitem),
        _filter((field("l_shipdate") >= lo)
                & (field("l_shipdate") < lo + 30))])
    vol = field("l_extendedprice") * (1.0 - field("l_discount"))
    return Declaration.from_sequence([
        _join("inner", ["l_partkey"], ["p_partkey"], ["p_type"],
              [li, _src(part)]),
        _proj([_CALL("if_else",
                     _CALL("starts_with", field("p_type"),
                           pattern="PROMO"),
                     vol, _LIT(0.0)), vol],
              ["promo", "volume"]),
        _agg([("promo", "sum", None, "promo"),
              ("volume", "sum", None, "total")], keys=[]),
        _proj([field("promo") * 100.0 / field("total")],
              ["promo_revenue"])])


def q15_plan(lineitem: Table, supplier: Table,
             date_lo: int | None = None) -> Declaration:
    """Q15 top supplier: revenue view + scalar max joined back."""
    lo = _days(1996, 1, 1) if date_lo is None else date_lo
    rev = Declaration.from_sequence([
        _src(lineitem),
        _filter((field("l_shipdate") >= lo)
                & (field("l_shipdate") < lo + 90)),
        _proj([field("l_suppkey"),
               field("l_extendedprice") * (1.0 - field("l_discount"))],
              ["supplier_no", "volume"]),
        _agg([("volume", "sum", None, "total_revenue")],
             keys=["supplier_no"])])
    rev_k = _with_unit_key(rev, ["supplier_no", "total_revenue"],
                           ["supplier_no", "total_revenue"])
    mx = _with_unit_key(Declaration.from_sequence([
        rev, _agg([("total_revenue", "max", None, "max_revenue")],
                  keys=[])]), ["max_revenue"], ["max_revenue"])
    top = Declaration.from_sequence([
        _join("inner", ["__k1"], ["__k1"], ["max_revenue"], [rev_k, mx]),
        _filter(field("total_revenue") == field("max_revenue"))])
    return Declaration.from_sequence([
        _join("inner", ["supplier_no"], ["s_suppkey"],
              ["s_name", "s_address", "s_phone"], [top, _src(supplier)]),
        _proj([field(c) for c in ["supplier_no", "s_name", "s_address",
                                  "s_phone", "total_revenue"]],
              ["s_suppkey", "s_name", "s_address", "s_phone",
               "total_revenue"]),
        _order([("s_suppkey", "ascending")])])


def q16_plan(partsupp: Table, part: Table, supplier: Table,
             brand: str = "Brand#45", type_prefix: str = "MEDIUM POLISHED",
             sizes=(49, 14, 23, 45, 19, 3, 36, 9)) -> Declaration:
    """Q16 parts/supplier relationship: distinct suppliers per part class,
    excluding complaint suppliers (anti join)."""
    pt = Declaration.from_sequence([
        _src(part),
        _filter((field("p_brand") != brand)
                & _CALL("invert", _CALL("starts_with", field("p_type"),
                                        pattern=type_prefix))
                & _CALL("is_in", field("p_size"),
                        value_set=list(sizes)))])
    bad_sup = Declaration.from_sequence([
        _src(supplier),
        _filter(_CALL("match_like", field("s_comment"),
                      pattern="%Customer%Complaints%"))])
    ps = _join("left anti", ["ps_suppkey"], ["s_suppkey"], None,
               [_src(partsupp), bad_sup])
    return Declaration.from_sequence([
        _join("inner", ["ps_partkey"], ["p_partkey"],
              ["p_brand", "p_type", "p_size"], [ps, pt]),
        _agg([("ps_suppkey", "count_distinct", None, "supplier_cnt")],
             keys=["p_brand", "p_type", "p_size"]),
        _order([("supplier_cnt", "descending"), ("p_brand", "ascending"),
                ("p_type", "ascending"), ("p_size", "ascending")])])


def q17_plan(lineitem: Table, part: Table, brand: str = "Brand#23",
             container: str = "MED BOX") -> Declaration:
    """Q17 small-quantity-order revenue: correlated avg as grouped
    aggregate joined back per part."""
    pt = Declaration.from_sequence([
        _src(part),
        _filter((field("p_brand") == brand)
                & (field("p_container") == container))])
    li_p = _join("inner", ["l_partkey"], ["p_partkey"], [],
                 [_src(lineitem), pt])
    avg_q = Declaration.from_sequence([
        _src(lineitem),
        _agg([("l_quantity", "mean", None, "avg_qty")],
             keys=["l_partkey"]),
        _proj([field("l_partkey"), field("avg_qty")],
              ["ap_partkey", "avg_qty"])])
    return Declaration.from_sequence([
        _join("inner", ["l_partkey"], ["ap_partkey"], ["avg_qty"],
              [li_p, avg_q]),
        _filter(field("l_quantity") < field("avg_qty") * 0.2),
        _agg([("l_extendedprice", "sum", None, "total")], keys=[]),
        _proj([field("total") / 7.0], ["avg_yearly"])])


def q18_plan(customer: Table, orders: Table, lineitem: Table,
             quantity: float = 300.0, limit: int = 100) -> Declaration:
    """Q18 large-volume customers: HAVING sum(qty) > threshold."""
    big = Declaration.from_sequence([
        _src(lineitem),
        _agg([("l_quantity", "sum", None, "sum_qty")], keys=["l_orderkey"]),
        _filter(field("sum_qty") > quantity)])
    jo = _join("inner", ["l_orderkey"], ["o_orderkey"],
               ["o_custkey", "o_orderdate", "o_totalprice"],
               [big, _src(orders)])
    jc = _join("inner", ["o_custkey"], ["c_custkey"], ["c_name"],
               [jo, _src(customer)])
    return Declaration.from_sequence([
        jc,
        _proj([field(c) for c in
               ["c_name", "o_custkey", "l_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty"]],
              ["c_name", "c_custkey", "o_orderkey", "o_orderdate",
               "o_totalprice", "sum_qty"]),
        _order([("o_totalprice", "descending"),
                ("o_orderdate", "ascending"),
                ("o_orderkey", "ascending")]),
        _fetch(limit)])


def q19_plan(lineitem: Table, part: Table) -> Declaration:
    """Q19 discounted revenue: disjunction of three brand/container/
    quantity/size envelopes."""
    li = Declaration.from_sequence([
        _src(lineitem),
        _filter(_CALL("is_in", field("l_shipmode"),
                      value_set=["AIR", "REG AIR"])
                & (field("l_shipinstruct") == "DELIVER IN PERSON"))])
    j = _join("inner", ["l_partkey"], ["p_partkey"],
              ["p_brand", "p_container", "p_size"], [li, _src(part)])
    b1 = ((field("p_brand") == "Brand#12")
          & _CALL("is_in", field("p_container"),
                  value_set=["SM CASE", "SM BOX", "SM PACK", "SM PKG"])
          & (field("l_quantity") >= 1.0) & (field("l_quantity") <= 11.0)
          & (field("p_size") >= 1) & (field("p_size") <= 5))
    b2 = ((field("p_brand") == "Brand#23")
          & _CALL("is_in", field("p_container"),
                  value_set=["MED BAG", "MED BOX", "MED PKG", "MED PACK"])
          & (field("l_quantity") >= 10.0) & (field("l_quantity") <= 20.0)
          & (field("p_size") >= 1) & (field("p_size") <= 10))
    b3 = ((field("p_brand") == "Brand#34")
          & _CALL("is_in", field("p_container"),
                  value_set=["LG CASE", "LG BOX", "LG PACK", "LG PKG"])
          & (field("l_quantity") >= 20.0) & (field("l_quantity") <= 30.0)
          & (field("p_size") >= 1) & (field("p_size") <= 15))
    return Declaration.from_sequence([
        j, _filter(b1 | b2 | b3),
        _proj([field("l_extendedprice") * (1.0 - field("l_discount"))],
              ["volume"]),
        _agg([("volume", "sum", None, "revenue")], keys=[])])


def q20_plan(supplier: Table, nation: Table, partsupp: Table,
             part: Table, lineitem: Table, name_prefix: str = "forest",
             nation_name: str = "CANADA",
             date_lo: int | None = None) -> Declaration:
    """Q20 potential part promotion: availqty > half of the year's
    shipped quantity, forest parts, suppliers of one nation."""
    lo = _days(1994, 1, 1) if date_lo is None else date_lo
    shipped = Declaration.from_sequence([
        _src(lineitem),
        _filter((field("l_shipdate") >= lo)
                & (field("l_shipdate") < lo + 365)),
        _agg([("l_quantity", "sum", None, "sum_qty")],
             keys=["l_partkey", "l_suppkey"]),
        _proj([field("l_partkey"), field("l_suppkey"), field("sum_qty")],
              ["lp_partkey", "lp_suppkey", "sum_qty"])])
    forest_part = Declaration.from_sequence([
        _src(part),
        _filter(_CALL("starts_with", field("p_name"),
                      pattern=name_prefix))])
    ps = _join("inner", ["ps_partkey", "ps_suppkey"],
               ["lp_partkey", "lp_suppkey"], ["sum_qty"],
               [_join("left semi", ["ps_partkey"], ["p_partkey"], None,
                      [_src(partsupp), forest_part]), shipped])
    qualifying = Declaration.from_sequence([
        ps,
        _filter(_CALL("cast", field("ps_availqty"),
                      target_type="float64")
                > field("sum_qty") * 0.5)])
    nat = Declaration.from_sequence([
        _src(nation), _filter(field("n_name") == nation_name)])
    sup = _join("left semi", ["s_nationkey"], ["n_nationkey"], None,
                [_src(supplier), nat])
    return Declaration.from_sequence([
        _join("left semi", ["s_suppkey"], ["ps_suppkey"], None,
              [sup, qualifying]),
        _proj([field("s_name"), field("s_address")],
              ["s_name", "s_address"]),
        _order([("s_name", "ascending")])])


def q21_plan(supplier: Table, lineitem: Table, orders: Table,
             nation: Table, nation_name: str = "SAUDI ARABIA",
             limit: int = 100) -> Declaration:
    """Q21 suppliers who kept orders waiting — EXISTS/NOT EXISTS pair
    rewritten as per-order distinct-supplier counts: flag late lines in
    multi-supplier orders where exactly one supplier was late."""
    stats = Declaration.from_sequence([
        _src(lineitem),
        _agg([("l_suppkey", "count_distinct", None, "nsupp")],
             keys=["l_orderkey"]),
        _proj([field("l_orderkey"), field("nsupp")],
              ["so_orderkey", "nsupp"])])
    late = Declaration.from_sequence([
        _src(lineitem),
        _filter(field("l_receiptdate") > field("l_commitdate"))])
    late_stats = Declaration.from_sequence([
        late,
        _agg([("l_suppkey", "count_distinct", None, "nlate")],
             keys=["l_orderkey"]),
        _proj([field("l_orderkey"), field("nlate")],
              ["lo_orderkey", "nlate"])])
    f_orders = Declaration.from_sequence([
        _src(orders), _filter(field("o_orderstatus") == "F")])
    nat = Declaration.from_sequence([
        _src(nation), _filter(field("n_name") == nation_name)])
    sup = _join("left semi", ["s_nationkey"], ["n_nationkey"], None,
                [_src(supplier), nat])
    l1 = _join("left semi", ["l_orderkey"], ["o_orderkey"], None,
               [late, f_orders])
    l1 = _join("inner", ["l_suppkey"], ["s_suppkey"], ["s_name"],
               [l1, sup])
    l1 = _join("inner", ["l_orderkey"], ["so_orderkey"], ["nsupp"],
               [l1, stats])
    l1 = _join("inner", ["l_orderkey"], ["lo_orderkey"], ["nlate"],
               [l1, late_stats])
    return Declaration.from_sequence([
        l1,
        _filter((field("nsupp") > 1) & (field("nlate") == 1)),
        _agg([([], "count_all", None, "numwait")], keys=["s_name"]),
        _order([("numwait", "descending"), ("s_name", "ascending")]),
        _fetch(limit)])


def q22_plan(customer: Table, orders: Table,
             codes=("13", "31", "23", "29", "30", "18", "17")
             ) -> Declaration:
    """Q22 global sales opportunity: rich, order-less customers in a set
    of country codes; avg balance via keys=[] aggregate + literal join."""
    cust = Declaration.from_sequence([
        _src(customer),
        _proj([_CALL("utf8_slice_codeunits", field("c_phone"),
                     start=0, stop=2),
               field("c_custkey"), field("c_acctbal")],
              ["cntrycode", "c_custkey", "c_acctbal"]),
        _filter(_CALL("is_in", field("cntrycode"),
                      value_set=list(codes)))])
    avg_bal = _with_unit_key(Declaration.from_sequence([
        cust,
        _filter(field("c_acctbal") > 0.0),
        _agg([("c_acctbal", "mean", None, "avg_bal")], keys=[])]),
        ["avg_bal"], ["avg_bal"])
    cust_k = _with_unit_key(cust, ["cntrycode", "c_custkey", "c_acctbal"],
                            ["cntrycode", "c_custkey", "c_acctbal"])
    rich = Declaration.from_sequence([
        _join("inner", ["__k1"], ["__k1"], ["avg_bal"], [cust_k, avg_bal]),
        _filter(field("c_acctbal") > field("avg_bal"))])
    no_orders = _join("left anti", ["c_custkey"], ["o_custkey"], None,
                      [rich, _src(orders)])
    return Declaration.from_sequence([
        no_orders,
        _agg([([], "count_all", None, "numcust"),
              ("c_acctbal", "sum", None, "totacctbal")],
             keys=["cntrycode"]),
        _order([("cntrycode", "ascending")])])
