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
