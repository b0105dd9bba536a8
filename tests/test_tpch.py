"""TPC-H plan differential tests vs pyarrow Acero (BASELINE configs 1-2 at
tiny scale): bit-level value comparison on the same generated data."""

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.acero as pacero
import pyarrow.compute as ppc
import pytest

import arrow_tpu as at
from arrow_tpu.io import tpch, tpch_queries


SF = 0.002  # ~12k lineitem rows


@pytest.fixture(scope="module")
def tables():
    return {
        "lineitem": tpch.lineitem_table(SF),
        "orders": tpch.orders_table(SF),
        "customer": tpch.customer_table(SF),
    }


def to_pa(t: at.Table) -> pa.Table:
    from arrow_tpu import ipc
    out = pa.ipc.open_stream(ipc.serialize_table(t)).read_all()
    # pyarrow's order_by cannot sort dictionary columns; decode to string
    cols = []
    for name in out.column_names:
        c = out.column(name)
        if pa.types.is_dictionary(c.type):
            c = c.cast(pa.string())
        cols.append(c)
    return pa.table(cols, names=out.column_names)


def pa_q1(lineitem: pa.Table):
    f = ppc.field
    disc_price = ppc.multiply(f("l_extendedprice"),
                              ppc.subtract(ppc.scalar(1.0), f("l_discount")))
    charge = ppc.multiply(disc_price,
                          ppc.add(ppc.scalar(1.0), f("l_tax")))
    return pacero.Declaration.from_sequence([
        pacero.Declaration("table_source",
                           pacero.TableSourceNodeOptions(lineitem)),
        pacero.Declaration("filter", pacero.FilterNodeOptions(
            ppc.less_equal(f("l_shipdate"),
                           ppc.scalar(datetime.date(1998, 9, 2))))),
        pacero.Declaration("project", pacero.ProjectNodeOptions(
            [f("l_returnflag"), f("l_linestatus"), f("l_quantity"),
             f("l_extendedprice"), disc_price, charge, f("l_discount")],
            ["l_returnflag", "l_linestatus", "l_quantity",
             "l_extendedprice", "disc_price", "charge", "l_discount"])),
        pacero.Declaration("aggregate", pacero.AggregateNodeOptions(
            [("l_quantity", "hash_sum", None, "sum_qty"),
             ("l_extendedprice", "hash_sum", None, "sum_base_price"),
             ("disc_price", "hash_sum", None, "sum_disc_price"),
             ("charge", "hash_sum", None, "sum_charge"),
             ("l_quantity", "hash_mean", None, "avg_qty"),
             ("l_extendedprice", "hash_mean", None, "avg_price"),
             ("l_discount", "hash_mean", None, "avg_disc"),
             ("l_quantity", "hash_count", None, "count_order")],
            keys=["l_returnflag", "l_linestatus"])),
        pacero.Declaration("order_by", pacero.OrderByNodeOptions(
            [("l_returnflag", "ascending"),
             ("l_linestatus", "ascending")])),
    ]).to_table()


def test_q1_matches_reference(tables):
    ours = tpch_queries.q1_plan(tables["lineitem"]).to_table()
    theirs = pa_q1(to_pa(tables["lineitem"]))
    assert ours.num_rows == theirs.num_rows
    assert ours.column_names == theirs.column_names
    o, t = ours.to_pydict(), theirs.to_pydict()
    assert o["l_returnflag"] == t["l_returnflag"]
    assert o["l_linestatus"] == t["l_linestatus"]
    assert o["count_order"] == t["count_order"]
    for col in ["sum_qty", "sum_base_price", "sum_disc_price",
                "sum_charge", "avg_qty", "avg_price", "avg_disc"]:
        np.testing.assert_allclose(o[col], t[col], rtol=1e-12)


def pa_q3(customer, orders, lineitem, limit=10):
    f = ppc.field
    cut = ppc.scalar(datetime.date(1995, 3, 15))
    cust = pacero.Declaration.from_sequence([
        pacero.Declaration("table_source",
                           pacero.TableSourceNodeOptions(customer)),
        pacero.Declaration("filter", pacero.FilterNodeOptions(
            ppc.equal(f("c_mktsegment"), ppc.scalar("BUILDING")))),
    ])
    ords = pacero.Declaration.from_sequence([
        pacero.Declaration("table_source",
                           pacero.TableSourceNodeOptions(orders)),
        pacero.Declaration("filter", pacero.FilterNodeOptions(
            ppc.less(f("o_orderdate"), cut))),
    ])
    li = pacero.Declaration.from_sequence([
        pacero.Declaration("table_source",
                           pacero.TableSourceNodeOptions(lineitem)),
        pacero.Declaration("filter", pacero.FilterNodeOptions(
            ppc.greater(f("l_shipdate"), cut))),
    ])
    co = pacero.Declaration("hashjoin", pacero.HashJoinNodeOptions(
        "inner", left_keys=["o_custkey"], right_keys=["c_custkey"],
        right_output=[]), inputs=[ords, cust])
    col = pacero.Declaration("hashjoin", pacero.HashJoinNodeOptions(
        "inner", left_keys=["l_orderkey"], right_keys=["o_orderkey"],
        right_output=["o_orderdate", "o_shippriority"]), inputs=[li, co])
    return pacero.Declaration.from_sequence([
        col,
        pacero.Declaration("project", pacero.ProjectNodeOptions(
            [f("l_orderkey"),
             ppc.multiply(f("l_extendedprice"),
                          ppc.subtract(ppc.scalar(1.0), f("l_discount"))),
             f("o_orderdate"), f("o_shippriority")],
            ["l_orderkey", "volume", "o_orderdate", "o_shippriority"])),
        pacero.Declaration("aggregate", pacero.AggregateNodeOptions(
            [("volume", "hash_sum", None, "revenue")],
            keys=["l_orderkey", "o_orderdate", "o_shippriority"])),
        pacero.Declaration("order_by", pacero.OrderByNodeOptions(
            [("revenue", "descending"), ("o_orderdate", "ascending")])),
    ]).to_table().slice(0, limit)


def test_q3_matches_reference(tables):
    ours = tpch_queries.q3_plan(tables["customer"], tables["orders"],
                                tables["lineitem"], limit=10).to_table()
    theirs = pa_q3(to_pa(tables["customer"]), to_pa(tables["orders"]),
                   to_pa(tables["lineitem"]), limit=10)
    assert ours.num_rows == theirs.num_rows
    o, t = ours.to_pydict(), theirs.to_pydict()
    assert o["l_orderkey"] == t["l_orderkey"]
    assert o["o_shippriority"] == t["o_shippriority"]
    np.testing.assert_allclose(o["revenue"], t["revenue"], rtol=1e-12)
    # dates come back as python date objects in both engines
    assert [d for d in o["o_orderdate"]] == \
        [d for d in t["o_orderdate"]]


def test_generator_shapes():
    t = tpch.generate(0.001)
    assert t["lineitem"].num_rows > 1000
    assert t["nation"].num_rows == 25
    assert t["region"].num_rows == 5
    assert "l_shipdate" in t["lineitem"].column_names


def test_q9_style_runs():
    t = tpch.generate(0.002)
    out = tpch_queries.q9_style_plan(
        t["part"], t["supplier"], t["lineitem"], t["partsupp"],
        t["orders"], t["nation"]).to_table()
    assert out.num_rows > 0
    assert out.column_names == ["nation", "o_year", "sum_profit"]
    # nations sorted ascending
    nations = out.column("nation").to_pylist()
    assert nations == sorted(nations)
