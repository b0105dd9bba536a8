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


def test_q6_matches_python_oracle(tables):
    li = tables["lineitem"]
    out = tpch_queries.q6_plan(li).to_table()
    d = li.to_pydict()
    lo = (datetime.date(1994, 1, 1) - datetime.date(1970, 1, 1)).days
    hi = (datetime.date(1995, 1, 1) - datetime.date(1970, 1, 1)).days
    exp = sum(p * disc for sd, disc, q, p in zip(
        d["l_shipdate"], d["l_discount"], d["l_quantity"],
        d["l_extendedprice"])
        if lo <= (sd - datetime.date(1970, 1, 1)).days < hi
        and 0.05 <= disc <= 0.07 and q < 24.0)
    got = out.column("revenue").to_pylist()[0]
    np.testing.assert_allclose([got], [exp], rtol=1e-12)


def test_q10_style_matches_python_oracle(tables):
    cust, orders, li = (tables["customer"], tables["orders"],
                        tables["lineitem"])
    out = tpch_queries.q10_style_plan(cust, orders, li, limit=20).to_table()

    od = orders.to_pydict()
    lo = (datetime.date(1994, 1, 1) - datetime.date(1970, 1, 1)).days
    ok_orders = {k: c for k, c, dte in zip(
        od["o_orderkey"], od["o_custkey"], od["o_orderdate"])
        if lo <= (dte - datetime.date(1970, 1, 1)).days < lo + 92}
    cd = cust.to_pydict()
    seg = dict(zip(cd["c_custkey"], cd["c_mktsegment"]))
    ld = li.to_pydict()
    rev = {}
    for okey, rf, p, disc in zip(ld["l_orderkey"], ld["l_returnflag"],
                                 ld["l_extendedprice"], ld["l_discount"]):
        if rf == "R" and okey in ok_orders:
            ck = ok_orders[okey]
            rev[ck] = rev.get(ck, 0.0) + p * (1.0 - disc)
    exp = sorted(((v, -k) for k, v in rev.items()), reverse=True)[:20]
    exp = [(-k, v) for v, k in exp]

    got = list(zip(out.column("c_custkey").to_pylist(),
                   out.column("revenue").to_pylist()))
    assert [k for k, _ in got] == [k for k, _ in exp]
    np.testing.assert_allclose([v for _, v in got],
                               [v for _, v in exp], rtol=1e-9)
    # mktsegment joined through correctly
    assert out.column("c_mktsegment").to_pylist() == \
        [seg[k] for k, _ in got]


def test_q12_style_matches_python_oracle(tables):
    orders, li = tables["orders"], tables["lineitem"]
    out = tpch_queries.q12_style_plan(orders, li).to_table()
    od = orders.to_pydict()
    prio = dict(zip(od["o_orderkey"], od["o_orderpriority"]))
    ld = li.to_pydict()
    lo = (datetime.date(1994, 1, 1) - datetime.date(1970, 1, 1)).days
    hi = (datetime.date(1995, 1, 1) - datetime.date(1970, 1, 1)).days
    counts = {}
    for okey, rd, sm in zip(ld["l_orderkey"], ld["l_receiptdate"],
                            ld["l_shipmode"]):
        days = (rd - datetime.date(1970, 1, 1)).days
        if sm in ("MAIL", "SHIP") and lo <= days < hi and okey in prio:
            h, l = counts.get(sm, (0, 0))
            if prio[okey] in ("1-URGENT", "2-HIGH"):
                h += 1
            else:
                l += 1
            counts[sm] = (h, l)
    got = {m: (h, l) for m, h, l in zip(
        out.column("l_shipmode").to_pylist(),
        out.column("high_line_count").to_pylist(),
        out.column("low_line_count").to_pylist())}
    assert got == counts
    assert out.column("l_shipmode").to_pylist() == sorted(counts)


def test_q5_matches_python_oracle():
    t = tpch.generate(0.002)
    out = tpch_queries.q5_plan(
        t["customer"], t["orders"], t["lineitem"], t["supplier"],
        t["nation"], t["region"]).to_table()

    cd, od = t["customer"].to_pydict(), t["orders"].to_pydict()
    ld, sd = t["lineitem"].to_pydict(), t["supplier"].to_pydict()
    nd, rd = t["nation"].to_pydict(), t["region"].to_pydict()
    asia = {rk for rk, rn in zip(rd["r_regionkey"], rd["r_name"])
            if rn == "ASIA"}
    nat_ok = {nk: nn for nk, nn, nr in zip(
        nd["n_nationkey"], nd["n_name"], nd["n_regionkey"]) if nr in asia}
    cust_nat = dict(zip(cd["c_custkey"], cd["c_nationkey"]))
    lo, hi = datetime.date(1994, 1, 1), datetime.date(1995, 1, 1)
    ord_cust = {ok: ck for ok, ck, dte in zip(
        od["o_orderkey"], od["o_custkey"], od["o_orderdate"])
        if lo <= dte < hi}
    supp_nat = dict(zip(sd["s_suppkey"], sd["s_nationkey"]))
    rev = {}
    for ok, sk, p, disc in zip(ld["l_orderkey"], ld["l_suppkey"],
                               ld["l_extendedprice"], ld["l_discount"]):
        ck = ord_cust.get(ok)
        if ck is None:
            continue
        cn = cust_nat.get(ck)
        if cn is None or cn not in nat_ok or supp_nat.get(sk) != cn:
            continue
        name = nat_ok[cn]
        rev[name] = rev.get(name, 0.0) + p * (1.0 - disc)
    exp = sorted(rev.items(), key=lambda kv: -kv[1])
    got = list(zip(out.column("n_name").to_pylist(),
                   out.column("revenue").to_pylist()))
    assert [k for k, _ in got] == [k for k, _ in exp]
    np.testing.assert_allclose([v for _, v in got],
                               [v for _, v in exp], rtol=1e-9)
