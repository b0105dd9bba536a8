"""SQL frontend + Flight SQL protocol tests."""

import datetime

import pytest

import arrow_tpu as at
from arrow_tpu import sql


@pytest.fixture
def db():
    orders = at.table({"o_id": [1, 2, 3, 4], "cust": ["x", "y", "x", "z"],
                       "total": [10.0, 20.0, 30.0, None],
                       "day": at.array([datetime.date(2021, 1, i + 1)
                                        for i in range(4)])})
    items = at.table({"o_id": [1, 1, 2, 3],
                      "amount": [5.0, 7.0, 11.0, 13.0]})
    return {"orders": orders, "items": items}


def test_select_star_where(db):
    out = sql.query("SELECT * FROM orders WHERE total > 15", db)
    assert out.to_pydict()["o_id"] == [2, 3]


def test_projection_alias_order_limit(db):
    out = sql.query(
        "SELECT cust, total * 2 AS dbl FROM orders "
        "ORDER BY total DESC LIMIT 2", db)
    assert out.to_pydict() == {"cust": ["x", "y"], "dbl": [60.0, 40.0]}


def test_group_by_aggregates(db):
    out = sql.query(
        "SELECT cust, sum(total) AS s, count(*) AS n, avg(total) AS a "
        "FROM orders GROUP BY cust ORDER BY cust", db)
    d = out.to_pydict()
    assert d["cust"] == ["x", "y", "z"]
    assert d["s"] == [40.0, 20.0, None]
    assert d["n"] == [2, 1, 1]


def test_join(db):
    out = sql.query(
        "SELECT o_id, amount, cust FROM items "
        "JOIN orders ON items.o_id = orders.o_id "
        "WHERE amount BETWEEN 6 AND 12", db)
    assert out.to_pydict() == {"o_id": [1, 2], "amount": [7.0, 11.0],
                               "cust": ["x", "y"]}


def test_left_join(db):
    extra = dict(db)
    extra["more"] = at.table({"o_id": [1, 99], "v": [100, 200]})
    out = sql.query(
        "SELECT o_id, v FROM more LEFT JOIN orders ON more.o_id = "
        "orders.o_id ORDER BY o_id", extra)
    assert out.to_pydict()["o_id"] == [1, 99]


def test_in_like_null_predicates(db):
    out = sql.query("SELECT cust FROM orders WHERE cust IN ('x', 'z') "
                    "AND total IS NOT NULL", db)
    assert out.to_pydict()["cust"] == ["x", "x"]
    out2 = sql.query("SELECT o_id FROM orders WHERE total IS NULL", db)
    assert out2.to_pydict()["o_id"] == [4]
    out3 = sql.query("SELECT cust FROM orders WHERE cust LIKE 'x%'", db)
    assert out3.to_pydict()["cust"] == ["x", "x"]


def test_date_literal(db):
    out = sql.query(
        "SELECT o_id FROM orders WHERE day >= DATE '2021-01-03'", db)
    assert out.to_pydict()["o_id"] == [3, 4]


def test_count_distinct_and_offset(db):
    out = sql.query("SELECT count(distinct cust) AS c FROM orders", db)
    assert out.to_pydict()["c"] == [3]
    out2 = sql.query("SELECT o_id FROM orders ORDER BY o_id "
                     "LIMIT 2 OFFSET 1", db)
    assert out2.to_pydict()["o_id"] == [2, 3]


def test_parse_errors(db):
    with pytest.raises(ValueError):
        sql.query("SELECT FROM orders", db)
    with pytest.raises(KeyError):
        sql.query("SELECT * FROM nope", db)


def test_flight_sql_roundtrip(db):
    pytest.importorskip("grpc")
    from arrow_tpu.flight.sql import FlightSqlClient, FlightSqlServer
    with FlightSqlServer(tables=db) as srv:
        cli = FlightSqlClient(f"grpc://127.0.0.1:{srv.port}")
        out = cli.execute("SELECT cust, sum(total) AS s FROM orders "
                          "GROUP BY cust ORDER BY cust")
        assert out.to_pydict()["cust"] == ["x", "y", "z"]
        assert sorted(cli.get_tables().to_pydict()["table_name"]) == \
            ["items", "orders"]
        cli.close()


class TestTpchSql:
    """Real TPC-H SQL text executed by the frontend, compared against
    the (oracle-verified) Declaration plans in io/tpch_queries.py."""

    @pytest.fixture(scope="class")
    def t(self):
        from arrow_tpu.io import tpch
        return tpch.generate(0.002)

    def _cmp(self, got, want, float_rtol=1e-12):
        import numpy as np
        assert got.num_rows == want.num_rows
        g, w = got.to_pydict(), want.to_pydict()
        for name in want.column_names:
            assert name in g, name
            gv, wv = g[name], w[name]
            if wv and isinstance(wv[0], float):
                np.testing.assert_allclose(gv, wv, rtol=float_rtol,
                                           err_msg=name)
            else:
                assert gv == wv, name

    def test_q1_text(self, t):
        from arrow_tpu import sql
        from arrow_tpu.io import tpch_queries as q
        got = sql.query("""
            select l_returnflag, l_linestatus,
                   sum(l_quantity) as sum_qty,
                   sum(l_extendedprice) as sum_base_price,
                   sum(l_extendedprice * (1 - l_discount))
                       as sum_disc_price,
                   sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))
                       as sum_charge,
                   avg(l_quantity) as avg_qty,
                   avg(l_extendedprice) as avg_price,
                   avg(l_discount) as avg_disc,
                   count(*) as count_order
            from lineitem
            where l_shipdate <= date '1998-12-01' - interval '90' day
            group by l_returnflag, l_linestatus
            order by l_returnflag, l_linestatus
        """, {"lineitem": t["lineitem"]})
        want = q.q1_plan(t["lineitem"]).to_table()
        assert got.num_rows == want.num_rows
        g, w = got.to_pydict(), want.to_pydict()
        assert g["l_returnflag"] == w["l_returnflag"]
        assert g["count_order"] == w["count_order"]
        import numpy as np
        for c in ("sum_qty", "sum_disc_price", "sum_charge", "avg_disc"):
            np.testing.assert_allclose(g[c], w[c], rtol=1e-12)

    def test_q6_text(self, t):
        from arrow_tpu import sql
        from arrow_tpu.io import tpch_queries as q
        got = sql.query("""
            select sum(l_extendedprice * l_discount) as revenue
            from lineitem
            where l_shipdate >= date '1994-01-01'
              and l_shipdate < date '1994-01-01' + interval '1' year
              and l_discount between 0.05 and 0.07
              and l_quantity < 24
        """, {"lineitem": t["lineitem"]})
        want = q.q6_plan(t["lineitem"]).to_table()
        self._cmp(got, want)

    def test_q12_text_case_when(self, t):
        from arrow_tpu import sql
        from arrow_tpu.io import tpch_queries as q
        got = sql.query("""
            select l_shipmode,
                   sum(case when o_orderpriority = '1-URGENT'
                             or o_orderpriority = '2-HIGH'
                        then 1 else 0 end) as high_line_count,
                   sum(case when o_orderpriority <> '1-URGENT'
                            and o_orderpriority <> '2-HIGH'
                        then 1 else 0 end) as low_line_count
            from lineitem
            join orders on l_orderkey = o_orderkey
            where l_receiptdate >= date '1994-01-01'
              and l_receiptdate < date '1995-01-01'
              and l_shipmode in ('MAIL', 'SHIP')
            group by l_shipmode
            order by l_shipmode
        """, {"lineitem": t["lineitem"], "orders": t["orders"]})
        want = q.q12_style_plan(t["orders"], t["lineitem"]).to_table()
        self._cmp(got, want)

    def test_q14_text_agg_ratio(self, t):
        from arrow_tpu import sql
        from arrow_tpu.io import tpch_queries as q
        got = sql.query("""
            select 100.00 * sum(case when p_type like 'PROMO%'
                    then l_extendedprice * (1 - l_discount)
                    else 0 end)
                / sum(l_extendedprice * (1 - l_discount))
                as promo_revenue
            from lineitem
            join part on l_partkey = p_partkey
            where l_shipdate >= date '1995-09-01'
              and l_shipdate < date '1995-09-01' + interval '30' day
        """, {"lineitem": t["lineitem"], "part": t["part"]})
        want = q.q14_plan(t["lineitem"], t["part"]).to_table()
        self._cmp(got, want, float_rtol=1e-9)

    def test_q18_text_having(self, t):
        from arrow_tpu import sql
        got = sql.query("""
            select l_orderkey, sum(l_quantity) as sum_qty
            from lineitem
            group by l_orderkey
            having sum(l_quantity) > 150
            order by sum_qty desc, l_orderkey
            limit 100
        """, {"lineitem": t["lineitem"]})
        # oracle in plain python
        d = t["lineitem"].to_pydict()
        sums = {}
        for k, v in zip(d["l_orderkey"], d["l_quantity"]):
            sums[k] = sums.get(k, 0.0) + v
        exp = sorted(((k, s) for k, s in sums.items() if s > 150),
                     key=lambda kv: (-kv[1], kv[0]))[:100]
        assert got.column("l_orderkey").to_pylist() == [k for k, _ in exp]
        import numpy as np
        np.testing.assert_allclose(got.column("sum_qty").to_pylist(),
                                   [s for _, s in exp], rtol=1e-12)

    def test_semi_join_extract_substring(self, t):
        from arrow_tpu import sql
        got = sql.query("""
            select extract(year from o_orderdate) as y,
                   substring(o_orderpriority from 1 for 1) as pri,
                   count(*) as n
            from orders
            semi join lineitem on o_orderkey = l_orderkey
            group by y, pri
            order by y, pri
            limit 5
        """, {"orders": t["orders"], "lineitem": t["lineitem"]})
        assert got.column_names == ["y", "pri", "n"]
        assert got.num_rows == 5
        ys = got.column("y").to_pylist()
        assert all(1992 <= y <= 1998 for y in ys)
        assert all(p in "12345" for p in got.column("pri").to_pylist())


def test_flight_sql_prepared_and_metadata(db):
    """Prepared statements (create/bind-via-DoPut/execute/close) and the
    metadata commands (reference surface: flight/sql/server.h +
    client.h PreparedStatement)."""
    pytest.importorskip("grpc")
    import arrow_tpu as at
    from arrow_tpu.flight.sql import FlightSqlClient, FlightSqlServer
    with FlightSqlServer(tables=db) as srv:
        cli = FlightSqlClient(f"grpc://127.0.0.1:{srv.port}")
        stmt = cli.prepare("SELECT cust, total FROM orders "
                           "WHERE total > ? ORDER BY total DESC")
        stmt.set_parameters(at.table({"p0": [15.0]}))
        out = stmt.execute()
        assert all(v > 15.0 for v in out.column("total").to_pylist())
        # rebind with a different parameter: same handle, new result
        stmt.set_parameters(at.table({"p0": [0.0]}))
        assert stmt.execute().num_rows >= out.num_rows
        stmt.close()

        assert cli.get_db_schemas().column(
            "db_schema_name").to_pylist() == ["main"]
        assert cli.get_table_types().column(
            "table_type").to_pylist() == ["TABLE"]
        assert cli.get_primary_keys().num_rows == 0
        info = cli.get_sql_info()
        d = info.to_pydict()
        by_name = dict(zip(d["info_name"], d["value"]))
        import FlightSql_pb2 as fsql
        assert by_name[fsql.FLIGHT_SQL_SERVER_NAME] == "arrow_tpu"
        assert by_name[fsql.FLIGHT_SQL_SERVER_READ_ONLY] is True
        assert by_name[fsql.SQL_MAX_COLUMNS_IN_TABLE] == 10_000
        cli.close()


class TestDbapi:
    """PEP 249 driver over Flight SQL (reference analogue: the Flight SQL
    ODBC driver, flight/sql/odbc/)."""

    @pytest.fixture
    def con(self, db):
        pytest.importorskip("grpc")
        from arrow_tpu.flight import dbapi
        from arrow_tpu.flight.sql import FlightSqlServer
        with FlightSqlServer(tables=db) as srv:
            con = dbapi.connect(f"grpc://127.0.0.1:{srv.port}")
            yield con
            con.close()

    def test_execute_fetch(self, con):
        cur = con.cursor()
        cur.execute("SELECT cust, sum(total) AS s FROM orders "
                    "GROUP BY cust ORDER BY cust")
        assert cur.rowcount == 3
        assert [d[0] for d in cur.description] == ["cust", "s"]
        assert cur.fetchone() == ("x", 40.0)
        assert cur.fetchmany(5) == [("y", 20.0), ("z", None)]
        assert cur.fetchone() is None

    def test_qmark_parameters(self, con):
        cur = con.cursor()
        cur.execute("SELECT o_id FROM orders WHERE total > ? ORDER BY o_id",
                    (15.0,))
        assert cur.fetchall() == [(2,), (3,)]

    def test_iteration_and_arrow_table(self, con):
        cur = con.cursor()
        cur.execute("SELECT o_id FROM orders ORDER BY o_id")
        assert [r[0] for r in cur] == [1, 2, 3, 4]
        cur.execute("SELECT o_id, cust FROM orders ORDER BY o_id")
        t = cur.fetch_arrow_table()
        assert t.column_names == ["o_id", "cust"]
        assert t.num_rows == 4

    def test_type_objects_and_errors(self, con):
        from arrow_tpu.flight import dbapi
        cur = con.cursor()
        cur.execute("SELECT cust, total FROM orders")
        assert cur.description[0][1] == dbapi.STRING
        assert cur.description[1][1] == dbapi.NUMBER
        with pytest.raises(dbapi.ProgrammingError):
            cur.execute("SELECT * FROM missing_table")
        with pytest.raises(dbapi.NotSupportedError):
            con.rollback()
        con.close()
        with pytest.raises(dbapi.InterfaceError):
            con.cursor()
