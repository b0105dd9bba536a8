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
