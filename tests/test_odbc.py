"""Flight SQL ODBC driver, end to end through the REAL unixODBC driver
manager (libodbc.so.2): driver manager -> our native driver
(flight/odbc/driver.cpp) -> socket gateway -> Flight SQL server -> the
engine. Reference analogue: cpp/src/arrow/flight/sql/odbc/."""

import ctypes
import ctypes.util

import pytest

import arrow_tpu as at

SQL_HANDLE_ENV, SQL_HANDLE_DBC, SQL_HANDLE_STMT = 1, 2, 3
SQL_ATTR_ODBC_VERSION, SQL_OV_ODBC3 = 200, 3
SQL_NTS = -3
SQL_C_CHAR, SQL_C_SBIGINT, SQL_C_DOUBLE = 1, -25, 8
SQL_NULL_DATA = -1
SQL_NO_DATA = 100
SQL_DRIVER_NOPROMPT = 0


def _load_dm():
    path = ctypes.util.find_library("odbc") or "libodbc.so.2"
    try:
        return ctypes.CDLL(path)
    except OSError:
        pytest.skip("unixODBC driver manager not available")


@pytest.fixture(scope="module")
def odbc_stack():
    from arrow_tpu.flight.odbc import driver_path
    from arrow_tpu.flight.odbc_gateway import OdbcGateway
    from arrow_tpu.flight.sql import FlightSqlServer

    drv = driver_path()
    if drv is None:
        pytest.skip("no toolchain for the ODBC driver")
    tables = {
        "t": at.table({"a": [1, 2, 3, None],
                       "b": [1.5, 2.5, 3.5, 4.5],
                       "s": ["x", "y", None, "w"]})}
    with FlightSqlServer(tables=tables) as srv:
        with OdbcGateway(f"grpc://127.0.0.1:{srv.port}") as gw:
            yield drv, gw.port


def _check(rc, what):
    assert rc in (0, 1), f"{what} rc={rc}"


def test_odbc_select_via_driver_manager(odbc_stack):
    drv, gw_port = odbc_stack
    dm = _load_dm()

    henv = ctypes.c_void_p()
    _check(dm.SQLAllocHandle(SQL_HANDLE_ENV, None,
                             ctypes.byref(henv)), "alloc env")
    _check(dm.SQLSetEnvAttr(henv, SQL_ATTR_ODBC_VERSION,
                            ctypes.c_void_p(SQL_OV_ODBC3), 0),
           "set odbc3")
    hdbc = ctypes.c_void_p()
    _check(dm.SQLAllocHandle(SQL_HANDLE_DBC, henv,
                             ctypes.byref(hdbc)), "alloc dbc")
    conn_str = (f"Driver={drv};Gateway_Host=127.0.0.1;"
                f"Gateway_Port={gw_port}").encode()
    out = ctypes.create_string_buffer(1024)
    out_len = ctypes.c_short()
    rc = dm.SQLDriverConnect(hdbc, None, conn_str, len(conn_str),
                             out, 1024, ctypes.byref(out_len),
                             SQL_DRIVER_NOPROMPT)
    if rc not in (0, 1):
        # surface the driver manager diagnostic
        state = ctypes.create_string_buffer(8)
        text = ctypes.create_string_buffer(1024)
        tl = ctypes.c_short()
        nat = ctypes.c_int()
        dm.SQLGetDiagRec(SQL_HANDLE_DBC, hdbc, 1, state,
                         ctypes.byref(nat), text, 1024,
                         ctypes.byref(tl))
        pytest.fail(f"connect rc={rc} state={state.value} "
                    f"msg={text.value}")

    hstmt = ctypes.c_void_p()
    _check(dm.SQLAllocHandle(SQL_HANDLE_STMT, hdbc,
                             ctypes.byref(hstmt)), "alloc stmt")
    sql = b"SELECT a, b, s FROM t ORDER BY b"
    _check(dm.SQLExecDirect(hstmt, sql, len(sql)), "exec")

    ncols = ctypes.c_short()
    _check(dm.SQLNumResultCols(hstmt, ctypes.byref(ncols)), "numcols")
    assert ncols.value == 3

    name = ctypes.create_string_buffer(256)
    name_len = ctypes.c_short()
    sql_type = ctypes.c_short()
    col_size = ctypes.c_ssize_t()
    decimals = ctypes.c_short()
    nullable = ctypes.c_short()
    _check(dm.SQLDescribeCol(hstmt, 1, name, 256,
                             ctypes.byref(name_len),
                             ctypes.byref(sql_type),
                             ctypes.byref(col_size),
                             ctypes.byref(decimals),
                             ctypes.byref(nullable)), "describe")
    assert name.value == b"a"

    rows = []
    while True:
        rc = dm.SQLFetch(hstmt)
        if rc == SQL_NO_DATA:
            break
        _check(rc, "fetch")
        a = ctypes.c_longlong()
        a_ind = ctypes.c_ssize_t()
        dm.SQLGetData(hstmt, 1, SQL_C_SBIGINT, ctypes.byref(a), 8,
                      ctypes.byref(a_ind))
        b = ctypes.c_double()
        b_ind = ctypes.c_ssize_t()
        dm.SQLGetData(hstmt, 2, SQL_C_DOUBLE, ctypes.byref(b), 8,
                      ctypes.byref(b_ind))
        s = ctypes.create_string_buffer(64)
        s_ind = ctypes.c_ssize_t()
        dm.SQLGetData(hstmt, 3, SQL_C_CHAR, s, 64, ctypes.byref(s_ind))
        rows.append((
            None if a_ind.value == SQL_NULL_DATA else a.value,
            b.value,
            None if s_ind.value == SQL_NULL_DATA
            else s.value.decode()))
    assert rows == [(1, 1.5, "x"), (2, 2.5, "y"), (3, 3.5, None),
                    (None, 4.5, "w")]

    # error path: bad SQL surfaces a diagnostic
    bad = b"SELECT nonsense FROM missing_table"
    rc = dm.SQLExecDirect(hstmt, bad, len(bad))
    assert rc not in (0, 1)
    state = ctypes.create_string_buffer(8)
    text = ctypes.create_string_buffer(1024)
    tl = ctypes.c_short()
    nat = ctypes.c_int()
    rc = dm.SQLGetDiagRec(SQL_HANDLE_STMT, hstmt, 1, state,
                          ctypes.byref(nat), text, 1024,
                          ctypes.byref(tl))
    assert rc in (0, 1) and text.value

    dm.SQLFreeHandle(SQL_HANDLE_STMT, hstmt)
    dm.SQLDisconnect(hdbc)
    dm.SQLFreeHandle(SQL_HANDLE_DBC, hdbc)
    dm.SQLFreeHandle(SQL_HANDLE_ENV, henv)


def test_gateway_local_tables_no_flight():
    """Gateway can also execute against in-process tables (no Flight
    hop) — the protocol itself round-trips."""
    import socket
    import struct

    from arrow_tpu.flight.odbc_gateway import OdbcGateway
    tables = {"t": at.table({"x": [10, 20]})}
    with OdbcGateway(tables=tables) as gw:
        s = socket.create_connection(("127.0.0.1", gw.port))
        sql = b"XSELECT x FROM t"
        s.sendall(struct.pack("<I", len(sql)) + sql)
        (ln,) = struct.unpack("<I", s.recv(4))
        buf = b""
        while len(buf) < ln:
            buf += s.recv(ln - len(buf))
        status, ncols = struct.unpack_from("<II", buf, 0)
        assert status == 0 and ncols == 1
        s.close()
