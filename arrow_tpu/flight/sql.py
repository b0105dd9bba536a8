"""Flight SQL: SQL-over-Flight protocol.

Reference analogue: cpp/src/arrow/flight/sql/server.h + client.h (the
FlightSql.proto wire contract is vendored). Commands travel as
protobuf.Any-wrapped FlightSql messages inside FlightDescriptors/Tickets;
results are ordinary Flight record-batch streams. The server executes
statements with the built-in SQL frontend (arrow_tpu.sql) over registered
tables.
"""

from __future__ import annotations

import os
import sys
from typing import Dict, Optional

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "proto"))
import FlightSql_pb2 as fsql  # noqa: E402
from google.protobuf import any_pb2  # noqa: E402

from ..table import Table  # noqa: E402
from . import (FlightClient, FlightDescriptor, FlightEndpoint, FlightInfo,
               FlightServerBase, Ticket)  # noqa: E402


def _pack(msg) -> bytes:
    a = any_pb2.Any()
    a.Pack(msg)
    return a.SerializeToString()


def _unpack(data: bytes, cls):
    a = any_pb2.Any()
    a.ParseFromString(data)
    msg = cls()
    if not a.Unpack(msg):
        return None
    return msg


class FlightSqlServer(FlightServerBase):
    """Executes SQL statements over registered tables.

    Supported commands: CommandStatementQuery (+ the matching
    TicketStatementQuery), CommandGetTables, CommandGetDbSchemas,
    CommandGetCatalogs."""

    def __init__(self, location: str = "grpc://127.0.0.1:0",
                 tables: Optional[Dict[str, Table]] = None):
        super().__init__(location)
        self.tables: Dict[str, Table] = dict(tables or {})

    def register_table(self, name: str, table: Table):
        self.tables[name] = table

    def _execute(self, query: str) -> Table:
        from .. import sql as atsql
        return atsql.query(query, self.tables)

    # Flight overrides ----------------------------------------------------
    def get_flight_info(self, descriptor: FlightDescriptor) -> FlightInfo:
        cmd = _unpack(descriptor.command, fsql.CommandStatementQuery)
        if cmd is not None:
            result = self._execute(cmd.query)
            ticket = fsql.TicketStatementQuery()
            ticket.statement_handle = cmd.query.encode()
            return FlightInfo(result.schema, descriptor,
                              [FlightEndpoint(_pack(ticket))],
                              result.num_rows, -1)
        gt = _unpack(descriptor.command, fsql.CommandGetTables)
        if gt is not None:
            return FlightInfo(self._tables_table().schema, descriptor,
                              [FlightEndpoint(descriptor.command)], -1, -1)
        gc = _unpack(descriptor.command, fsql.CommandGetCatalogs)
        if gc is not None:
            return FlightInfo(self._catalogs_table().schema, descriptor,
                              [FlightEndpoint(descriptor.command)], -1, -1)
        raise NotImplementedError("unsupported FlightSql command")

    def do_get(self, ticket: Ticket) -> Table:
        tq = _unpack(ticket.ticket, fsql.TicketStatementQuery)
        if tq is not None:
            return self._execute(tq.statement_handle.decode())
        gt = _unpack(ticket.ticket, fsql.CommandGetTables)
        if gt is not None:
            return self._tables_table()
        gc = _unpack(ticket.ticket, fsql.CommandGetCatalogs)
        if gc is not None:
            return self._catalogs_table()
        raise NotImplementedError("unsupported FlightSql ticket")

    def _tables_table(self) -> Table:
        import arrow_tpu as at
        names = sorted(self.tables)
        return at.table({
            "catalog_name": [""] * len(names),
            "db_schema_name": [""] * len(names),
            "table_name": names,
            "table_type": ["TABLE"] * len(names),
        })

    def _catalogs_table(self) -> Table:
        import arrow_tpu as at
        return at.table({"catalog_name": [""]})


class FlightSqlClient:
    def __init__(self, location: str):
        self._client = FlightClient(location)

    def execute(self, query: str) -> Table:
        cmd = fsql.CommandStatementQuery()
        cmd.query = query
        desc = FlightDescriptor.for_command(_pack(cmd))
        info = self._client.get_flight_info(desc)
        return self._client.do_get(info.endpoints[0].ticket)

    def get_tables(self) -> Table:
        cmd = fsql.CommandGetTables()
        return self._client.do_get(Ticket(_pack(cmd)))

    def get_catalogs(self) -> Table:
        cmd = fsql.CommandGetCatalogs()
        return self._client.do_get(Ticket(_pack(cmd)))

    def close(self):
        self._client.close()
