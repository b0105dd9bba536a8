"""Feather V2 format (= Arrow IPC file; reference: ipc/feather.h).

V1 (the pre-IPC legacy format) is not produced by modern writers and is
not supported."""

from __future__ import annotations

from typing import Optional

from . import ipc
from .table import Table


def write_feather(table: Table, dest, compression: Optional[str] = None):
    close = False
    if isinstance(dest, str):
        dest = open(dest, "wb")
        close = True
    with ipc.new_file(dest, table.schema, codec=compression) as w:
        w.write_table(table)
    if close:
        dest.close()


def read_feather(source) -> Table:
    if isinstance(source, str):
        with open(source, "rb") as f:
            return ipc.open_file(f.read()).read_all()
    return ipc.open_file(source).read_all()


def read_table(source) -> Table:
    return read_feather(source)
