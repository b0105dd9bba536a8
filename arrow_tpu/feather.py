"""Feather formats (reference: ipc/feather.h).

V2 = the Arrow IPC file format; V1 = the legacy pre-IPC layout
(io/feather_v1.py), auto-detected on read and writable with
``version=1``."""

from __future__ import annotations

from typing import Optional

from . import ipc
from .table import Table


def write_feather(table: Table, dest, compression: Optional[str] = None,
                  version: int = 2):
    if version == 1:
        from .io.feather_v1 import write_feather_v1
        if compression is not None:
            raise ValueError("feather v1 does not support compression")
        write_feather_v1(table, dest)
        return
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
            raw = f.read()
    elif isinstance(source, (bytes, bytearray)):
        raw = bytes(source)
    else:
        raw = source.read()
    from .io.feather_v1 import is_feather_v1, read_feather_v1
    if is_feather_v1(raw):
        return read_feather_v1(raw)
    return ipc.open_file(raw).read_all()


def read_table(source) -> Table:
    return read_feather(source)
