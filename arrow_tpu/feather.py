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


def read_table(source, columns=None, memory_map=False,
               use_threads=True) -> Table:
    t = read_feather(source)
    return t.select(columns) if columns is not None else t


# pyarrow.feather name parity
from .errors import ArrowInvalid as FeatherError  # noqa: E402
from .io_streams import Codec  # noqa: F401,E402
from .api import concat_tables  # noqa: F401,E402
from .types import schema  # noqa: F401,E402
from typing import Sequence  # noqa: F401,E402


class FeatherDataset:
    """Multi-file feather reader (python/pyarrow/feather.py
    FeatherDataset)."""

    def __init__(self, path_or_paths, validate_schema: bool = True):
        self.paths = list(path_or_paths)
        self.validate_schema = validate_schema

    def read_table(self, columns=None):
        from .api import concat_tables as _concat
        tables = [read_table(p, columns=columns) for p in self.paths]
        if self.validate_schema:
            for t in tables[1:]:
                if not t.schema.equals(tables[0].schema):
                    raise FeatherError("schemas do not match")
        return _concat(tables)

    def read_pandas(self, columns=None):
        return self.read_table(columns).to_pandas()


def check_chunked_overflow(name, col):
    """Feather V1 cannot store chunked binary >2GB (feather.py)."""
    if col.nbytes > (1 << 31) - 1:
        raise ValueError(f"Column '{name}' exceeds 2GB maximum capacity "
                         "of a Feather binary column")
