"""Newline-delimited JSON reader.

Reference analogue: cpp/src/arrow/json/ (chunked rapidjson pipeline,
json/reader.h). Host-side: stdlib json parsing + numpy conversion, schema
unioned across records, nested objects/lists mapped to struct/list types.
"""

from __future__ import annotations

import json as _json
from typing import Dict, List, Optional

from .. import types as T
from ..array.array import array as make_array
from ..array.construct import infer_type
from ..table import Table
from ..types import Schema


class _OptionsBase:
    """equals/validate surface shared by the options classes
    (pyarrow _csv.pyx options semantics)."""

    def equals(self, other) -> bool:
        return (type(self) is type(other) and
                self.__dict__ == other.__dict__)

    def validate(self) -> None:
        return None
class ReadOptions(_OptionsBase):
    def __init__(self, use_threads: bool = True,
                 block_size: int = 1 << 20):
        self.use_threads = use_threads
        self.block_size = block_size


class ParseOptions(_OptionsBase):
    def __init__(self, explicit_schema: Optional[Schema] = None,
                 newlines_in_values: bool = False,
                 unexpected_field_behavior: str = "infer"):
        self.explicit_schema = explicit_schema
        self.newlines_in_values = newlines_in_values
        self.unexpected_field_behavior = unexpected_field_behavior


def read_json(source, read_options: Optional[ReadOptions] = None,
              parse_options: Optional[ParseOptions] = None) -> Table:
    po = parse_options or ParseOptions()
    if isinstance(source, str):
        with open(source, "rb") as f:
            data = f.read()
    elif isinstance(source, (bytes, bytearray)):
        data = bytes(source)
    else:
        data = source.read()
    if isinstance(data, bytes):
        data = data.decode("utf8")

    records: List[Dict] = []
    for line in data.splitlines():
        line = line.strip()
        if not line:
            continue
        records.append(_json.loads(line))

    names: List[str] = []
    for r in records:
        for k in r:
            if k not in names:
                names.append(k)

    if po.explicit_schema is not None:
        schema = po.explicit_schema
        if po.unexpected_field_behavior == "error":
            extra = [n for n in names if schema.get_field_index(n) < 0]
            if extra:
                raise ValueError(f"unexpected JSON fields: {extra}")
        elif po.unexpected_field_behavior == "infer":
            for n in names:
                if schema.get_field_index(n) < 0:
                    col = [r.get(n) for r in records]
                    schema = schema.append(
                        T.field(n, infer_type(col)))
        names = schema.names
    else:
        schema = None

    cols = {}
    for n in names:
        col = [r.get(n) for r in records]
        t = (schema.field(n).type if schema is not None else None)
        cols[n] = make_array(col, t)
    out_schema = schema or Schema(
        [T.field(n, cols[n].type) for n in names])
    return Table.from_pydict(cols, out_schema)


def open_json(source, read_options=None, parse_options=None):
    """Streaming newline-delimited JSON reader (pyarrow.json.open_json):
    yields RecordBatches of block_size rows."""
    tbl = read_json(source, read_options, parse_options)
    block = getattr(read_options, "block_size", 1 << 20) if read_options \
        else 1 << 20
    rows_per = max(1, block // 64)  # ~64B/row working estimate
    return iter(tbl.to_batches(max_chunksize=rows_per))
