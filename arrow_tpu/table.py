"""Chunked containers: ChunkedArray, RecordBatch, Table.

Reference analogues: cpp/src/arrow/chunked_array.h:74, record_batch.h:41,
table.h:43. Host-side only; device execution operates on DeviceBatch
(arrow_tpu.device).
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional, Sequence, Union

import numpy as np

from . import types as T
from .array.array import Array, array
from .types import DataType, Field, Schema


class ChunkedArray:
    __slots__ = ("chunks", "type")

    def __init__(self, chunks: Sequence[Array], type: Optional[DataType] = None):
        chunks = [c if isinstance(c, Array) else array(c) for c in chunks]
        if type is None:
            if not chunks:
                raise ValueError("need type for empty ChunkedArray")
            type = chunks[0].type
        for c in chunks:
            if c.type != type:
                raise TypeError(f"chunk type {c.type!r} != {type!r}")
        self.chunks = list(chunks)
        self.type = type

    @property
    def num_chunks(self) -> int:
        return len(self.chunks)

    def __len__(self) -> int:
        return sum(len(c) for c in self.chunks)

    @property
    def length(self) -> int:
        return len(self)

    @property
    def null_count(self) -> int:
        return sum(c.null_count for c in self.chunks)

    def chunk(self, i: int) -> Array:
        return self.chunks[i]

    def combine(self) -> Array:
        """Concatenate chunks into one Array."""
        from .compute.host_concat import concat_arrays
        if len(self.chunks) == 1:
            return self.chunks[0]
        return concat_arrays(self.chunks, self.type)

    def to_pylist(self) -> List[Any]:
        out = []
        for c in self.chunks:
            out.extend(c.to_pylist())
        return out

    def slice(self, offset: int, length: Optional[int] = None) -> "ChunkedArray":
        total = len(self)
        if length is None:
            length = total - offset
        out = []
        for c in self.chunks:
            if length <= 0:
                break
            if offset >= len(c):
                offset -= len(c)
                continue
            take = min(len(c) - offset, length)
            out.append(c.slice(offset, take))
            offset = 0
            length -= take
        return ChunkedArray(out, self.type)

    def equals(self, other: "ChunkedArray") -> bool:
        from .array.array import pylist_equal
        return (self.type == other.type
                and pylist_equal(self.to_pylist(), other.to_pylist()))

    def __repr__(self):
        return f"<ChunkedArray {self.type!r} chunks={self.num_chunks} len={len(self)}>"

    # -- pyarrow-parity conveniences (chunked_array.h / pyarrow) ---------
    def combine_chunks(self) -> Array:
        return self.combine()

    def iterchunks(self):
        return iter(self.chunks)

    @property
    def data(self) -> "ChunkedArray":
        return self

    @property
    def nbytes(self) -> int:
        return sum(c.nbytes for c in self.chunks)

    def get_total_buffer_size(self) -> int:
        return self.nbytes

    @property
    def is_cpu(self) -> bool:
        return True

    def _wrap(self, arr: Array) -> "ChunkedArray":
        return ChunkedArray([arr], arr.type)

    def cast(self, target) -> "ChunkedArray":
        return self._wrap(self.combine().cast(target))

    def dictionary_encode(self) -> "ChunkedArray":
        return self._wrap(self.combine().dictionary_encode())

    def filter(self, mask, null_selection_behavior: str = "drop"):
        if isinstance(mask, ChunkedArray):
            mask = mask.combine()
        return self._wrap(self.combine().filter(
            mask, null_selection_behavior))

    def take(self, indices) -> "ChunkedArray":
        if isinstance(indices, ChunkedArray):
            indices = indices.combine()
        return self._wrap(self.combine().take(indices))

    def drop_null(self) -> "ChunkedArray":
        return self._wrap(self.combine().drop_null())

    def fill_null(self, fill_value) -> "ChunkedArray":
        return self._wrap(self.combine().fill_null(fill_value))

    def sort(self, order: str = "ascending", **kwargs) -> "ChunkedArray":
        return self._wrap(self.combine().sort(order, **kwargs))

    def unique(self) -> Array:
        return self.combine().unique()

    def value_counts(self) -> Array:
        return self.combine().value_counts()

    def is_null(self, nan_is_null: bool = False) -> "ChunkedArray":
        return self._wrap(self.combine().is_null(
            nan_is_null=nan_is_null))

    def is_valid(self) -> "ChunkedArray":
        return self._wrap(self.combine().is_valid())

    def is_nan(self) -> "ChunkedArray":
        return self._wrap(self.combine().is_nan())

    def index(self, value, start=None, end=None):
        return self.combine().index(value, start, end)

    def flatten(self):
        from .compute import call_function
        return [self._wrap(call_function("list_flatten",
                                         [self.combine()]))] \
            if self.type.is_nested else [self]

    def unify_dictionaries(self) -> "ChunkedArray":
        from .types import TypeId
        if self.type.id != TypeId.DICTIONARY or len(self.chunks) <= 1:
            return self
        return self._wrap(self.combine().dictionary_encode())

    def to_numpy(self, zero_copy_only: bool = False):
        return self.combine().to_numpy(zero_copy_only=zero_copy_only)

    def to_pandas(self):
        return self.combine().to_pandas()

    def to_string(self, **kwargs) -> str:
        return repr(self)

    format = to_string

    def validate(self, *, full: bool = False):
        for c in self.chunks:
            c.validate(full=full)


def chunked_array(chunks, type: Optional[DataType] = None) -> ChunkedArray:
    if chunks and not isinstance(chunks[0], (Array, ChunkedArray)) and \
            not _is_seq_of_seqs(chunks):
        chunks = [chunks]
    return ChunkedArray([c if isinstance(c, Array) else array(c, type)
                         for c in chunks], type)


def _is_seq_of_seqs(x) -> bool:
    return (len(x) > 0 and isinstance(x[0], (list, tuple, np.ndarray, Array)))


class RecordBatch:
    __slots__ = ("schema", "columns")

    def __arrow_c_stream__(self, requested_schema=None):
        from .c_data import batch_to_struct_data, stream_capsule
        return stream_capsule(
            [batch_to_struct_data(self)],
            Field("", T.struct(list(self.schema.fields))))

    def to_pandas(self):
        return Table.from_batches([self]).to_pandas()

    def __init__(self, schema: Schema, columns: Sequence[Array]):
        if len(schema) != len(columns):
            raise ValueError("schema/column count mismatch")
        n = len(columns[0]) if columns else 0
        for c in columns:
            if len(c) != n:
                raise ValueError("column length mismatch")
        self.schema = schema
        self.columns = list(columns)

    @classmethod
    def from_pydict(cls, data: Mapping[str, Any],
                    schema: Optional[Schema] = None) -> "RecordBatch":
        if schema is None:
            cols = [array(v) if not isinstance(v, Array) else v
                    for v in data.values()]
            schema = Schema([Field(k, c.type) for k, c in
                             zip(data.keys(), cols)])
        else:
            cols = [v if isinstance(v, Array) else array(v, schema[i].type)
                    for i, v in enumerate(data.values())]
        return cls(schema, cols)

    @classmethod
    def from_arrays(cls, arrays: Sequence, names: Sequence[str],
                    schema: Optional[Schema] = None) -> "RecordBatch":
        cols = [a if isinstance(a, Array) else array(a) for a in arrays]
        if schema is None:
            schema = Schema([Field(n, c.type) for n, c in zip(names, cols)])
        return cls(schema, cols)

    @property
    def num_rows(self) -> int:
        return len(self.columns[0]) if self.columns else 0

    @property
    def num_columns(self) -> int:
        return len(self.columns)

    def __len__(self) -> int:
        return self.num_rows

    def column(self, i: Union[int, str]) -> Array:
        if isinstance(i, str):
            idx = self.schema.get_field_index(i)
            if idx < 0:
                raise KeyError(f"no column named {i!r}")
            i = idx
        return self.columns[i]

    def __getitem__(self, i) -> Array:
        return self.column(i)

    @property
    def column_names(self) -> List[str]:
        return self.schema.names

    def slice(self, offset: int, length: Optional[int] = None) -> "RecordBatch":
        return RecordBatch(self.schema,
                           [c.slice(offset, length) for c in self.columns])

    def __dataframe__(self, nan_as_null: bool = False,
                      allow_copy: bool = True):
        """DataFrame interchange protocol (python/pyarrow/interchange/)."""
        from .interchange import _ATDataFrame
        return _ATDataFrame(self, nan_as_null, allow_copy)

    # -- pyarrow-parity conveniences (record_batch.h / pyarrow) ----------
    def _via_table(self, op, *args, **kwargs) -> "RecordBatch":
        t = getattr(Table.from_batches([self]), op)(*args, **kwargs)
        return RecordBatch(t.schema, [c.combine() for c in t.columns])

    def filter(self, mask, null_selection_behavior: str = "drop"):
        return self._via_table("filter", mask, null_selection_behavior)

    def take(self, indices) -> "RecordBatch":
        return self._via_table("take", indices)

    def drop_null(self) -> "RecordBatch":
        return self._via_table("drop_null")

    def sort_by(self, sorting, **kwargs) -> "RecordBatch":
        return self._via_table("sort_by", sorting, **kwargs)

    def cast(self, target_schema) -> "RecordBatch":
        return self._via_table("cast", target_schema)

    def add_column(self, i: int, field_, column) -> "RecordBatch":
        return self._via_table("add_column", i, field_, column)

    def append_column(self, field_, column) -> "RecordBatch":
        return self._via_table("append_column", field_, column)

    def set_column(self, i: int, field_, column) -> "RecordBatch":
        return self._via_table("set_column", i, field_, column)

    def remove_column(self, i: int) -> "RecordBatch":
        return self._via_table("remove_column", i)

    def drop_columns(self, columns) -> "RecordBatch":
        return self._via_table("drop_columns", columns)

    def rename_columns(self, names) -> "RecordBatch":
        return self._via_table("rename_columns", names)

    def field(self, i: Union[int, str]) -> Field:
        return self.schema[i]

    def itercolumns(self):
        return iter(self.columns)

    @property
    def shape(self):
        return (self.num_rows, self.num_columns)

    @property
    def nbytes(self) -> int:
        return sum(c.nbytes for c in self.columns)

    def get_total_buffer_size(self) -> int:
        return self.nbytes

    @property
    def is_cpu(self) -> bool:
        return True

    @property
    def device_type(self):
        from .device import DeviceAllocationType
        return DeviceAllocationType.CPU

    def copy_to(self, destination) -> "RecordBatch":
        return self

    def replace_schema_metadata(self, metadata=None) -> "RecordBatch":
        return RecordBatch(Schema(list(self.schema.fields), metadata),
                           list(self.columns))

    def serialize(self, options=None):
        """IPC-serialize this batch (ipc/writer.h SerializeRecordBatch)."""
        import io as _io
        from . import ipc as _ipc
        buf = _io.BytesIO()
        with _ipc.new_stream(buf, self.schema) as w:
            w.write_batch(self)
        from .buffer import Buffer
        return Buffer(buf.getvalue())

    def to_string(self, **kwargs) -> str:
        return repr(self)

    def validate(self, *, full: bool = False):
        for c in self.columns:
            c.validate(full=full)

    @classmethod
    def from_pylist(cls, rows, schema: Optional[Schema] = None):
        keys = list(schema.names) if schema is not None else \
            list(rows[0].keys()) if rows else []
        data = {k: [r.get(k) for r in rows] for k in keys}
        return cls.from_pydict(data, schema)

    @classmethod
    def from_pandas(cls, df, schema: Optional[Schema] = None):
        t = Table.from_pandas(df)
        if schema is not None:
            t = t.cast(schema)
        return RecordBatch(t.schema, [c.combine() for c in t.columns])

    @classmethod
    def from_struct_array(cls, struct_array) -> "RecordBatch":
        t = struct_array.type
        fields = list(t.fields)
        rows = struct_array.to_pylist()
        cols = [array([None if r is None else r.get(f.name)
                       for r in rows], f.type) for f in fields]
        return cls(Schema(fields), cols)

    def to_struct_array(self) -> Array:
        st = T.struct([(f.name, f.type) for f in self.schema.fields])
        return array(self.to_pylist(), st)

    def select(self, names: Sequence[Union[str, int]]) -> "RecordBatch":
        idxs = [self.schema.get_field_index(n) if isinstance(n, str) else n
                for n in names]
        return RecordBatch(Schema([self.schema.fields[i] for i in idxs],
                                  self.schema.metadata),
                           [self.columns[i] for i in idxs])

    def to_pydict(self) -> Dict[str, List[Any]]:
        return {f.name: c.to_pylist()
                for f, c in zip(self.schema.fields, self.columns)}

    def to_pylist(self) -> List[Dict[str, Any]]:
        cols = self.to_pydict()
        names = list(cols)
        return [{n: cols[n][i] for n in names} for i in range(self.num_rows)]

    def equals(self, other: "RecordBatch") -> bool:
        return (self.schema.equals(other.schema)
                and all(a.equals(b) for a, b in
                        zip(self.columns, other.columns)))

    def __repr__(self):
        return (f"<RecordBatch rows={self.num_rows} "
                f"cols={self.schema.names}>")


def record_batch(data, schema: Optional[Schema] = None,
                 names: Optional[Sequence[str]] = None) -> RecordBatch:
    if isinstance(data, Mapping):
        return RecordBatch.from_pydict(data, schema)
    if names is not None:
        return RecordBatch.from_arrays(data, names, schema)
    raise TypeError("record_batch needs a dict or (arrays, names)")


class Table:
    __slots__ = ("schema", "columns")

    def __init__(self, schema: Schema, columns: Sequence[ChunkedArray]):
        self.schema = schema
        self.columns = list(columns)

    def __dataframe__(self, nan_as_null: bool = False,
                      allow_copy: bool = True):
        """DataFrame interchange protocol (python/pyarrow/interchange/)."""
        from .interchange import _ATDataFrame
        return _ATDataFrame(self, nan_as_null, allow_copy)

    @classmethod
    def from_pydict(cls, data: Mapping[str, Any],
                    schema: Optional[Schema] = None) -> "Table":
        rb = RecordBatch.from_pydict(data, schema)
        return cls.from_batches([rb])

    @classmethod
    def from_arrays(cls, arrays, names) -> "Table":
        return cls.from_batches([RecordBatch.from_arrays(arrays, names)])

    @classmethod
    def from_batches(cls, batches: Sequence[RecordBatch],
                     schema: Optional[Schema] = None) -> "Table":
        if not batches:
            if schema is None:
                raise ValueError("need schema for empty table")
            return cls(schema, [ChunkedArray([], f.type) for f in schema])
        schema = schema or batches[0].schema
        cols = []
        for i in range(len(schema)):
            cols.append(ChunkedArray([b.columns[i] for b in batches],
                                     schema[i].type))
        return cls(schema, cols)

    @property
    def num_rows(self) -> int:
        return len(self.columns[0]) if self.columns else 0

    @property
    def num_columns(self) -> int:
        return len(self.columns)

    @property
    def column_names(self) -> List[str]:
        return self.schema.names

    def column(self, i: Union[int, str]) -> ChunkedArray:
        if isinstance(i, str):
            idx = self.schema.get_field_index(i)
            if idx < 0:
                raise KeyError(f"no column named {i!r}")
            i = idx
        return self.columns[i]

    def __getitem__(self, i) -> ChunkedArray:
        return self.column(i)

    def select(self, names) -> "Table":
        idxs = [self.schema.get_field_index(n) if isinstance(n, str) else n
                for n in names]
        return Table(Schema([self.schema.fields[i] for i in idxs],
                            self.schema.metadata),
                     [self.columns[i] for i in idxs])

    def to_batches(self, max_chunksize: Optional[int] = None) -> List[RecordBatch]:
        combined = [c.combine() for c in self.columns]
        n = self.num_rows
        if max_chunksize is None or max_chunksize >= n:
            return [RecordBatch(self.schema, combined)]
        out = []
        for start in range(0, n, max_chunksize):
            ln = min(max_chunksize, n - start)
            out.append(RecordBatch(self.schema,
                                   [c.slice(start, ln) for c in combined]))
        return out

    def combine_chunks(self) -> "Table":
        return Table(self.schema,
                     [ChunkedArray([c.combine()], c.type)
                      for c in self.columns])

    def to_pydict(self) -> Dict[str, List[Any]]:
        return {f.name: c.to_pylist()
                for f, c in zip(self.schema.fields, self.columns)}

    def to_pylist(self) -> List[Dict[str, Any]]:
        cols = self.to_pydict()
        names = list(cols)
        return [{n: cols[n][i] for n in names} for i in range(self.num_rows)]

    def slice(self, offset: int, length: Optional[int] = None) -> "Table":
        return Table(self.schema,
                     [c.slice(offset, length) for c in self.columns])

    def equals(self, other: "Table") -> bool:
        return (self.schema.equals(other.schema)
                and all(a.equals(b) for a, b in zip(self.columns, other.columns)))

    def __repr__(self):
        return f"<Table rows={self.num_rows} cols={self.schema.names}>"

    # --- compute conveniences (pyarrow.Table parity) --------------------

    def filter(self, mask, null_selection_behavior: str = "drop") -> "Table":
        from .compute import filter as _filter
        if not isinstance(mask, (Array, ChunkedArray)):
            from .acero import Declaration, FilterNodeOptions, \
                TableSourceNodeOptions
            return Declaration.from_sequence([
                Declaration("table_source", TableSourceNodeOptions(self)),
                Declaration("filter", FilterNodeOptions(mask)),
            ]).to_table()
        return _filter(self, mask, null_selection_behavior)

    def take(self, indices) -> "Table":
        from .compute import take as _take
        return _take(self, indices)

    def drop_null(self) -> "Table":
        from .compute import drop_null as _dn
        return _dn(self)

    def sort_by(self, sorting, null_placement: str = "at_end") -> "Table":
        from .acero import Declaration, OrderByNodeOptions, \
            TableSourceNodeOptions
        if isinstance(sorting, str):
            sorting = [(sorting, "ascending")]
        return Declaration.from_sequence([
            Declaration("table_source", TableSourceNodeOptions(self)),
            Declaration("order_by", OrderByNodeOptions(sorting,
                                                       null_placement)),
        ]).to_table()

    def group_by(self, keys, use_threads: bool = True) -> "TableGroupBy":
        return TableGroupBy(self, keys)

    def __arrow_c_stream__(self, requested_schema=None):
        from .c_data import batch_to_struct_data, stream_capsule
        batches = [batch_to_struct_data(rb) for rb in self.to_batches()]
        return stream_capsule(batches,
                              Field("", T.struct(list(self.schema.fields))))

    def to_pandas(self):
        import pandas as pd
        cols = {}
        for f in self.schema.fields:
            cols[f.name] = self.column(f.name).combine().to_pandas()
        return pd.DataFrame(cols)

    @classmethod
    def from_pandas(cls, df, schema: Optional[Schema] = None) -> "Table":
        import numpy as np
        import pandas as pd
        cols = {}
        for name in df.columns:
            s = df[name]
            if s.dtype == object:
                cols[name] = [None if (v is None or (isinstance(v, float)
                                                     and v != v)) else v
                              for v in s.tolist()]
            elif str(s.dtype).startswith("datetime64"):
                cols[name] = array(s.to_numpy())
            else:
                cols[name] = array(s.to_numpy())
        return cls.from_pydict(cols, schema)

    def rename_columns(self, names) -> "Table":
        if len(names) != len(self.schema):
            raise ValueError("name count mismatch")
        return Table(Schema([f.with_name(n) for f, n in
                             zip(self.schema.fields, names)],
                            self.schema.metadata), self.columns)

    def add_column(self, i: int, field_, column) -> "Table":
        if isinstance(field_, str):
            col = column if isinstance(column, ChunkedArray) else                 ChunkedArray([column if isinstance(column, Array)
                              else array(column)])
            field_ = Field(field_, col.type)
        else:
            col = column if isinstance(column, ChunkedArray) else                 ChunkedArray([column if isinstance(column, Array)
                              else array(column, field_.type)])
        fields = list(self.schema.fields)
        cols = list(self.columns)
        fields.insert(i, field_)
        cols.insert(i, col)
        return Table(Schema(fields, self.schema.metadata), cols)

    def append_column(self, field_, column) -> "Table":
        return self.add_column(self.num_columns, field_, column)

    def remove_column(self, i: int) -> "Table":
        fields = list(self.schema.fields)
        cols = list(self.columns)
        fields.pop(i)
        cols.pop(i)
        return Table(Schema(fields, self.schema.metadata), cols)

    def set_column(self, i: int, field_, column) -> "Table":
        return self.remove_column(i).add_column(i, field_, column)

    def drop_columns(self, names) -> "Table":
        if isinstance(names, str):
            names = [names]
        keep = [n for n in self.schema.names if n not in names]
        return self.select(keep)

    def cast(self, target_schema: Schema) -> "Table":
        from .compute import cast as _cast
        cols = []
        for f, c in zip(target_schema.fields, self.columns):
            combined = c.combine()
            if combined.type == f.type:
                cols.append(combined)
            else:
                cols.append(_cast(combined, to_type=f.type))
        return Table.from_arrays(cols, target_schema.names)

    def join(self, right_table: "Table", keys, right_keys=None,
             join_type: str = "left outer", left_suffix: str = "",
             right_suffix: str = "", coalesce_keys: bool = True) -> "Table":
        from .acero import Declaration, HashJoinNodeOptions, \
            TableSourceNodeOptions
        if isinstance(keys, str):
            keys = [keys]
        if right_keys is None:
            right_keys = keys
        elif isinstance(right_keys, str):
            right_keys = [right_keys]
        right_output = None
        if coalesce_keys and join_type not in ("right semi", "right anti"):
            right_output = [n for n in right_table.schema.names
                            if n not in right_keys]
        decl = Declaration("hashjoin", HashJoinNodeOptions(
            join_type, left_keys=list(keys), right_keys=list(right_keys),
            right_output=right_output,
            output_suffix_for_left=left_suffix,
            output_suffix_for_right=right_suffix), inputs=[
                Declaration("table_source", TableSourceNodeOptions(self)),
                Declaration("table_source",
                            TableSourceNodeOptions(right_table))])
        return decl.to_table()

    def join_asof(self, right_table: "Table", on: str, by, tolerance: int,
                  right_on=None, right_by=None) -> "Table":
        """As-of join (pyarrow Table.join_asof / asof_join_node.cc)."""
        from .acero import AsofJoinNodeOptions, Declaration, \
            TableSourceNodeOptions
        if isinstance(by, str):
            by = [by]
        right_on = right_on or on
        right_by = right_by if right_by is not None else list(by)
        if isinstance(right_by, str):
            right_by = [right_by]
        decl = Declaration("asofjoin", AsofJoinNodeOptions(
            left_on=on, left_by=list(by), right_on=right_on,
            right_by=list(right_by), tolerance=tolerance), inputs=[
                Declaration("table_source", TableSourceNodeOptions(self)),
                Declaration("table_source",
                            TableSourceNodeOptions(right_table))])
        return decl.to_table()

    # -- pyarrow-parity conveniences (table.h / pyarrow) -----------------
    def drop(self, columns) -> "Table":
        return self.drop_columns(columns)

    def field(self, i: Union[int, str]) -> Field:
        return self.schema[i]

    def itercolumns(self):
        return iter(self.columns)

    @property
    def shape(self):
        return (self.num_rows, self.num_columns)

    @property
    def nbytes(self) -> int:
        return sum(c.nbytes for c in self.columns)

    def get_total_buffer_size(self) -> int:
        return self.nbytes

    @property
    def is_cpu(self) -> bool:
        return True

    def flatten(self) -> "Table":
        """Flatten struct columns into top-level columns (table.h
        Flatten)."""
        from .types import TypeId
        fields, cols = [], []
        for f, c in zip(self.schema.fields, self.columns):
            if f.type.id == TypeId.STRUCT:
                rows = c.to_pylist()
                for sub in f.type.fields:
                    fields.append(Field(f"{f.name}.{sub.name}", sub.type,
                                        True))
                    cols.append(ChunkedArray([array(
                        [None if r is None else r.get(sub.name)
                         for r in rows], sub.type)]))
            else:
                fields.append(f)
                cols.append(c)
        return Table(Schema(fields, self.schema.metadata), cols)

    def replace_schema_metadata(self, metadata=None) -> "Table":
        return Table(Schema(list(self.schema.fields), metadata),
                     list(self.columns))

    def unify_dictionaries(self) -> "Table":
        return Table(self.schema,
                     [c.unify_dictionaries() for c in self.columns])

    def to_reader(self, max_chunksize: Optional[int] = None):
        return RecordBatchReader.from_batches(
            self.schema, self.to_batches(max_chunksize))

    def to_string(self, **kwargs) -> str:
        return repr(self)

    def to_struct_array(self, max_chunksize: Optional[int] = None):
        st = T.struct([(f.name, f.type) for f in self.schema.fields])
        return ChunkedArray([array(b.to_pylist(), st)
                             for b in self.to_batches(max_chunksize)], st)

    @classmethod
    def from_struct_array(cls, struct_array,
                          schema: Optional[Schema] = None) -> "Table":
        if isinstance(struct_array, ChunkedArray):
            batches = [RecordBatch.from_struct_array(c)
                       for c in struct_array.chunks]
        else:
            batches = [RecordBatch.from_struct_array(struct_array)]
        return cls.from_batches(batches, schema)

    @classmethod
    def from_pylist(cls, rows, schema: Optional[Schema] = None) -> "Table":
        return cls.from_batches([RecordBatch.from_pylist(rows, schema)])

    def to_tensor(self, null_to_nan: bool = False,
                  row_major: bool = True):
        """2-D tensor from a homogeneous numeric table (pyarrow
        Table.to_tensor)."""
        import numpy as np
        from .tensor import Tensor
        cols = []
        for c in self.columns:
            a = c.combine()
            if a.null_count:
                if not null_to_nan:
                    raise ValueError(
                        "table has nulls; pass null_to_nan=True")
                v = a.data.values().astype(np.float64).copy()
                v[~a.is_valid_mask()] = np.nan
            else:
                v = a.data.values()
            cols.append(np.asarray(v))
        m = np.column_stack(cols) if cols else np.empty((0, 0))
        if not row_major:
            m = np.asfortranarray(m)
        return Tensor.from_numpy(m)

    def validate(self, *, full: bool = False):
        for c in self.columns:
            c.validate(full=full)


class TableGroupBy:
    """pyarrow.TableGroupBy parity (python/pyarrow/table.pxi group_by)."""

    def __init__(self, table: Table, keys):
        if isinstance(keys, str):
            keys = [keys]
        self.table = table
        self.keys = list(keys)

    def aggregate(self, aggregations) -> Table:
        from .acero import AggregateNodeOptions, Declaration, \
            TableSourceNodeOptions
        aggs = []
        for spec in aggregations:
            if len(spec) == 3:
                target, fn, opts = spec
            else:
                target, fn = spec
                opts = None
            fn_base = fn[5:] if fn.startswith("hash_") else fn
            target_label = target if isinstance(target, str) else \
                "_".join(target) if target else ""
            out = f"{target_label}_{fn_base}" if target_label else \
                fn_base
            aggs.append((target, fn_base, opts, out))
        return Declaration.from_sequence([
            Declaration("table_source", TableSourceNodeOptions(self.table)),
            Declaration("aggregate", AggregateNodeOptions(aggs, self.keys)),
        ]).to_table()


def table(data, schema: Optional[Schema] = None, names=None) -> Table:
    if isinstance(data, Mapping):
        return Table.from_pydict(data, schema)
    if isinstance(data, Sequence) and data and isinstance(data[0], RecordBatch):
        return Table.from_batches(data, schema)
    if names is not None:
        return Table.from_arrays(data, names)
    raise TypeError("table needs dict, batches, or (arrays, names)")


class ChunkResolver:
    """Logical index -> (chunk, intra-chunk index) resolution via binary
    search (reference: chunk_resolver.h:65, ResolveMany :172)."""

    def __init__(self, chunks):
        import numpy as _np
        lens = [len(c) for c in chunks]
        self.offsets = _np.concatenate([[0], _np.cumsum(lens)])

    def resolve(self, index: int):
        import numpy as _np
        i = int(_np.searchsorted(self.offsets, index, side="right") - 1)
        return i, int(index - self.offsets[i])

    def resolve_many(self, indices):
        import numpy as _np
        idx = _np.asarray(indices, dtype=_np.int64)
        chunk = _np.searchsorted(self.offsets, idx, side="right") - 1
        return chunk, idx - self.offsets[chunk]


class Datum:
    """Variant over Scalar / Array / ChunkedArray / RecordBatch / Table
    (reference: datum.h:46). The python dispatch layer passes values
    directly; Datum exists for API parity and kind introspection."""

    SCALAR, ARRAY, CHUNKED_ARRAY, RECORD_BATCH, TABLE = (
        "scalar", "array", "chunked_array", "record_batch", "table")

    def __init__(self, value):
        from .array.array import Array as _Arr
        from .compute.registry import Scalar as _Sc
        if isinstance(value, _Sc):
            self.kind = self.SCALAR
        elif isinstance(value, _Arr):
            self.kind = self.ARRAY
        elif isinstance(value, ChunkedArray):
            self.kind = self.CHUNKED_ARRAY
        elif isinstance(value, RecordBatch):
            self.kind = self.RECORD_BATCH
        elif isinstance(value, Table):
            self.kind = self.TABLE
        else:
            from .compute.registry import Scalar as _S2
            value = _S2(value, None)
            self.kind = self.SCALAR
        self.value = value

    def is_scalar(self):
        return self.kind == self.SCALAR

    def is_array(self):
        return self.kind == self.ARRAY

    def __repr__(self):
        return f"Datum({self.kind}, {self.value!r})"


class RecordBatchReader:
    """Iterator of RecordBatches with a shared schema (reference:
    record_batch.h:334 RecordBatchReader; pyarrow.RecordBatchReader)."""

    def __init__(self, schema: Schema, batches_iter):
        self.schema = schema
        self._it = iter(batches_iter)

    @classmethod
    def from_batches(cls, schema: Schema, batches) -> "RecordBatchReader":
        return cls(schema, batches)

    @classmethod
    def from_stream(cls, data, schema: Optional[Schema] = None):
        """Wrap any object exporting __arrow_c_stream__."""
        if not hasattr(data, "__arrow_c_stream__"):
            raise TypeError("expected an object with __arrow_c_stream__")
        from .c_data import import_stream_capsule
        rdr = import_stream_capsule(data.__arrow_c_stream__())
        return rdr if isinstance(rdr, cls) else cls(rdr.schema, rdr)

    def __iter__(self):
        return self

    def __next__(self) -> RecordBatch:
        return self.read_next_batch()

    def read_next_batch(self) -> RecordBatch:
        nxt = next(self._it, None)
        if nxt is None:
            raise StopIteration
        return nxt

    def read_all(self) -> Table:
        batches = list(self._it)
        return Table.from_batches(batches, self.schema)

    def read_pandas(self):
        return self.read_all().to_pandas()

    def close(self):
        self._it = iter(())

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __arrow_c_stream__(self, requested_schema=None):
        from .c_data import stream_capsule, batch_to_struct_data
        batches = list(self._it)
        return stream_capsule(
            [batch_to_struct_data(b) for b in batches],
            Field("", T.struct(list(self.schema.fields))))
