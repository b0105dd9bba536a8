"""Multi-file datasets: discovery, partitioning, pruned scans, writes.

Reference analogue: cpp/src/arrow/dataset/ — Dataset/Fragment
(dataset.h:361,156), Scanner (scanner.h:418), hive/directory Partitioning
(partition.h:67) with expression-based pruning via SimplifyWithGuarantee,
partitioned writes (dataset_writer.cc). Scans funnel into the same plan
executor as in-memory tables.
"""

from __future__ import annotations

import posixpath
import re
from typing import Dict, List, Optional, Union


from .acero import (Declaration, FilterNodeOptions, TableSourceNodeOptions,
                    field)
from .acero.expression import Expression, simplify_with_guarantee
from .array.array import array as make_array
from .fs import FileSelector, FileSystem, LocalFileSystem
from .table import RecordBatch, Table
from .types import Schema


class Partitioning:
    def parse(self, rel_path: str):
        """dir path -> ({name: value}, guarantee Expression or None)."""
        raise NotImplementedError

    def format(self, values: Dict[str, object]) -> str:
        raise NotImplementedError


class HivePartitioning(Partitioning):
    """key=value directory scheme (reference: partition.h HivePartitioning)."""

    def __init__(self, schema: Optional[Schema] = None):
        self.schema = schema

    def _coerce(self, name: str, raw: str):
        if self.schema is not None:
            idx = self.schema.get_field_index(name)
            if idx >= 0:
                t = self.schema.fields[idx].type
                if t.is_integer:
                    return int(raw)
                if t.is_floating:
                    return float(raw)
                return raw
        if re.fullmatch(r"-?\d+", raw):
            return int(raw)
        return raw

    def parse(self, rel_path: str):
        values: Dict[str, object] = {}
        guarantee = None
        for part in rel_path.split("/"):
            if "=" not in part:
                continue
            k, v = part.split("=", 1)
            val = self._coerce(k, v)
            values[k] = val
            term = field(k) == val
            guarantee = term if guarantee is None else \
                Expression.call("and_kleene", guarantee, term)
        return values, guarantee

    def format(self, values: Dict[str, object]) -> str:
        return "/".join(f"{k}={v}" for k, v in values.items())


class DirectoryPartitioning(Partitioning):
    """Positional directory scheme: /<v1>/<v2>/ mapped to schema fields."""

    def __init__(self, schema: Schema):
        self.schema = schema

    def parse(self, rel_path: str):
        parts = [p for p in rel_path.split("/") if p]
        values: Dict[str, object] = {}
        guarantee = None
        for f, raw in zip(self.schema.fields, parts):
            val = int(raw) if f.type.is_integer else raw
            values[f.name] = val
            term = field(f.name) == val
            guarantee = term if guarantee is None else \
                Expression.call("and_kleene", guarantee, term)
        return values, guarantee

    def format(self, values: Dict[str, object]) -> str:
        return "/".join(str(values[f.name]) for f in self.schema.fields)


def partitioning(schema: Optional[Schema] = None,
                 flavor: Optional[str] = None) -> Partitioning:
    if flavor == "hive":
        return HivePartitioning(schema)
    if schema is None:
        raise ValueError("directory partitioning needs a schema")
    return DirectoryPartitioning(schema)


class FileFormat:
    name = "?"

    def read(self, fs: FileSystem, path: str,
             columns: Optional[List[str]] = None) -> Table:
        raise NotImplementedError

    def write(self, tbl: Table, fs: FileSystem, path: str):
        raise NotImplementedError

    @property
    def default_extname(self) -> str:
        raise NotImplementedError


class ParquetFileFormat(FileFormat):
    name = "parquet"
    default_extname = "parquet"

    def read(self, fs, path, columns=None):
        from .io import parquet as pq
        with fs.open_input_stream(path) as f:
            return pq.ParquetFile(f.read()).read(columns)

    def write(self, tbl, fs, path):
        from .io import parquet as pq
        with fs.open_output_stream(path) as f:
            pq.write_table(tbl, f)


class IpcFileFormat(FileFormat):
    name = "ipc"
    default_extname = "arrow"

    def read(self, fs, path, columns=None):
        from . import ipc
        with fs.open_input_stream(path) as f:
            t = ipc.open_file(f.read()).read_all()
        return t.select(columns) if columns else t

    def write(self, tbl, fs, path):
        from . import ipc
        with fs.open_output_stream(path) as f:
            with ipc.new_file(f, tbl.schema) as w:
                w.write_table(tbl)


class CsvFileFormat(FileFormat):
    name = "csv"
    default_extname = "csv"

    def read(self, fs, path, columns=None):
        from .io import csv as atcsv
        with fs.open_input_stream(path) as f:
            t = atcsv.read_csv(f.read())
        return t.select(columns) if columns else t

    def write(self, tbl, fs, path):
        from .io import csv as atcsv
        import io as _io
        buf = _io.StringIO()
        atcsv.write_csv(tbl, buf)
        with fs.open_output_stream(path) as f:
            f.write(buf.getvalue().encode())


_FORMATS = {"parquet": ParquetFileFormat, "ipc": IpcFileFormat,
            "arrow": IpcFileFormat, "feather": IpcFileFormat,
            "csv": CsvFileFormat}


class FileFragment:
    """One file + its partition guarantee (reference: dataset.h:156)."""

    def __init__(self, fs: FileSystem, path: str, format: FileFormat,
                 partition_values: Dict[str, object],
                 partition_expression: Optional[Expression]):
        self.fs = fs
        self.path = path
        self.format = format
        self.partition_values = partition_values
        self.partition_expression = partition_expression

    def to_table(self, columns: Optional[List[str]] = None) -> Table:
        file_cols = None
        if columns is not None:
            file_cols = [c for c in columns
                         if c not in self.partition_values]
        tbl = self.format.read(self.fs, self.path, file_cols)
        # attach partition columns
        part_cols = (self.partition_values if columns is None else
                     {k: v for k, v in self.partition_values.items()
                      if k in columns})
        if part_cols:
            n = tbl.num_rows
            arrays = [c.combine() for c in tbl.columns]
            names = list(tbl.column_names)
            for k, v in part_cols.items():
                arrays.append(make_array([v] * n))
                names.append(k)
            tbl = Table.from_arrays(arrays, names)
        if columns is not None:
            tbl = tbl.select([c for c in columns
                              if c in tbl.column_names])
        return tbl

    def __repr__(self):
        return f"FileFragment({self.path!r})"


class Dataset:
    def __init__(self, fragments: List[FileFragment], schema: Schema):
        self.fragments = fragments
        self._schema = schema

    @property
    def schema(self) -> Schema:
        return self._schema

    @schema.setter
    def schema(self, value: Schema):
        self._schema = value

    def get_fragments(self, filter: Optional[Expression] = None):
        for frag in self.fragments:
            if filter is not None and frag.partition_expression is not None:
                simplified = simplify_with_guarantee(
                    filter, frag.partition_expression)
                if simplified.kind == Expression.KIND_LITERAL and \
                        simplified.value is False:
                    continue  # pruned
            yield frag

    def to_table(self, columns: Optional[List[str]] = None,
                 filter: Optional[Expression] = None,
                 fragment_readahead: Optional[int] = None,
                 use_threads: bool = True) -> Table:
        """Scan all fragments. Fragment IO runs on a thread pool with
        bounded readahead (reference: dataset/scanner.h:90
        fragment_readahead + the IO-executor readahead generators in
        util/async_generator.h; pool size via ARROW_IO_THREADS)."""
        import os as _os
        frags = list(self.get_fragments(filter))
        if fragment_readahead is None:
            fragment_readahead = int(_os.environ.get(
                "ARROW_TPU_FRAGMENT_READAHEAD", "4"))

        def load(frag):
            tbl = frag.to_table(columns)
            if filter is not None:
                residual = filter if frag.partition_expression is None \
                    else simplify_with_guarantee(
                        filter, frag.partition_expression)
                if not (residual.kind == Expression.KIND_LITERAL
                        and residual.value is True):
                    tbl = Declaration.from_sequence([
                        Declaration("table_source",
                                    TableSourceNodeOptions(tbl)),
                        Declaration("filter",
                                    FilterNodeOptions(residual)),
                    ]).to_table()
            return tbl

        tables: List[Table] = []
        if use_threads and fragment_readahead > 1 and len(frags) > 1:
            from concurrent.futures import ThreadPoolExecutor
            workers = min(fragment_readahead,
                          int(_os.environ.get("ARROW_IO_THREADS", "8")),
                          len(frags))
            # map() preserves fragment order while reading ahead
            with ThreadPoolExecutor(max_workers=workers) as pool:
                tables = list(pool.map(load, frags))
        else:
            tables = [load(f) for f in frags]

        batches: List[RecordBatch] = []
        schema = None
        for tbl in tables:
            schema = tbl.schema
            batches.extend(tbl.to_batches())
        if schema is None:
            raise ValueError("no fragments matched")
        return Table.from_batches(batches, schema)

    def scanner(self, columns=None, filter=None):
        return Scanner(self, columns, filter)

    def head(self, num_rows: int, columns=None, filter=None) -> Table:
        return self.to_table(columns=columns,
                             filter=filter).slice(0, num_rows)

    def count_rows(self, filter=None) -> int:
        return self.to_table(filter=filter).num_rows

    # -- pyarrow.dataset Dataset parity ----------------------------------
    def to_batches(self, columns=None, filter=None, **kwargs):
        return self.to_table(columns=columns,
                             filter=filter).to_batches()

    def take(self, indices, columns=None, filter=None) -> Table:
        return self.to_table(columns=columns, filter=filter).take(
            indices)

    def filter(self, expression) -> "Dataset":
        """Dataset view with an attached filter (dataset.h
        Dataset::filter)."""
        out = _FilteredDataset(self.fragments, self.schema, expression)
        return out

    def sort_by(self, sorting, **kwargs) -> "Dataset":
        from .dataset import InMemoryDataset as _IMD
        return _IMD(self.to_table().sort_by(sorting, **kwargs))

    def join(self, right_dataset, keys, right_keys=None,
             join_type="left outer", left_suffix=None, right_suffix=None,
             coalesce_keys=True, use_threads=True) -> Table:
        right = right_dataset.to_table() if isinstance(
            right_dataset, Dataset) else right_dataset
        return self.to_table().join(
            right, keys, right_keys, join_type,
            left_suffix or "", right_suffix or "", coalesce_keys)

    def join_asof(self, right_dataset, on, by, tolerance, right_on=None,
                  right_by=None) -> Table:
        right = right_dataset.to_table() if isinstance(
            right_dataset, Dataset) else right_dataset
        return self.to_table().join_asof(right, on, by, tolerance,
                                         right_on, right_by)

    def replace_schema(self, schema: Schema) -> "Dataset":
        return Dataset(self.fragments, schema)

    @property
    def partition_expression(self):
        from .acero.expression import scalar as _scalar
        return _scalar(True)


class _FilteredDataset(Dataset):
    def __init__(self, fragments, schema, expression):
        super().__init__(fragments, schema)
        self._filter = expression

    def to_table(self, columns=None, filter=None, **kwargs) -> Table:
        from .acero.expression import Expression as _E
        combined = self._filter
        if filter is not None:
            combined = _E.call("and_kleene", combined, filter)
        return super().to_table(columns=columns, filter=combined,
                                **kwargs)


class Scanner:
    def __init__(self, dataset: Dataset, columns=None, filter=None):
        self.dataset = dataset
        self.columns = columns
        self.filter = filter

    def to_table(self) -> Table:
        return self.dataset.to_table(self.columns, self.filter)

    def to_batches(self):
        return self.to_table().to_batches()

    def head(self, n: int) -> Table:
        return self.to_table().slice(0, n)

    def count_rows(self) -> int:
        return self.to_table().num_rows

    # -- pyarrow.dataset Scanner parity -----------------------------------
    @classmethod
    def from_dataset(cls, dataset, columns=None, filter=None,
                     **kwargs) -> "Scanner":
        return cls(dataset, columns, filter)

    @classmethod
    def from_fragment(cls, fragment, schema=None, columns=None,
                      filter=None, **kwargs) -> "Scanner":
        ds = Dataset([fragment], schema or Schema([]))
        return cls(ds, columns, filter)

    @classmethod
    def from_batches(cls, source, schema=None, columns=None,
                     filter=None, **kwargs) -> "Scanner":
        batches = list(source)
        tbl = Table.from_batches(batches, schema)
        return cls(InMemoryDataset(tbl), columns, filter)

    @property
    def dataset_schema(self) -> Schema:
        return self.dataset.schema

    @property
    def projected_schema(self) -> Schema:
        if self.columns is None:
            return self.dataset.schema
        return Schema([f for f in self.dataset.schema.fields
                       if f.name in set(self.columns)])

    def scan_batches(self):
        for frag in self.dataset.get_fragments(self.filter):
            tbl = frag.to_table(self.columns)
            for rb in tbl.to_batches():
                yield TaggedRecordBatch(rb, frag)

    def take(self, indices) -> Table:
        return self.to_table().take(indices)

    def to_reader(self):
        tbl = self.to_table()
        return tbl.to_reader()


def dataset(source, format: Union[str, FileFormat] = "parquet",
            partitioning: Optional[Partitioning] = None,
            filesystem: Optional[FileSystem] = None) -> Dataset:
    fs = filesystem or LocalFileSystem()
    fmt = _FORMATS[format]() if isinstance(format, str) else format

    if isinstance(source, (list, tuple)):
        frags = [FileFragment(fs, p, fmt, {}, None) for p in source]
    else:
        infos = fs.get_file_info(FileSelector(source, recursive=True))
        frags = []
        for info in infos:
            if not info.is_file:
                continue
            rel = posixpath.relpath(info.path, source)
            rel_dir = posixpath.dirname(rel)
            values, guarantee = ({}, None)
            if partitioning is not None and rel_dir:
                values, guarantee = partitioning.parse(rel_dir)
            frags.append(FileFragment(fs, info.path, fmt, values,
                                      guarantee))
    if not frags:
        raise ValueError(f"no files found in {source!r}")
    schema = frags[0].to_table().schema
    return Dataset(frags, schema)


def write_dataset(data: Union[Table, RecordBatch], base_dir: str,
                  format: Union[str, FileFormat] = "parquet",
                  partitioning: Optional[Partitioning] = None,
                  partitioning_flavor: Optional[str] = None,
                  filesystem: Optional[FileSystem] = None,
                  basename_template: str = "part-{i}.{ext}",
                  existing_data_behavior: str = "overwrite_or_ignore"):
    """Partitioned write (reference: dataset/dataset_writer.cc)."""
    fs = filesystem or LocalFileSystem()
    fmt = _FORMATS[format]() if isinstance(format, str) else format
    if isinstance(data, RecordBatch):
        data = Table.from_batches([data])
    if isinstance(partitioning, (list, tuple)):
        part_schema = Schema([data.schema.field(n)
                              for n in partitioning])
        partitioning = (HivePartitioning(part_schema)
                        if partitioning_flavor == "hive"
                        else DirectoryPartitioning(part_schema))

    fs.create_dir(base_dir)
    if partitioning is None:
        name = basename_template.format(i=0, ext=fmt.default_extname)
        fmt.write(data, fs, posixpath.join(base_dir, name))
        return

    part_names = [f.name for f in partitioning.schema.fields]
    rest = [n for n in data.column_names if n not in part_names]
    # group rows by partition values (host-side)
    cols = {n: data.column(n).to_pylist() for n in part_names}
    n = data.num_rows
    groups: Dict[tuple, List[int]] = {}
    for i in range(n):
        key = tuple(cols[k][i] for k in part_names)
        groups.setdefault(key, []).append(i)
    pyd = data.to_pydict()
    for gi, (key, idxs) in enumerate(sorted(groups.items(),
                                            key=lambda kv: str(kv[0]))):
        values = dict(zip(part_names, key))
        sub = Table.from_pydict(
            {nm: [pyd[nm][i] for i in idxs] for nm in rest},
            Schema([data.schema.field(nm) for nm in rest]))
        d = posixpath.join(base_dir, partitioning.format(values))
        fs.create_dir(d)
        name = basename_template.format(i=0, ext=fmt.default_extname)
        fmt.write(sub, fs, posixpath.join(d, name))


class OrcFileFormat(FileFormat):
    """ORC fragments (reference: dataset/file_orc.h); both directions
    use the native arrow_tpu.orc implementation."""
    name = "orc"
    default_extname = "orc"

    def read(self, fs, path, columns=None):
        from .io import orc
        with fs.open_input_stream(path) as f:
            return orc.read_table(f.read(), columns)

    def write(self, tbl, fs, path):
        from .io import orc
        with fs.open_output_stream(path) as f:
            orc.write_table(tbl, f)


class FeatherFileFormat(IpcFileFormat):
    """Feather V2 == the IPC file format (ipc/feather.h)."""
    name = "feather"
    default_extname = "feather"


class JsonFileFormat(FileFormat):
    """Newline-delimited JSON fragments (dataset/file_json.h)."""
    name = "json"
    default_extname = "json"

    def read(self, fs, path, columns=None):
        from .io import json as atjson
        with fs.open_input_stream(path) as f:
            t = atjson.read_json(f.read())
        return t.select(columns) if columns else t


_FORMATS["orc"] = OrcFileFormat
_FORMATS["json"] = JsonFileFormat
_FORMATS["feather"] = FeatherFileFormat


class InMemoryDataset(Dataset):
    """Dataset over in-memory tables (dataset/dataset.h InMemoryDataset)."""

    def __init__(self, source, schema: Optional[Schema] = None):
        if isinstance(source, (Table, RecordBatch)):
            tables = [source if isinstance(source, Table)
                      else Table.from_batches([source])]
        else:
            tables = [t if isinstance(t, Table)
                      else Table.from_batches([t]) for t in source]
        self._tables = tables
        frags = [_TableFragment(t) for t in tables]
        Dataset.__init__(self, frags,
                         schema or tables[0].schema)


class _TableFragment:
    """Fragment backed by a materialized table."""

    def __init__(self, tbl: Table):
        self._tbl = tbl
        self.partition_expression = None
        self.path = "<memory>"

    def to_table(self, columns=None):
        return self._tbl.select(columns) if columns else self._tbl


class FileSystemDataset(Dataset):
    """Dataset over explicit file fragments (dataset/dataset.h:361)."""

    @classmethod
    def from_paths(cls, paths, schema=None, format="parquet",
                   filesystem=None):
        fs = filesystem or LocalFileSystem()
        fmt = _FORMATS[format]() if isinstance(format, str) else format
        frags = [FileFragment(fs, p, fmt, {}, None) for p in paths]
        return cls(frags, schema or frags[0].to_table().schema)

    @property
    def files(self):
        return [f.path for f in self.fragments]


class UnionDataset(Dataset):
    """Union of child datasets (dataset/dataset.h UnionDataset)."""

    def __init__(self, schema: Optional[Schema], children):
        frags = [f for c in children for f in c.fragments]
        Dataset.__init__(self, frags, schema or children[0].schema)
        self.children = list(children)


class TaggedRecordBatch:
    """A batch tagged with its originating fragment
    (dataset/scanner.h TaggedRecordBatch)."""

    def __init__(self, record_batch, fragment):
        self.record_batch = record_batch
        self.fragment = fragment


def get_partition_keys(partition_expression) -> dict:
    """Extract key==value pairs from a partition guarantee
    (pyarrow.dataset.get_partition_keys)."""
    out = {}
    if partition_expression is None:
        return out

    def walk(e):
        if e.kind == Expression.KIND_CALL:
            if e.fn == "equal":
                lhs, rhs = e.args
                if lhs.kind == Expression.KIND_FIELD and \
                        rhs.kind == Expression.KIND_LITERAL:
                    out[lhs.name] = rhs.value
            elif e.fn in ("and_kleene", "and"):
                for a in e.args:
                    walk(a)
    walk(partition_expression)
    return out


# --- pyarrow.dataset name parity (python/pyarrow/dataset.py surface) --------

Fragment = FileFragment
ParquetFileFragment = FileFragment


class FilenamePartitioning(Partitioning):
    """Partition keys embedded in file names: name_key1_key2.ext
    (dataset/partition.h FilenamePartitioning)."""

    def __init__(self, schema: Schema):
        self.schema = schema

    def parse(self, path: str) -> dict:
        import os
        stem = os.path.basename(path).split(".")[0]
        parts = stem.split("_")[1:]
        out = {}
        for f, raw in zip(self.schema.fields, parts):
            if f.type.is_integer:
                out[f.name] = int(raw)
            elif f.type.is_floating:
                out[f.name] = float(raw)
            else:
                out[f.name] = raw
        return out

    def format_path(self, values: dict) -> str:
        return "_".join(str(values[f.name])
                        for f in self.schema.fields)


class PartitioningFactory:
    """Deferred partitioning discovery (dataset/partition.h
    PartitioningFactory): resolves the key schema from paths."""

    def __init__(self, flavor: str, field_names):
        self.flavor = flavor
        self.field_names = list(field_names or [])

    def finish(self, schema: Optional[Schema] = None) -> Partitioning:
        from . import types as _T
        from .types import Field as _Field
        sch = schema or Schema([_Field(n, _T.string(), True)
                                for n in self.field_names])
        if self.flavor == "hive":
            return HivePartitioning(sch)
        if self.flavor == "filename":
            return FilenamePartitioning(sch)
        return DirectoryPartitioning(sch)


class FragmentScanOptions:
    """Per-format scan knobs (dataset/dataset.h FragmentScanOptions)."""

    type_name = ""


class CsvFragmentScanOptions(FragmentScanOptions):
    type_name = "csv"

    def __init__(self, convert_options=None, read_options=None,
                 parse_options=None):
        self.convert_options = convert_options
        self.read_options = read_options
        self.parse_options = parse_options


class JsonFragmentScanOptions(FragmentScanOptions):
    type_name = "json"

    def __init__(self, parse_options=None, read_options=None):
        self.parse_options = parse_options
        self.read_options = read_options


class ParquetFragmentScanOptions(FragmentScanOptions):
    type_name = "parquet"

    def __init__(self, use_buffered_stream=False, buffer_size=8192,
                 pre_buffer=True, cache_options=None,
                 thrift_string_size_limit=None,
                 thrift_container_size_limit=None,
                 decryption_config=None,
                 decryption_properties=None,
                 page_checksum_verification=False):
        self.use_buffered_stream = use_buffered_stream
        self.buffer_size = buffer_size
        self.pre_buffer = pre_buffer
        self.cache_options = cache_options
        self.decryption_config = decryption_config
        self.decryption_properties = decryption_properties
        self.page_checksum_verification = page_checksum_verification


class ParquetReadOptions:
    def __init__(self, dictionary_columns=None, coerce_int96_timestamp_unit=None):
        self.dictionary_columns = set(dictionary_columns or ())
        self.coerce_int96_timestamp_unit = coerce_int96_timestamp_unit


class FileWriteOptions:
    """Per-format write knobs (dataset/file_base.h FileWriteOptions)."""

    def __init__(self, **kwargs):
        self.options = kwargs


class ParquetFileWriteOptions(FileWriteOptions):
    pass


class IpcFileWriteOptions(FileWriteOptions):
    pass


class ParquetEncryptionConfig:
    """Dataset-level encryption config (dataset/parquet_encryption_
    config.h): crypto factory + kms config + encryption config."""

    def __init__(self, crypto_factory, kms_connection_config,
                 encryption_config):
        self.crypto_factory = crypto_factory
        self.kms_connection_config = kms_connection_config
        self.encryption_config = encryption_config


class ParquetDecryptionConfig:
    def __init__(self, crypto_factory, kms_connection_config,
                 decryption_config):
        self.crypto_factory = crypto_factory
        self.kms_connection_config = kms_connection_config
        self.decryption_config = decryption_config


class RowGroupInfo:
    """Row-group metadata view on a parquet fragment."""

    def __init__(self, id, metadata=None, schema=None):
        self.id = id
        self.metadata = metadata
        self.schema = schema


class WrittenFile:
    """Result descriptor passed to file_visitor during writes."""

    def __init__(self, path, metadata=None, size=0):
        self.path = path
        self.metadata = metadata
        self.size = size


class FileSystemFactoryOptions:
    def __init__(self, partition_base_dir="", partitioning=None,
                 exclude_invalid_files=True,
                 selector_ignore_prefixes=None):
        self.partition_base_dir = partition_base_dir
        self.partitioning = partitioning
        self.exclude_invalid_files = exclude_invalid_files
        self.selector_ignore_prefixes = list(selector_ignore_prefixes
                                             or (".", "_"))


class ParquetFactoryOptions:
    def __init__(self, partition_base_dir="", partitioning=None,
                 validate_column_chunk_paths=False):
        self.partition_base_dir = partition_base_dir
        self.partitioning = partitioning
        self.validate_column_chunk_paths = validate_column_chunk_paths


class DatasetFactory:
    """Deferred dataset construction (dataset/discovery.h)."""

    def __init__(self, source, format="parquet", partitioning=None,
                 filesystem=None):
        self._source = source
        self._format = format
        self._partitioning = partitioning
        self._filesystem = filesystem

    def inspect(self) -> Schema:
        return self.finish().schema

    def finish(self, schema: Optional[Schema] = None) -> Dataset:
        return dataset(self._source, format=self._format,
                       partitioning=self._partitioning,
                       filesystem=self._filesystem)


class FileSystemDatasetFactory(DatasetFactory):
    pass


class ParquetDatasetFactory(DatasetFactory):
    pass


class UnionDatasetFactory(DatasetFactory):
    def __init__(self, factories):
        self._factories = list(factories)

    def finish(self, schema: Optional[Schema] = None) -> Dataset:
        return UnionDataset([f.finish() for f in self._factories])


def parquet_dataset(metadata_path, schema=None, filesystem=None,
                    format=None, partitioning=None,
                    partition_base_dir=None):
    """Dataset from a _metadata sidecar's directory
    (pyarrow.dataset.parquet_dataset)."""
    import os
    base = os.path.dirname(str(metadata_path))
    return dataset(base, format="parquet", partitioning=partitioning,
                   filesystem=filesystem)


def scalar(value):
    """Expression literal (pyarrow.dataset.scalar)."""
    from .acero.expression import scalar as _scalar
    return _scalar(value)
