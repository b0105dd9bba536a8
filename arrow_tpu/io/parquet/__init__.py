"""Parquet format support (reference: cpp/src/parquet/)."""

from .reader import ParquetFile, read_table  # noqa: F401
from .writer import ParquetWriter, write_table  # noqa: F401
from .metadata import (  # noqa: F401
    ColumnChunkMetaData, FileMetaData, ParquetDataset, ParquetSchema,
    RowGroupMetaData, SortingColumn, Statistics, filters_to_expression,
    read_metadata, read_pandas, read_schema, write_to_dataset,
)
