"""Parquet format support (reference: cpp/src/parquet/)."""

from .reader import ParquetFile, read_table  # noqa: F401
from .writer import ParquetWriter, write_table  # noqa: F401
