"""Lake-table layer: the ACID-merge target the reference gets from
Iceberg-on-S3 (spark_sql_merge_into_iceberg.py:51-63,118-136), rebuilt
over partitioned parquet with dynamic partition overwrite."""

from .table import ParquetLakeTable

__all__ = ["ParquetLakeTable"]
