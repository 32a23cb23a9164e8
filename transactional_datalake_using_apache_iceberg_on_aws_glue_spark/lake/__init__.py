"""Lake-table layer: the ACID-merge target the reference gets from
Iceberg-on-S3 (spark_sql_merge_into_iceberg.py:51-63,118-136), rebuilt
over partitioned parquet with snapshot-versioned manifest commits
(time travel, rollback, expire) and COW/MOR merge modes."""

from .table import CommitConflictError, ParquetLakeTable

__all__ = ["CommitConflictError", "ParquetLakeTable"]
