"""Lake-table layer: the ACID-merge target the reference gets from
Iceberg-on-S3 (spark_sql_merge_into_iceberg.py:51-63,118-136), rebuilt
over partitioned parquet with snapshot-versioned manifest commits
(time travel, rollback, expire), COW/MOR merge modes, hidden
partitioning transforms, and manifest-stats scan planning."""

from .changefeed import ChangeFeed, CursorExpiredError
from .materialized import MaterializedRollup, StreamingRollupMaintainer
from .merge_sql import DuplicateKeyError, MergeSqlError, MergeSqlRunner
from .metadata import register_metadata_views
from .table import BranchDivergedError, CommitConflictError, ParquetLakeTable
from .transforms import Transform, bucket, days, hours, months, truncate

__all__ = [
    "BranchDivergedError",
    "ChangeFeed",
    "CursorExpiredError",
    "DuplicateKeyError",
    "MaterializedRollup",
    "StreamingRollupMaintainer",
    "MergeSqlError",
    "MergeSqlRunner",
    "CommitConflictError",
    "ParquetLakeTable",
    "register_metadata_views",
    "Transform",
    "bucket",
    "days",
    "hours",
    "months",
    "truncate",
]
