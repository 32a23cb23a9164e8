"""Multi-table CDC routing.

A DMS replication task streams EVERY table of the source database into
one Kinesis stream; the reference job hardcodes a single target table
(its envelopes carry ``metadata.table-name`` = 'retail_trans',
/root/reference/src/utils/gen_fake_cdc_data.py:33). Real deployments
need per-table routing inside one micro-batch — this module adds it.

Design: one pass tags each envelope with its route key; per table we
filter + apply. The batch is persisted once, so N tables cost N cheap
filtered scans of the cached batch, not N stream re-reads; each table's
merge stays the usual single shuffle. Unroutable tables dead-letter.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .apply import apply_cdc_batch
from ..lake.table import ParquetLakeTable

TABLE_NAME_COL = "metadata.`table-name`"


def route_cdc_batch(
    envelopes: DataFrame,
    tables: Mapping[str, ParquetLakeTable],
    batch_id: int | None = None,
    unknown_table_dir: str | None = None,
) -> dict[str, int]:
    """Apply one mixed-table micro-batch to its per-table lake targets.

    Returns {table_name: rows_routed}. Envelopes whose ``table-name``
    has no registered target are appended to ``unknown_table_dir``
    (observability: an unrouted table is a config gap, not noise).
    """
    if envelopes.isEmpty():
        return {}
    envelopes = envelopes.persist()
    try:
        routed: dict[str, int] = {}
        for name, table in tables.items():
            part = envelopes.filter(F.col(TABLE_NAME_COL) == name)
            n = part.count()
            if n:
                apply_cdc_batch(part, table, batch_id)
            routed[name] = n
        if unknown_table_dir:
            unknown = envelopes.filter(
                ~F.coalesce(F.col(TABLE_NAME_COL), F.lit("")).isin(*tables.keys())
            )
            if not unknown.isEmpty():
                (
                    unknown.select(
                        F.col(TABLE_NAME_COL).alias("table_name"),
                        F.to_json(F.struct("data", "metadata")).alias("raw"),
                        F.lit(batch_id).cast("long").alias("batch_id"),
                    )
                    .write.mode("append")
                    .parquet(unknown_table_dir)
                )
        return routed
    finally:
        envelopes.unpersist()
