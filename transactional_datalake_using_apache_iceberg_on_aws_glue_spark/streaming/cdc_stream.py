"""Streaming CDC ingestion: the open-source equivalent of the
reference's Glue ``forEachBatch`` loop
(/root/reference/src/main/python/spark_sql_merge_into_iceberg.py:144-151).

Mapping (SURVEY §2.1 S2, §2.9):
- ``glueContext.forEachBatch(windowSize=...)``
    -> ``writeStream.foreachBatch(...).trigger(processingTime=...)``
- Glue checkpoint under TempDir           -> ``checkpointLocation`` option
- Kinesis ``LATEST`` / ``TRIM_HORIZON``   -> ``startingOffsets`` on Kafka;
  the file source used here always reads from the beginning, which is
  TRIM_HORIZON semantics.

Delivery: foreachBatch is at-least-once; the keyed merge is idempotent
under replay (T3), giving effective exactly-once — the same argument the
reference relies on, but here it is property-tested (tests/test_cdc.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..cdc.apply import apply_cdc_batch
from ..cdc.envelope import read_envelope_stream
from ..lake.table import ParquetLakeTable


def start_cdc_stream(
    spark: SparkSession,
    source_dir: str,
    table: ParquetLakeTable,
    checkpoint_dir: str,
    window_size: str = "100 seconds",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start the CDC stream (non-blocking). ``window_size`` keeps the
    reference's default trigger of 100 seconds (its ``--window_size``
    arg, spark_sql_merge_into_iceberg.py:49)."""
    stream = read_envelope_stream(spark, source_dir, max_files_per_trigger)
    return (
        stream.writeStream.foreachBatch(
            lambda batch_df, batch_id: apply_cdc_batch(batch_df, table, batch_id)
        )
        .trigger(processingTime=window_size)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def run_stream_once(
    spark: SparkSession,
    source_dir: str,
    table: ParquetLakeTable,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain everything currently in ``source_dir`` through the streaming
    path synchronously (availableNow trigger) — the test/bench harness
    entry point; production uses ``start_cdc_stream``."""
    stream = read_envelope_stream(spark, source_dir, max_files_per_trigger)
    q = (
        stream.writeStream.foreachBatch(
            lambda batch_df, batch_id: apply_cdc_batch(batch_df, table, batch_id)
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.awaitTermination()
