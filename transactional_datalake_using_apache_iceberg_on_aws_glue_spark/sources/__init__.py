"""Source adapters (SURVEY §2.1): every ingestion path the engine
supports, batch and streaming, with explicit schemas (never per-batch
inference — SURVEY §1.3)."""

from .lake_stream import (
    LakeChangeDataSource,
    OffsetExpiredError,
    move_cap_events,
    register_lake_stream,
)
from .readers import (
    read_csv,
    read_json_lines,
    read_parquet_table,
    stream_json_lines,
    stream_kafka_envelopes,
    stream_rate_source,
)

__all__ = [
    "LakeChangeDataSource",
    "OffsetExpiredError",
    "move_cap_events",
    "register_lake_stream",
    "read_parquet_table",
    "read_json_lines",
    "read_csv",
    "stream_json_lines",
    "stream_kafka_envelopes",
    "stream_rate_source",
]
