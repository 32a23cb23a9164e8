"""Batch + streaming source adapters.

The reference's only source is the Glue Kinesis connector
(/root/reference/src/main/python/spark_sql_merge_into_iceberg.py:73-83,
SURVEY §2.1 S1). Kinesis is AWS-proprietary connector territory; the
open equivalents with identical downstream semantics are:

- file JSON-lines stream (used by tests/bench — DMS `json-unformatted`
  is exactly one JSON doc per line);
- Kafka with `from_json` (the production path; `startingOffsets` maps
  the reference's LATEST -> latest, TRIM_HORIZON -> earliest);
- rate source for load generation.

Every adapter takes an explicit schema/DDL — schema inference is
banned outside exploration (deterministic plans, SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet_table(spark: SparkSession, path: str,
                       columns: list[str] | None = None) -> DataFrame:
    """Columnar batch scan; optional projection so pruning reaches the
    reader even for ad-hoc callers."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_json_lines(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType | str,
             header: bool = True, delimiter: str = ",") -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .csv(path)
    )


def stream_json_lines(spark: SparkSession, path: str, schema: T.StructType | str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)


def stream_kafka_envelopes(spark: SparkSession, bootstrap_servers: str, topic: str,
                           schema: T.StructType, starting: str = "earliest") -> DataFrame:
    """Kafka CDC source: value bytes -> from_json(schema). `starting`
    follows the reference's position arg (S1/T8): 'latest' == LATEST,
    'earliest' == TRIM_HORIZON. Requires the spark-sql-kafka package on
    the classpath (not in the test image — covered by unit tests only
    through the parse stage, `cdc.envelope.parse_envelope_bytes`)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("r")
    ).select("r.*")


def stream_rate_source(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Synthetic load source (replaces the reference's sleep-loop
    generators, gen_fake_*_data.py) — used for soak/throughput tests."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
