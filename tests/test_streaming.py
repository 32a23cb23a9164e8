"""Streaming semantics: the batch run of each windowed operator is the
oracle for its streaming run (same logical plan, incremental execution);
plus watermark late-data drop behavior.

Append-mode subtlety: a window is only emitted once the watermark passes
its end, so after draining the real data we push a far-future sentinel
row through the same checkpoint to finalize the tail windows, then
exclude the sentinel's own window from the comparison.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.session import load_table
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.streaming.analytics import (
    session_aggregates,
    sliding_rates,
    tumbling_counts,
)

# ts rides as epoch-MICROS (long): Spark's JSON writer truncates
# timestamps to milliseconds, which would skew session boundaries
EVENT_SCHEMA = "event_id long, ts_us long, user_id long, event_type string, value double"
SENTINEL_US = 1_893_456_000_000_000  # 2030-01-01


@pytest.fixture()
def events_dir(spark, sf_dir, tmp_path):
    d = tmp_path / "in"
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        # ts is TIMESTAMP_NTZ from parquet; unix_micros needs TIMESTAMP
        # (session TZ is UTC, so the cast is value-preserving)
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "user_id", "event_type", "value"
    )
    ev.coalesce(4).write.mode("overwrite").json(str(d))
    return str(d)


def _drain(spark, src_dir, build, ckpt_dir):
    """Run the windowed query in append mode via foreachBatch (the memory
    sink cannot recover from a checkpoint; foreachBatch can)."""
    collected: list[tuple] = []
    raw = spark.readStream.schema(EVENT_SCHEMA).json(src_dir)
    stream = raw.withColumn("ts", F.timestamp_micros("ts_us")).drop("ts_us")
    q = (
        build(stream)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: collected.extend(tuple(r) for r in df.collect()))
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return collected


def _stream_all(spark, src_dir, build, ckpt_dir):
    """Drain real data, then a sentinel batch to finalize tail windows;
    accumulate appended rows across both runs."""
    rows = _drain(spark, src_dir, build, ckpt_dir)
    with open(f"{src_dir}/zz_sentinel.json", "w") as f:
        f.write(json.dumps({"event_id": -1, "ts_us": SENTINEL_US, "user_id": -1,
                            "event_type": "sentinel", "value": 0.0}) + "\n")
    rows += _drain(spark, src_dir, build, ckpt_dir)
    return sorted([r for r in rows if not _is_sentinel(r)], key=repr)


def _is_sentinel(row) -> bool:
    return any(getattr(v, "year", None) == 2030 for v in row) or "sentinel" in row or -1 in row


def _batch_rows(df):
    return sorted([tuple(r) for r in df.collect()], key=repr)


def test_tumbling_window_stream_matches_batch(spark, sf_dir, events_dir, tmp_path):
    expected = _batch_rows(tumbling_counts(load_table(spark, sf_dir, "events")))
    got = _stream_all(spark, events_dir, tumbling_counts, str(tmp_path / "ck1"))
    assert got == expected


def test_sliding_window_stream_matches_batch(spark, sf_dir, events_dir, tmp_path):
    expected = _batch_rows(sliding_rates(load_table(spark, sf_dir, "events")))
    got = _stream_all(spark, events_dir, sliding_rates, str(tmp_path / "ck2"))
    assert got == expected


def test_session_window_stream_matches_batch(spark, sf_dir, events_dir, tmp_path):
    expected = _batch_rows(session_aggregates(load_table(spark, sf_dir, "events")))
    got = _stream_all(spark, events_dir, session_aggregates, str(tmp_path / "ck3"))
    assert got == expected


def test_watermark_drops_late_rows(spark, tmp_path):
    """A row older than (max event time - watermark) arriving in a LATER
    micro-batch must be excluded from its (already finalized) window."""
    src = tmp_path / "late_src"
    src.mkdir()
    ck = str(tmp_path / "ck_late")

    def write_batch(name, rows):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def run():
        return _drain(
            spark,
            str(src),
            lambda s: tumbling_counts(s, window="10 minutes", watermark="10 minutes"),
            ck,
        )

    def us(h, m):  # 2024-01-01 h:m UTC in epoch micros
        return (1_704_067_200 + h * 3600 + m * 60) * 1_000_000

    all_rows = []
    write_batch("b1.json", [
        {"event_id": 1, "ts_us": us(0, 1), "user_id": 1, "event_type": "x", "value": 1.0},
        {"event_id": 2, "ts_us": us(0, 2), "user_id": 1, "event_type": "x", "value": 1.0},
    ])
    all_rows += run()
    write_batch("b2.json", [
        {"event_id": 3, "ts_us": us(2, 0), "user_id": 1, "event_type": "x", "value": 1.0},
    ])
    all_rows += run()
    write_batch("b3.json", [
        # 00:03 is far beyond the watermark now (max event time 02:00)
        {"event_id": 4, "ts_us": us(0, 3), "user_id": 1, "event_type": "x", "value": 1.0},
        {"event_id": 5, "ts_us": us(2, 1), "user_id": 1, "event_type": "x", "value": 1.0},
    ])
    all_rows += run()
    write_batch("b4.json", [
        {"event_id": 6, "ts_us": us(3, 0), "user_id": 1, "event_type": "x", "value": 1.0},
    ])
    all_rows += run()

    first_window = [
        r for r in all_rows if r[0].hour == 0 and r[0].minute == 0
    ]
    assert len(first_window) == 1
    assert first_window[0][2] == 2  # late event_id=4 dropped, not re-counted


def test_dedup_within_watermark_drops_redeliveries(spark, tmp_path):
    """At-least-once transport dedup: duplicate deliveries of the same
    (trans_id, txn) inside the watermark must reach the sink once; the
    batch twin (dropDuplicates) is the oracle for the surviving set."""
    import json
    import os

    from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.streaming.analytics import (
        dedup_within_watermark,
    )

    src = str(tmp_path / "in")
    os.makedirs(src)
    rows = [
        {"trans_id": i, "txn": t, "ts": f"2024-01-01 00:{m:02d}:00", "v": i * 10}
        for i, t, m in [
            (1, 100, 1), (1, 100, 2), (1, 100, 3),   # 2 redeliveries
            (2, 200, 2), (2, 200, 2),                # 1 redelivery
            (3, 300, 4),
        ]
    ]
    with open(os.path.join(src, "a.jsonl"), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    schema = "trans_id long, txn long, ts string, v long"
    stream = (
        spark.readStream.schema(schema).json(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = dedup_within_watermark(stream, ["trans_id", "txn"], "ts", "10 minutes")
    sink = str(tmp_path / "out")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink)
    assert got.count() == 3
    assert {r["trans_id"] for r in got.collect()} == {1, 2, 3}
    # batch twin: same operator on the same frame read as batch
    batch = (
        spark.read.schema(schema).json(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    twin = dedup_within_watermark(batch, ["trans_id", "txn"], "ts")
    assert twin.count() == 3
