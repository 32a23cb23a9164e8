"""Cross-batch stateful streaming: state must survive micro-batch
boundaries and checkpointed restarts."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.streaming.stateful import (
    running_user_totals,
    streaming_first_seen,
)

EVENT_SCHEMA = "event_id long, ts_us long, user_id long, event_type string, value double"


def _drain(spark, src, build, ck, prep=None):
    out = []
    raw = spark.readStream.schema(EVENT_SCHEMA).json(src)
    stream = prep(raw) if prep else raw
    q = (
        build(stream)
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, _id: out.extend(tuple(r) for r in df.collect()))
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ck = str(tmp_path / "ck")

    def write(name, rows):
        with open(src / name, "w") as f:
            for i, (uid, val) in enumerate(rows):
                f.write(json.dumps({"event_id": i, "ts_us": 1_700_000_000_000_000 + i,
                                    "user_id": uid, "event_type": "x", "value": val}) + "\n")

    write("b1.json", [(1, 10.0), (1, 5.0), (2, 1.0)])
    out1 = _drain(spark, str(src), running_user_totals, ck)
    assert (1, 2, 15.0) in out1 and (2, 1, 1.0) in out1

    # second batch through the SAME checkpoint: state must carry over
    write("b2.json", [(1, 2.5), (3, 7.0)])
    out2 = _drain(spark, str(src), running_user_totals, ck)
    assert (1, 3, 17.5) in out2  # 2 prior events + 1 new
    assert (3, 1, 7.0) in out2
    assert not any(r[0] == 2 for r in out2)  # untouched key not re-emitted


def test_running_totals_batch_twin_matches_stream(spark, tmp_path):
    """The batch fallback equals the stream's final per-user state."""
    src = tmp_path / "src"
    src.mkdir()
    ck = str(tmp_path / "ck")
    rows = [(i % 4, float(i)) for i in range(40)]
    with open(src / "b.json", "w") as f:
        for i, (uid, val) in enumerate(rows):
            f.write(json.dumps({"event_id": i, "ts_us": 1_700_000_000_000_000 + i,
                                "user_id": uid, "event_type": "x", "value": val}) + "\n")
    stream_out = _drain(spark, str(src), running_user_totals, ck)
    final = {r[0]: (r[1], r[2]) for r in stream_out}
    batch_df = spark.createDataFrame(
        [(uid, val) for uid, val in rows], "user_id long, value double"
    )
    expected = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in running_user_totals(batch_df).collect()
    }
    assert final == expected


def test_streaming_first_seen_dedup(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ck = str(tmp_path / "ck")

    def write(name, rows):
        with open(src / name, "w") as f:
            for i, (fid, doc) in enumerate(rows):
                f.write(json.dumps({"event_id": doc, "ts_us": 0, "user_id": doc,
                                    "event_type": fid, "value": 0.0}) + "\n")

    def prep(raw):
        return raw.select(
            F.col("event_type").alias("fingerprint"), F.col("user_id").alias("doc_id")
        )

    write("b1.json", [("fpA", 10), ("fpA", 7), ("fpB", 3)])
    out1 = _drain(spark, str(src), streaming_first_seen, ck, prep=prep)
    assert set(out1) == {("fpA", 7), ("fpB", 3)}

    # fpA reappears in a later batch -> suppressed by state; fpC is new
    write("b2.json", [("fpA", 1), ("fpC", 99)])
    out2 = _drain(spark, str(src), streaming_first_seen, ck, prep=prep)
    assert set(out2) == {("fpC", 99)}
