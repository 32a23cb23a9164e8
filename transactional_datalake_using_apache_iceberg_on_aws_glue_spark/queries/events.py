"""Event-stream analytics (SURVEY §2.9 batch twins + §2.8 JSON scalars).

The `events` fixture is the batch stand-in for the reference's Kinesis
stream; these queries are the event-time operations the reference lacks
(tumbling windows, sessionization, lag/lead analytics) plus JSON
extraction (`props` is a JSON string column).

Timestamp discipline (SURVEY §7 hard-part 4): events.ts is ns-precision
in parquet; the Spark loader truncates to µs. Oracle SQL casts through
``ts::TIMESTAMP`` (same truncation) so both engines see identical µs
values. Queries avoid emitting raw sub-second timestamps where possible
anyway (date_trunc / epoch seconds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_table
from . import register


@register(
    "events_json_daily_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts::TIMESTAMP) AS TIMESTAMP) AS day, event_type,
           count(*) AS n, round(sum(value), 2) AS total_value,
           CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS DOUBLE) > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_k_n,
           round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1-day event-time window as a batch groupBy on "
        "date_trunc — in streaming this is F.window(ts, '1 day') with a "
        "watermark; semantics identical (T6) — enriched with JSON scalar "
        "extraction from the props column (F.get_json_object, the "
        "new-engine equivalent of the envelope JSON decode, S1/F-json): "
        "a conditional count over the extracted value plus its NULL-"
        "skipping average. (Registry consolidation r4: former "
        "events_daily_rollup + events_json_props, merged to make room "
        "for TPC-H q11/q12/q16/q20 under the driver's 50-row window.)",
    tags=("events", "window-agg", "json"),
)
def events_json_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("double")
    return (
        ev.withColumn("k", k)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).cast("bigint")
            .alias("high_k_n"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
    )


@register(
    "events_sessionization",
    oracle="""
    WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events),
    flagged AS (
      SELECT user_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_start
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(sum(is_start) AS BIGINT) AS n_sessions, count(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
    doc="Sessionization: lag() gap detection with a 30-min threshold "
        "(SURVEY fixture matrix: events -> session windows). One shuffle "
        "on user_id; at scale identical to streaming session_window state "
        "layout.",
    tags=("events", "window"),
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # µs-precision gap on both engines (second-truncation would disagree
    # with the oracle on gaps straddling the 1800 s boundary).
    # ts arrives as TIMESTAMP_NTZ from parquet (no UTC-adjustment flag);
    # unix_micros requires TIMESTAMP, and with the session TZ pinned to
    # UTC the cast is value-preserving.
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ts_us - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    gap_threshold_us = 1800 * 1_000_000
    return (
        ev.withColumn(
            "is_start",
            F.when(F.lag("ts").over(w).isNull() | (gap > gap_threshold_us), 1).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("is_start").alias("n_sessions"), F.count("*").alias("n_events"))
    )


@register(
    "events_asof_signup",
    oracle="""
    WITH e AS (SELECT event_id, user_id, event_type, ts::TIMESTAMP AS ts FROM events)
    SELECT p.event_id,
           p.user_id,
           (SELECT s.event_id FROM e s
            WHERE s.user_id = p.user_id AND s.event_type = 'signup'
              AND s.ts <= p.ts
            ORDER BY s.ts DESC, s.event_id DESC LIMIT 1) AS signup_event_id
    FROM e p WHERE p.event_type = 'purchase'
    """,
    doc="As-of join: each purchase matched to the user's most recent "
        "signup at-or-before it. Implemented via the union+last_value "
        "pattern (operators.asof) — single shuffle, no range explosion; "
        "oracle uses an equivalent correlated top-1 subquery.",
    tags=("events", "asof"),
)
def events_asof_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    right = (
        ev.filter(F.col("event_type") == "signup")
        .select(F.col("event_id").alias("signup_event_id"), "user_id", "ts")
    )
    out = asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        right_seq="signup_event_id", left_seq="event_id",
    )
    return out.select("event_id", "user_id", "signup_event_id")
