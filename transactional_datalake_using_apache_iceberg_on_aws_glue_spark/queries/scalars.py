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
    "scalar_string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                          AS name_upper,
           substr(c_name, 1, 8)                   AS name_prefix,
           CAST(length(c_name) AS INT)            AS name_len,
           replace(c_name, '#', '-')              AS name_dashed,
           concat(c_mktsegment, ':', c_name)      AS segment_tag,
           CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END AS has_one,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key
    FROM customer WHERE c_custkey <= 50
    """,
    doc="String-function coverage: upper/substr/length/replace/concat/"
        "LIKE/lpad — all codegen'd, no UDFs.",
    tags=("scalar",),
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 50)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("segment_tag"),
        F.when(F.col("c_name").like("%1%"), 1).otherwise(0).alias("has_one"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
    )


@register(
    "scalar_date_functions",
    oracle="""
    SELECT EXTRACT(year FROM o_orderdate)::INT    AS yr,
           EXTRACT(month FROM o_orderdate)::INT   AS mo,
           count(*)                               AS n,
           round(sum(o_totalprice), 2)            AS total,
           min(CAST(o_orderdate AS DATE))         AS first_day,
           max(dayofweek(o_orderdate))::INT       AS max_dow
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY 1, 2
    """,
    doc="Date-function coverage: extract year/month, date cast, "
        "day-of-week, with a pushed range predicate.",
    tags=("scalar",),
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    # DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1 -> shift
    return o.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.min(F.to_date("o_orderdate")).alias("first_day"),
        F.max(F.dayofweek("o_orderdate") - 1).alias("max_dow"),
    )


@register(
    "scalar_math_functions",
    oracle="""
    SELECT l_linenumber,
           round(avg(sqrt(l_extendedprice)), 4)           AS avg_sqrt_price,
           round(avg(ln(l_extendedprice)), 4)             AS avg_ln_price,
           round(avg(abs(l_discount - 0.05)), 6)          AS avg_abs_disc_dev,
           round(avg(pow(l_quantity, 2)), 2)              AS avg_qty_sq,
           round(avg(CAST(ceil(l_extendedprice / 1000) AS DOUBLE)), 4) AS avg_price_kbucket,
           round(avg(CAST(floor(l_quantity / 10) AS DOUBLE)), 4)       AS avg_qty_decile,
           max(greatest(l_tax, l_discount))               AS max_rate,
           min(least(l_tax, l_discount))                  AS min_rate
    FROM lineitem GROUP BY l_linenumber
    """,
    doc="Math-function coverage: sqrt/ln/abs/pow/ceil/floor/greatest/"
        "least over grouped aggregates.",
    tags=("scalar",),
)
def scalar_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linenumber").agg(
        F.round(F.avg(F.sqrt("l_extendedprice")), 4).alias("avg_sqrt_price"),
        F.round(F.avg(F.log("l_extendedprice")), 4).alias("avg_ln_price"),
        F.round(F.avg(F.abs(F.col("l_discount") - 0.05)), 6).alias("avg_abs_disc_dev"),
        F.round(F.avg(F.pow("l_quantity", F.lit(2))), 2).alias("avg_qty_sq"),
        F.round(F.avg(F.ceil(F.col("l_extendedprice") / 1000).cast("double")), 4).alias(
            "avg_price_kbucket"
        ),
        F.round(F.avg(F.floor(F.col("l_quantity") / 10).cast("double")), 4).alias(
            "avg_qty_decile"
        ),
        F.max(F.greatest("l_tax", "l_discount")).alias("max_rate"),
        F.min(F.least("l_tax", "l_discount")).alias("min_rate"),
    )


@register(
    "intersect_segments",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 1000
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="INTERSECT (distinct) — completes the set-op family "
        "(SURVEY §2.7: absent in the reference, required surface).",
    tags=("setop",),
)
def intersect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    rich = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 1000)
        .select("c_custkey")
    )
    f_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return rich.intersect(f_orders)


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
    "window_range_frame_prices",
    oracle="""
    SELECT o_orderkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
             RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS total_30d_cents,
           count(*) OVER (
             PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
             RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
             AS n_30d
    FROM orders
    """,
    doc="RANGE window frame (trailing 30 days per customer) — the "
        "value-based frame class, distinct from ROWS frames "
        "(events_running_value).",
    tags=("window",),
)
def window_range_frame_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    thirty_days_us = 30 * 24 * 3600 * 1_000_000
    # o_orderdate is TIMESTAMP_NTZ in parquet; unix_micros needs TIMESTAMP
    # (identity conversion under the pinned UTC session timezone)
    order_us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(order_us)
        .rangeBetween(-thirty_days_us, 0)
    )
    # integer cents: frame sums of doubles accumulate in engine-specific
    # (even run-specific, under parallel window execution) orders, so any
    # float emission is a latent hash flake at round()-boundaries
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return o.select(
        "o_orderkey",
        F.sum(cents).over(w).alias("total_30d_cents"),
        F.count("*").over(w).alias("n_30d"),
    )
