"""Multi-table CDC routing + skew-safe aggregation operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.cdc import fixtures
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.cdc.envelope import (
    CDC_ENVELOPE_SCHEMA,
)
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.cdc.router import (
    route_cdc_batch,
)
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake import ParquetLakeTable
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.operators.skew import (
    salted_agg,
    salted_distinct_count,
)


def test_route_cdc_batch_multi_table(spark, tmp_path):
    envs_a = fixtures.insert_only_envelopes()[:4]
    envs_b = fixtures.insert_only_envelopes()[4:7]
    envs_x = fixtures.insert_only_envelopes()[7:8]  # unrouted table
    for e in envs_b:
        e["metadata"]["table-name"] = "other_table"
    for e in envs_x:
        e["metadata"]["table-name"] = "nobody_registered_me"
    df = spark.createDataFrame(envs_a + envs_b + envs_x, schema=CDC_ENVELOPE_SCHEMA)

    t_a = ParquetLakeTable(spark, str(tmp_path / "a"))
    t_b = ParquetLakeTable(spark, str(tmp_path / "b"))
    routed = route_cdc_batch(
        df,
        {"retail_trans": t_a, "other_table": t_b},
        batch_id=1,
        unknown_table_dir=str(tmp_path / "unknown"),
    )
    assert routed == {"retail_trans": 4, "other_table": 3}
    assert t_a.read_data().count() == 4
    assert t_b.read_data().count() == 3
    unknown = spark.read.parquet(str(tmp_path / "unknown")).collect()
    assert len(unknown) == 1
    assert unknown[0]["table_name"] == "nobody_registered_me"


def test_salted_agg_matches_plain_agg(spark):
    # hot key: user 0 holds 80% of rows
    rows = [(0 if i % 5 != 4 else i % 50, float(i % 7)) for i in range(5000)]
    df = spark.createDataFrame(rows, "user_id long, value double")
    got = {
        r["user_id"]: (r["n"], round(r["sum_value"], 6))
        for r in salted_agg(df, ["user_id"], sums=["value"], buckets=8).collect()
    }
    expected = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in df.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == expected


def test_salted_distinct_count_exact(spark):
    rows = [(i % 3, f"v{i % 97}") for i in range(3000)]
    df = spark.createDataFrame(rows, "k long, v string")
    got = {
        r["k"]: r["n_distinct_v"]
        for r in salted_distinct_count(df, ["k"], "v", buckets=8).collect()
    }
    expected = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == expected


def test_salted_agg_splits_hot_key_in_plan(spark):
    """The phase-1 exchange must partition on (key, salt) — i.e. the hot
    key's rows spread over `buckets` reducers."""
    df = spark.createDataFrame([(1, 1.0)], "user_id long, value double")
    out = salted_agg(df, ["user_id"], sums=["value"], buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan  # salt participates in the first hashpartitioning
