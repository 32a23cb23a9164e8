"""Hidden partitioning transforms: derivation, hiding, merge, pruning.

Iceberg-parity checks: the derived column never appears in reads, a
predicate on the RAW source column prunes partitions through the
transform's projection, and bucket's Python Murmur3 matches Spark's
``F.hash`` bit-for-bit (the property that makes bucket pruning a pure
metadata operation)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake import (
    ParquetLakeTable,
    bucket,
    days,
    hours,
    months,
    truncate,
)
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake.transforms import (
    murmur3_int,
    murmur3_long,
)

TS = dt.datetime(2024, 1, 1)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, path, rows, partition_by, **kw):
    df = spark.createDataFrame(
        rows, "trans_id long, event string, amount int, ts timestamp"
    )
    t = ParquetLakeTable(spark, path, key_cols=["trans_id"],
                         partition_by=partition_by, **kw)
    t.create(df)
    return t


def _row(k, day, amount=0, event="x"):
    # hours spread within each day so day partitions have real
    # intra-day ts ranges (otherwise footer stats out-prune the
    # transform and boundary tests can't observe the projection)
    return (k, event, amount or k, TS + dt.timedelta(days=day, hours=k % 24))


@pytest.fixture(scope="module")
def days_table(spark, tmp_path_factory):
    rows = [_row(k, day=k // 100) for k in range(300)]  # 3 day-partitions
    return _mk(spark, str(tmp_path_factory.mktemp("tf") / "t"),
               rows, days("ts"))


def test_partition_column_is_hidden(days_table):
    assert "ts_day" not in days_table.read_data().columns
    assert "ts_day" not in days_table.scan([("trans_id", "<", 5)]).columns
    # but it IS the physical layout
    assert set(days_table._live_partitions()) == {
        "2024-01-01", "2024-01-02", "2024-01-03"
    }


def test_source_predicate_prunes_day_partitions(days_table):
    cutoff = TS + dt.timedelta(days=2)
    plan = days_table.plan_scan([("ts", ">=", cutoff)])
    assert plan["parts_kept"] == 1
    assert _rows(days_table.scan([("ts", ">=", cutoff)])) == _rows(
        days_table.read_data().filter(F.col("ts") >= cutoff)
    )


def test_mid_day_boundary_is_inclusive(days_table):
    # noon on day 2: the projection floors to the day, so day 2 must
    # survive pruning and the residual filter does the exact cut
    cutoff = TS + dt.timedelta(days=1, hours=12)
    plan = days_table.plan_scan([("ts", ">", cutoff)])
    assert plan["parts_kept"] == 2  # day 2 and day 3
    assert _rows(days_table.scan([("ts", ">", cutoff)])) == _rows(
        days_table.read_data().filter(F.col("ts") > cutoff)
    )


def test_equality_predicate_keeps_one_day(days_table):
    point = TS + dt.timedelta(days=1, hours=3)
    plan = days_table.plan_scan([("ts", "=", point)])
    assert plan["parts_kept"] == 1


def test_merge_through_transform(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"),
            [_row(k, day=k // 50) for k in range(100)], days("ts"))
    late = dt.datetime(2024, 6, 1)
    batch = spark.createDataFrame(
        # update key 7 (stays on its day), insert key 500 on a NEW day,
        # delete key 60
        [(7, "x", 777, TS, "update", late, 1),
         (500, "x", 500, TS + dt.timedelta(days=9), "insert", late, 2),
         (60, "x", 0, TS + dt.timedelta(days=1), "delete", late, 3)],
        "trans_id long, event string, amount int, ts timestamp, "
        "_op string, _op_timestamp timestamp, _txn_id long",
    )
    t.merge(batch)
    got = {r[0]: r[2] for r in _rows(t.read_data())}
    assert got[7] == 777 and got[500] == 500 and 60 not in got
    assert len(got) == 99 + 1  # 100 - deleted + inserted
    assert "2024-01-10" in t._live_partitions()


def test_months_and_hours_transforms(spark, tmp_path):
    rows = [(k, "x", k, dt.datetime(2024, 1 + k % 3, 5, k % 4)) for k in range(60)]
    tm = _mk(spark, str(tmp_path / "m"), rows, months("ts"))
    assert set(tm._live_partitions()) == {"2024-01", "2024-02", "2024-03"}
    plan = tm.plan_scan([("ts", ">=", dt.datetime(2024, 3, 1))])
    assert plan["parts_kept"] == 1

    th = _mk(spark, str(tmp_path / "h"), rows, hours("ts"))
    assert len(th._live_partitions()) == 12  # 3 months x 4 hours
    plan = th.plan_scan([("ts", "=", dt.datetime(2024, 2, 5, 1))])
    assert plan["parts_kept"] == 1


def test_truncate_int_transform(spark, tmp_path):
    rows = [(k, "x", k, TS) for k in range(100)]
    t = _mk(spark, str(tmp_path / "t"), rows, truncate("amount", width=25))
    assert set(t._live_partitions()) == {"0", "25", "50", "75"}
    plan = t.plan_scan([("amount", ">=", 60)])
    assert plan["parts_kept"] == 2  # buckets 50 and 75
    assert _rows(t.scan([("amount", ">=", 60)])) == _rows(
        t.read_data().filter(F.col("amount") >= 60)
    )


def test_bucket_transform_prunes_equality(spark, tmp_path):
    rows = [(k, "x", k, TS) for k in range(200)]
    t = _mk(spark, str(tmp_path / "t"), rows, bucket("trans_id", n=8))
    assert len(t._live_partitions()) == 8
    plan = t.plan_scan([("trans_id", "=", 42)])
    assert plan["parts_kept"] == 1
    got = _rows(t.scan([("trans_id", "=", 42)]))
    assert len(got) == 1 and got[0][0] == 42
    # range predicates cannot project through a hash: nothing pruned
    plan = t.plan_scan([("trans_id", ">", 100)])
    assert plan["parts_kept"] == 8


def test_bucket_hash_parity_with_spark(spark):
    values = [-(2 ** 62), -5, -1, 0, 7, 123456789, 2 ** 40]
    df = spark.createDataFrame([(v,) for v in values], "v long").select(
        "v", F.hash("v").alias("h")
    )
    for r in df.collect():
        assert murmur3_long(r["v"]) == r["h"]
    df = spark.createDataFrame([(v,) for v in values if abs(v) < 2 ** 31], "v int")
    for r in df.select("v", F.hash("v").alias("h")).collect():
        assert murmur3_int(r["v"]) == r["h"]
    day = dt.date(2024, 3, 1)
    r = spark.createDataFrame([(day,)], "v date").select(F.hash("v")).first()
    assert murmur3_int((day - dt.date(1970, 1, 1)).days) == r[0]


def test_sql_view_hides_transform_column(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"),
            [_row(k, day=k % 2) for k in range(20)], days("ts"))
    name = t.register_sql("hidden_part_t", database="tfdb")
    cols = spark.sql(f"SELECT * FROM {name}").columns
    assert "ts_day" not in cols
    assert spark.sql(f"SELECT count(*) c FROM {name}").first()["c"] == 20


def test_identity_partition_by_matches_legacy(spark, tmp_path):
    from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake import (
        Transform,
    )

    rows = [_row(k, day=0, event="a" if k < 5 else "b") for k in range(10)]
    t = _mk(spark, str(tmp_path / "t"), rows, Transform("event"))
    assert t.partition_col == "event" and t.partition_transform is None
    assert "event" in t.read_data().columns  # identity stays visible
