"""Binned range join (operators/range_join.py): must equal the naive
cross-join-filter on random data while planning a HASH join, never a
nested loop.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from transactional_datalake_using_apache_iceberg_on_aws_glue_spark import plans as P
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.operators.range_join import (
    range_join,
)


@pytest.fixture(scope="module")
def data(spark):
    rng = random.Random(7)
    points = [(i, rng.randrange(0, 10_000), rng.randrange(0, 5))
              for i in range(400)]
    intervals = []
    for j in range(80):
        start = rng.randrange(0, 9_500)
        intervals.append((j, start, start + rng.randrange(0, 600),
                          rng.randrange(0, 5)))
    left = spark.createDataFrame(points, "pid long, ts long, grp int")
    right = spark.createDataFrame(
        intervals, "iid long, start long, end long, igrp int")
    return left, right


def _naive(left, right, keyed=False):
    cond = (F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end"))
    if keyed:
        cond = cond & (F.col("grp") == F.col("igrp"))
    return {
        (r["pid"], r["iid"])
        for r in left.crossJoin(right).filter(cond).collect()
    }


@pytest.mark.parametrize("bin_size", [50, 300, 2_000])
def test_range_join_equals_naive_across_bin_sizes(spark, data, bin_size):
    left, right = data
    got = {
        (r["pid"], r["iid"])
        for r in range_join(left, right, "ts", "start", "end", bin_size).collect()
    }
    assert got == _naive(left, right)
    assert got  # non-degenerate fixture


def test_range_join_with_extra_equi_keys(spark, data):
    left, right = data
    r2 = right.withColumnRenamed("igrp", "grp")
    got = {
        (r["pid"], r["iid"])
        for r in range_join(left, r2, "ts", "start", "end", 300,
                            on=["grp"]).collect()
    }
    assert got == _naive(left, right, keyed=True)


def test_range_join_plans_hash_join_not_nested_loop(spark, data):
    left, right = data
    df = range_join(left, right, "ts", "start", "end", 300)
    assert not P.has_cartesian(df), "binned range join planned a nested loop"
    # the naive spelling DOES nested-loop — the thing this operator avoids
    naive = left.crossJoin(right).filter(
        (F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end")))
    assert P.has_cartesian(naive)


def test_range_join_timestamp_and_guards(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=30)), (2, base + dt.timedelta(hours=3))],
        "eid long, ts timestamp",
    )
    win = spark.createDataFrame(
        [(10, base, base + dt.timedelta(hours=1))],
        "wid long, start timestamp, end timestamp",
    )
    got = range_join(ev, win, "ts", "start", "end",
                     bin_size=3_600_000_000).collect()  # 1h bins in µs
    assert [(r["eid"], r["wid"]) for r in got] == [(1, 10)]

    with pytest.raises(ValueError, match="bin_size"):
        range_join(ev, win, "ts", "start", "end", 0)
    with pytest.raises(Exception, match="spans more than"):
        range_join(ev, win, "ts", "start", "end", bin_size=1,
                   max_bins_per_interval=10).collect()
    with pytest.raises(ValueError, match="ambiguous"):
        range_join(ev, ev.withColumnRenamed("eid", "e2"), "ts", "ts", "ts", 1)
