"""Gap fill (operators/gapfill.py): regularized grid per key, hole
filling semantics, and the fan-out guard."""

from __future__ import annotations

import datetime as dt

import pytest

from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.operators.gapfill import (
    gap_fill,
)

T0 = dt.datetime(2024, 1, 1)


def _m(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        ("a", _m(0), 10.0),
        ("a", _m(2), 12.0),   # 1-minute hole at m1
        ("a", _m(5), 15.0),   # holes at m3, m4
        ("b", _m(1), 100.0),
        ("b", _m(3), 300.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


MIN_US = 60_000_000


def test_ffill_per_key_span(spark, series):
    out = gap_fill(series, ["k"], "ts", ["v"], step=MIN_US).collect()
    got = {(r["k"], r["ts"]): r["v"] for r in out}
    assert got == {
        ("a", _m(0)): 10.0, ("a", _m(1)): 10.0, ("a", _m(2)): 12.0,
        ("a", _m(3)): 12.0, ("a", _m(4)): 12.0, ("a", _m(5)): 15.0,
        ("b", _m(1)): 100.0, ("b", _m(2)): 100.0, ("b", _m(3)): 300.0,
    }


def test_zero_and_null_fill_with_common_grid(spark, series):
    out = gap_fill(series, ["k"], "ts", ["v"], step=MIN_US, fill="zero",
                   start=_m(0), end=_m(5)).collect()
    got = {(r["k"], r["ts"]): r["v"] for r in out}
    # common grid: both keys span m0..m5; b's missing slots are 0
    assert got[("b", _m(0))] == 0.0 and got[("b", _m(5))] == 0.0
    assert got[("a", _m(4))] == 0.0  # zero fill, not carry-forward
    assert len(got) == 12

    out_null = gap_fill(series, ["k"], "ts", ["v"], step=MIN_US, fill="null",
                        start=_m(0), end=_m(5)).collect()
    gotn = {(r["k"], r["ts"]): r["v"] for r in out_null}
    assert gotn[("b", _m(0))] is None and gotn[("a", _m(1))] is None


def test_bucket_reduction_keeps_latest(spark):
    rows = [("a", _m(0), 1.0), ("a", T0 + dt.timedelta(seconds=30), 2.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = gap_fill(df, ["k"], "ts", ["v"], step=MIN_US).collect()
    assert len(out) == 1 and out[0]["v"] == 2.0


def test_bucket_reduction_latest_is_partition_order_independent(spark):
    """max_by(value, time), not last(): the in-bucket winner must be
    the latest BY TIME even when rows arrive shuffled across many
    partitions in descending time order (r3 advisor finding)."""
    rows = [("a", T0 + dt.timedelta(seconds=s), float(s))
            for s in range(40)]
    df = (spark.createDataFrame(rows, "k string, ts timestamp, v double")
          .orderBy("ts", ascending=False)       # adversarial input order
          .repartition(16))                     # round-robin scatter
    out = gap_fill(df, ["k"], "ts", ["v"], step=MIN_US).collect()
    assert len(out) == 1 and out[0]["v"] == 39.0


def test_numeric_axis_and_guards(spark):
    df = spark.createDataFrame([("a", 0, 1.0), ("a", 10, 2.0)],
                               "k string, t long, v double")
    out = gap_fill(df, ["k"], "t", ["v"], step=5).collect()
    assert [(r["t"], r["v"]) for r in out] == [(0, 1.0), (5, 1.0), (10, 2.0)]
    with pytest.raises(ValueError, match="step"):
        gap_fill(df, ["k"], "t", ["v"], step=0)
    with pytest.raises(ValueError, match="fill"):
        gap_fill(df, ["k"], "t", ["v"], step=5, fill="bogus")
    with pytest.raises(Exception, match="grid slots"):
        gap_fill(df, ["k"], "t", ["v"], step=1,
                 max_slots_per_key=5).collect()
