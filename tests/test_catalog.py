"""Catalog registration: spark.sql over a ParquetLakeTable by name.

The reference addresses its lake table as ``catalog.db.table`` in SQL
(spark_sql_merge_into_iceberg.py:91-136); these tests pin that the
generated view (lake/catalog.py) reads bit-identically to
``read_data()`` across COW, MOR (fold-on-read), escaped/NULL partition
values, refresh-after-merge, and pinned time-travel views.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.constants import (
    OP_COL,
    OP_TS_COL,
    TXN_COL,
)
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake import (
    ParquetLakeTable,
)


def _batch(spark, rows, day):
    data = [
        (tid, ev, am, op, datetime.datetime(2024, 1, day), tid)
        for tid, ev, am, op in rows
    ]
    return spark.createDataFrame(
        data,
        f"trans_id long, event string, amount long, {OP_COL} string, "
        f"{OP_TS_COL} timestamp, {TXN_COL} long",
    )


def _rows(df):
    return sorted(
        (r["trans_id"], r["event"], r["amount"]) for r in df.collect()
    )


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_sql_view_equals_read_data(spark, tmp_path, mode):
    t = ParquetLakeTable(spark, str(tmp_path / mode), key_cols=["trans_id"],
                         partition_col="event", merge_mode=mode)
    t.merge(_batch(spark, [(1, "a", 10, "insert"), (2, "b", 20, "insert"),
                           (3, "a", 30, "insert")], day=1))
    t.merge(_batch(spark, [(2, "b", 21, "update"), (3, "a", 30, "delete"),
                           (4, "c", 40, "insert")], day=2))
    name = t.register_sql(f"t_{mode}", database="testdb")
    assert name == f"`testdb`.`t_{mode}`"
    got = spark.sql(f"SELECT trans_id, event, amount FROM {name}")
    assert _rows(got) == _rows(t.read_data().select("trans_id", "event", "amount"))
    assert _rows(got) == [(1, "a", 10), (2, "b", 21), (4, "c", 40)]


def test_sql_view_refreshes_after_commit(spark, tmp_path):
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key_cols=["trans_id"],
                         partition_col="event")
    t.merge(_batch(spark, [(1, "a", 10, "insert")], day=1))
    name = t.register_sql("t_refresh", database="testdb")
    assert spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0]["n"] == 1
    # a later merge must be visible through the SAME catalog name
    t.merge(_batch(spark, [(2, "b", 20, "insert"), (1, "a", 10, "delete")],
                   day=2))
    got = spark.sql(f"SELECT trans_id, amount FROM {name}").collect()
    assert {(r["trans_id"], r["amount"]) for r in got} == {(2, 20)}
    # compaction is also a commit — the view must survive it
    t.compact()
    assert spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0]["n"] == 1


def test_sql_view_time_travel_pinned(spark, tmp_path):
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key_cols=["trans_id"],
                         partition_col="event")
    t.merge(_batch(spark, [(1, "a", 10, "insert")], day=1))
    t.merge(_batch(spark, [(1, "a", 99, "update")], day=2))
    v1 = t.register_sql("t_v1", database="testdb", as_of_version=1)
    cur = t.register_sql("t_cur", database="testdb")
    assert spark.sql(f"SELECT amount FROM {v1}").collect()[0]["amount"] == 10
    assert spark.sql(f"SELECT amount FROM {cur}").collect()[0]["amount"] == 99
    # pinned views do NOT refresh
    t.merge(_batch(spark, [(1, "a", 100, "update")], day=3))
    assert spark.sql(f"SELECT amount FROM {v1}").collect()[0]["amount"] == 10
    assert spark.sql(f"SELECT amount FROM {cur}").collect()[0]["amount"] == 100


def test_sql_view_escaped_and_null_partitions(spark, tmp_path):
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key_cols=["trans_id"],
                         partition_col="event")
    t.merge(_batch(spark, [(1, "a b", 10, "insert"), (2, "x:y", 20, "insert"),
                           (3, None, 30, "insert"),
                           (4, "it's", 40, "insert")], day=1))
    name = t.register_sql("t_esc", database="testdb")
    got = spark.sql(f"SELECT trans_id, event, amount FROM {name}")
    assert _rows(got) == [(1, "a b", 10), (2, "x:y", 20), (3, None, 30),
                          (4, "it's", 40)]


def test_sql_view_partition_pruning(spark, tmp_path):
    """A partition filter through the view must prune to one partition's
    files — the view's IN-list rewrites to directory-level pruning."""
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key_cols=["trans_id"],
                         partition_col="event")
    t.merge(_batch(spark, [(i, ev, i, "insert")
                           for i in range(1, 7)
                           for ev in [["a", "b", "c"][i % 3]]], day=1))
    name = t.register_sql("t_prune", database="testdb")
    df = spark.sql(f"SELECT trans_id FROM {name} WHERE event = 'a'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), f"no partition filters in plan:\n{plan}"


def test_sql_view_schema_evolution(spark, tmp_path):
    """Old snapshots predating an added column read as NULL through the
    view, same as the DataFrame path."""
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key_cols=["trans_id"],
                         partition_col="event", allow_schema_evolution=True,
                         merge_mode="mor")
    t.merge(_batch(spark, [(1, "a", 10, "insert")], day=1))
    wide = spark.createDataFrame(
        [(2, "a", 20, "tag", "insert", datetime.datetime(2024, 1, 2), 2)],
        f"trans_id long, event string, amount long, extra string, "
        f"{OP_COL} string, {OP_TS_COL} timestamp, {TXN_COL} long",
    )
    t.merge(wide)
    name = t.register_sql("t_evo", database="testdb")
    got = {r["trans_id"]: r["extra"]
           for r in spark.sql(f"SELECT trans_id, extra FROM {name}").collect()}
    assert got == {1: None, 2: "tag"}


def test_sql_view_rename_across_layer_vintages(spark, tmp_path):
    """A MOR base written BEFORE a rename and a delta written after it
    must fold into one column through the compiled view, same as the
    DataFrame path (the stream had exactly this bug, fixed r6 — pin
    the SQL surface too)."""
    t = ParquetLakeTable(spark, str(tmp_path / "rv"), key_cols=["trans_id"],
                         partition_col="event", merge_mode="mor",
                         allow_schema_evolution=True)
    t.merge(_batch(spark, [(1, "a", 10, "insert"), (2, "a", 20, "insert")],
                   day=1))
    t.rename_column("amount", "cents")
    wide = spark.createDataFrame(
        [(2, "a", 99, "update", datetime.datetime(2024, 1, 2), 2)],
        f"trans_id long, event string, cents long, "
        f"{OP_COL} string, {OP_TS_COL} timestamp, {TXN_COL} long",
    )
    t.merge(wide)
    name = t.register_sql("t_rnv", database="testdb")
    got = sorted((r["trans_id"], r["cents"]) for r in spark.sql(
        f"SELECT trans_id, cents FROM {name}").collect())
    assert got == [(1, 10), (2, 99)]
