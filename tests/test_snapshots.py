"""Snapshot/version layer of ParquetLakeTable: time travel, rollback,
expiry, optimistic-concurrency conflict, and COW == MOR equivalence.

The reference gets all of this from Iceberg's snapshot metadata
(/root/reference/src/main/python/spark_sql_merge_into_iceberg.py:51-63
wires the Iceberg catalog; each MERGE at :118-136 commits a snapshot).
Here the same contract is pinned against the manifest-pointer
implementation in lake/table.py.
"""

from __future__ import annotations

import pytest

from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.cdc import fixtures
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.cdc.apply import (
    apply_cdc_batch,
)
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.cdc.envelope import (
    CDC_ENVELOPE_SCHEMA,
)
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake import (
    CommitConflictError,
    ParquetLakeTable,
)


def _envelope_df(spark, envelopes):
    return spark.createDataFrame(envelopes, schema=CDC_ENVELOPE_SCHEMA)


def _state(table, **kw):
    return {
        r["trans_id"]: r["amount"]
        for r in table.read_data(**kw).select("trans_id", "amount").collect()
    }


def _two_wave_table(spark, tmp_path, **kw):
    table = ParquetLakeTable(spark, str(tmp_path / "t"), key_cols=["trans_id"], **kw)
    apply_cdc_batch(_envelope_df(spark, fixtures.insert_only_envelopes()), table)
    apply_cdc_batch(_envelope_df(spark, fixtures.dml_envelopes()), table)
    return table


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_time_travel_by_version(spark, tmp_path, mode):
    table = _two_wave_table(spark, tmp_path / mode, merge_mode=mode)
    assert table.current_version() == 2
    wave1 = {k: 10 + k for k in fixtures.INSERT_KEYS}
    assert _state(table, as_of_version=1) == wave1
    assert _state(table, as_of_version=2) == fixtures.expected_final_state()
    assert _state(table) == fixtures.expected_final_state()
    with pytest.raises(ValueError):
        table.read(as_of_version=99)


def test_time_travel_by_timestamp(spark, tmp_path):
    table = ParquetLakeTable(spark, str(tmp_path / "t"), key_cols=["trans_id"])
    apply_cdc_batch(_envelope_df(spark, fixtures.insert_only_envelopes()), table)
    t1 = table._manifest(1)["committed_at_ms"]
    apply_cdc_batch(_envelope_df(spark, fixtures.dml_envelopes()), table)
    t2 = table._manifest(2)["committed_at_ms"]
    assert _state(table, as_of_timestamp_ms=t1) == {
        k: 10 + k for k in fixtures.INSERT_KEYS
    }
    assert _state(table, as_of_timestamp_ms=t2 + 1) == fixtures.expected_final_state()
    with pytest.raises(ValueError):
        table.read(as_of_timestamp_ms=t1 - 10_000)


def test_rollback_is_metadata_only_and_history_grows(spark, tmp_path):
    table = _two_wave_table(spark, tmp_path)
    files_before = table.file_count()
    table.rollback(1)
    assert table.current_version() == 3  # rollback is a new commit
    assert _state(table) == {k: 10 + k for k in fixtures.INSERT_KEYS}
    ops = [h["operation"] for h in table.history()]
    assert ops == ["create", "merge", "rollback"]
    # no data movement: the rolled-back state references the v1 files
    assert table.file_count() <= files_before
    # table continues forward from the rolled-back state
    late = fixtures._envelope(fixtures._row(60, amount=6), "insert", seq=999)
    apply_cdc_batch(_envelope_df(spark, [late]), table)
    assert _state(table)[60] == 6
    assert 37 not in _state(table)  # dml wave stays rolled back


def test_expire_snapshots_frees_unreferenced_files(spark, tmp_path):
    import os

    table = _two_wave_table(spark, tmp_path)
    table.compact(target_files_per_partition=1)
    state = _state(table)
    removed = table.expire_snapshots(keep_last=1)
    assert removed, "expected unreferenced snapshot dirs to be removed"
    assert _state(table) == state  # current snapshot untouched
    with pytest.raises(ValueError):
        table.read(as_of_version=1)  # expired horizon
    live_dirs = {
        n for n in os.listdir(table.path) if n.startswith(("snap-", "delta-"))
    }
    assert live_dirs == {"snap-000003"}


def test_commit_conflict_detected(spark, tmp_path):
    table = _two_wave_table(spark, tmp_path)
    stale_version = table.current_version() - 1  # writer planned on v1
    with pytest.raises(CommitConflictError):
        table._commit(stale_version, "merge", {}, [], table.read().schema)


def test_read_changes_between_snapshots(spark, tmp_path):
    """Incremental changelog (Iceberg create_changelog_view parity):
    diffing the two golden waves must yield exactly the dml wave's
    inserts / updates / deletes."""
    table = _two_wave_table(spark, tmp_path)
    changes = {
        r["trans_id"]: (r["_change_type"], r["amount"])
        for r in table.read_changes(1, 2).collect()
    }
    assert {k for k, (t, _) in changes.items() if t == "insert"} == set(
        fixtures.DML_INSERT_KEYS
    )
    assert {k for k, (t, _) in changes.items() if t == "delete"} == set(
        fixtures.DELETE_KEYS
    )
    assert {
        k: a for k, (t, a) in changes.items() if t == "update_postimage"
    } == fixtures.UPDATE_AMOUNTS
    # identical snapshots diff to nothing
    assert table.read_changes(2, 2).count() == 0


def test_manifest_key_stats_prune_merge_probe(spark, tmp_path):
    """Key-range stats harvested from parquet footers must (a) land in
    the manifest, (b) prune the probe semi-join to zero partitions for
    an out-of-range batch, and (c) never prune a partition that holds a
    matched key — including the key-moves-partition case."""
    table = _two_wave_table(spark, tmp_path)
    stats = table._manifest().get("stats", {})
    assert stats, "expected footer-derived key stats in the manifest"
    for ranges in stats.values():
        lo, hi = ranges["trans_id"]
        assert lo <= hi

    live = table._live_partitions()
    far_batch = spark.createDataFrame([(100_000, "visit")], "trans_id long, event string")
    # no live partition's trans_id range reaches 100000 -> nothing to scan
    assert table._stats_overlapping_partitions(far_batch, {"visit"}, live) == set()
    assert table._affected_partitions(far_batch) == ["visit"]

    # key 19 lives in its id-derived partition; an update that MOVES it
    # to another partition must still rewrite the old partition
    row = fixtures._row(19, amount=99)
    old_event, row["event"] = row["event"], "purchase"
    move = fixtures._envelope(row, "update", seq=500)
    apply_cdc_batch(_envelope_df(spark, [move]), table)
    rows = table.read_data().filter("trans_id = 19").collect()
    assert [(r["amount"], r["event"]) for r in rows] == [(99, "purchase")]
    assert old_event != "purchase"


@pytest.mark.parametrize("n_batches", [1, 4])
def test_mor_equals_cow(spark, tmp_path, n_batches):
    """The two merge modes must be observationally identical on the same
    op stream (SURVEY §7 hard-part 6's mode-parity requirement, applied
    to our own two modes): same live rows after every wave split."""
    import random

    rng = random.Random(99)
    ops = [
        fixtures._envelope(
            fixtures._row(rng.choice(fixtures.INSERT_KEYS), amount=rng.randint(1, 99)),
            rng.choice(["insert", "update", "delete"]),
            seq,
        )
        for seq in range(40)
    ]
    cow = ParquetLakeTable(spark, str(tmp_path / "cow"), key_cols=["trans_id"])
    mor = ParquetLakeTable(
        spark, str(tmp_path / "mor"), key_cols=["trans_id"], merge_mode="mor"
    )
    step = max(1, len(ops) // n_batches)
    for i in range(0, len(ops), step):
        chunk = ops[i : i + step]
        apply_cdc_batch(_envelope_df(spark, chunk), cow)
        apply_cdc_batch(_envelope_df(spark, chunk), mor)
        assert _state(cow) == _state(mor)
