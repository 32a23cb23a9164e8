"""Incrementally-maintained rollup (lake/materialized.py): every
refresh must equal the from-scratch GROUP BY over the source's current
state — the IVM correctness contract — and the write-ahead intent must
make a refresh that crashes between merge and cursor exactly-once (the
double-count is the classic IVM replay bug)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake import (
    MaterializedRollup,
    ParquetLakeTable,
)

_SCHEMA = ("trans_id long, event string, amount long, _op string, "
           "ts string, _txn_id long")


def _merge(spark, table, rows):
    df = (spark.createDataFrame([tuple(r) for r in rows], _SCHEMA)
          .withColumn("_op_timestamp", F.to_timestamp("ts")).drop("ts"))
    table.merge(df)


def _expected(state):
    out = {}
    for _k, (e, a) in state.items():
        n, s = out.get(e, (0, 0))
        out[e] = (n + 1, s + a)
    return out


def _got(rollup):
    return {r["event"]: (r["n_rows"], r["sum_amount"])
            for r in rollup.read().collect()}


def _mk(spark, tmp_path, **kw):
    src = ParquetLakeTable(spark, str(tmp_path / "src"),
                           key_cols=["trans_id"], partition_col="event")
    roll = MaterializedRollup(
        src, str(tmp_path / "roll"), str(tmp_path / "ck"),
        group_cols=["event"], sum_cols=["amount"], **kw)
    return src, roll


def test_rollup_tracks_dml(spark, tmp_path):
    src, roll = _mk(spark, tmp_path)
    state = {}

    # wave 1: inserts across three groups
    rows = [[k, f"g{k % 3}", 10 * k, "insert", f"2026-01-01 00:00:{k:02d}", k]
            for k in range(1, 10)]
    for k in range(1, 10):
        state[k] = (f"g{k % 3}", 10 * k)
    _merge(spark, src, rows)
    assert roll.refresh() == src.current_version()
    assert _got(roll) == _expected(state)

    # caught up: refresh is a no-op commit-wise
    v = roll.target.current_version()
    assert roll.refresh() == src.current_version()
    assert roll.target.current_version() == v

    # wave 2: update moves amounts, delete shrinks a group
    _merge(spark, src, [
        [1, "g1", 999, "update", "2026-01-01 00:01:00", 100],
        [2, "g2", 5, "update", "2026-01-01 00:01:01", 101],
        [3, "g0", 30, "delete", "2026-01-01 00:01:02", 102],
    ])
    state[1] = ("g1", 999)
    state[2] = ("g2", 5)
    del state[3]
    roll.refresh()
    assert _got(roll) == _expected(state)

    # wave 3: empty a whole group -> its summary row disappears
    _merge(spark, src, [
        [6, "g0", 60, "delete", "2026-01-01 00:02:00", 103],
        [9, "g0", 90, "delete", "2026-01-01 00:02:01", 104],
    ])
    del state[6], state[9]
    roll.refresh()
    got = _got(roll)
    assert got == _expected(state)
    assert "g0" not in got


def test_rollup_crash_between_merge_and_cursor_is_exactly_once(
        spark, tmp_path):
    src, roll = _mk(spark, tmp_path)
    _merge(spark, src, [
        [k, f"g{k % 2}", k, "insert", f"2026-01-01 00:00:{k:02d}", k]
        for k in range(1, 7)])
    roll.refresh()

    _merge(spark, src, [
        [1, "g1", 1000, "update", "2026-01-01 00:01:00", 50],
        [2, "g0", 2, "delete", "2026-01-01 00:01:01", 51],
    ])

    # crash INSIDE refresh: after target.merge, before feed.commit
    class Boom(RuntimeError):
        pass

    real_commit = roll.feed.commit
    roll.feed.commit = lambda v: (_ for _ in ()).throw(Boom())
    with pytest.raises(Boom):
        roll.refresh()
    roll.feed.commit = real_commit
    assert roll.fs.exists(roll._intent_file)  # crash left the intent

    # fresh maintainer on the same paths: recovery must finalize the
    # cursor WITHOUT re-applying (re-apply would double-count)
    src2 = ParquetLakeTable(spark, str(tmp_path / "src"),
                            key_cols=["trans_id"], partition_col="event")
    roll2 = MaterializedRollup(
        src2, str(tmp_path / "roll"), str(tmp_path / "ck"),
        group_cols=["event"], sum_cols=["amount"])
    v_before = roll2.target.current_version()
    assert roll2.refresh() == src2.current_version()
    assert not roll2.fs.exists(roll2._intent_file)
    assert roll2.target.current_version() == v_before  # no second merge

    expect = {"g1": (3, 1000 + 3 + 5), "g0": (2, 4 + 6)}
    assert _got(roll2) == expect

    # and the next real change still applies
    _merge(spark, src2, [[7, "g0", 70, "insert",
                          "2026-01-01 00:02:00", 60]])
    roll2.refresh()
    expect["g0"] = (3, 4 + 6 + 70)
    assert _got(roll2) == expect


@pytest.mark.parametrize("seed", [5])
def test_rollup_randomized_equivalence_soak(spark, tmp_path, seed):
    """Random DML waves with refreshes at random strides (some spans
    cover several source commits): after every refresh the summary
    equals the from-scratch GROUP BY of the source's current state."""
    rng = random.Random(seed)
    src, roll = _mk(spark, tmp_path)
    state = {}
    tick = 0
    for wave in range(8):
        rows = []
        # merge()'s contract is a DEDUPED batch: one row per key
        for k in rng.sample(range(1, 40), rng.randrange(3, 9)):
            tick += 1
            e = f"g{rng.randrange(4)}"
            a = rng.randrange(1, 500)
            op = rng.choice(["insert", "update", "update", "delete"])
            ts = f"2026-01-01 00:{tick // 60:02d}:{tick % 60:02d}"
            rows.append([k, e, a, op, ts, tick])
            if op == "delete":
                state.pop(k, None)
            else:
                state[k] = (e, a)
        _merge(spark, src, rows)
        if rng.random() < 0.6 or wave == 7:
            roll.refresh()
            assert _got(roll) == _expected(state), f"wave {wave}"
    assert roll.position() == src.current_version()
