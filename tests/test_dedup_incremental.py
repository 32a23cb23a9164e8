"""Incremental corpus dedup (operators/dedup_incremental.py): the
persisted MinHash index must catch new docs duplicating PREVIOUSLY
ACCEPTED batches without re-reading accepted text, survive reopen,
and stay idempotent under replay (it is backed by the lake layer).
"""

from __future__ import annotations

import pytest

from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.operators.dedup_incremental import (
    MinHashIndex,
)


def _doc(w: int) -> str:
    # stride 61 > doc length 60 => distinct docs share NO tokens
    return f"token{w} " + " ".join(f"word{w * 61 + i}" for i in range(60))


def _mutated(w: int) -> str:
    toks = _doc(w).split()
    toks[-2] = "MUTATED"
    return " ".join(toks)


@pytest.fixture()
def index(spark, tmp_path):
    return MinHashIndex(spark, str(tmp_path / "idx"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_batch_dup_detection(spark, index):
    b1 = _df(spark, [(i, _doc(i)) for i in range(40)])
    assert index.add(b1) == 40
    assert index.doc_count() == 40

    # batch 2: one exact dup of doc 7, one near dup of doc 21, two fresh
    b2 = _df(spark, [
        (100, _doc(7)), (101, _mutated(21)), (102, _doc(500)), (103, _doc(501)),
    ])
    accepted, dups = index.dedup_and_add(b2, threshold=0.6)
    rep = {(r["new_id"], r["index_id"]): r["est_jaccard"] for r in dups.collect()}
    assert (100, 7) in rep and rep[(100, 7)] == pytest.approx(1.0)
    assert (101, 21) in rep and 0.6 <= rep[(101, 21)] <= 1.0
    assert sorted(r["doc_id"] for r in accepted.collect()) == [102, 103]
    assert index.doc_count() == 42  # only the fresh docs were accepted

    # batch 3 duplicating a BATCH-2 doc is caught too (index grew)
    b3 = _df(spark, [(200, _doc(500))])
    accepted3, dups3 = index.dedup_and_add(b3, threshold=0.6)
    assert accepted3.count() == 0
    assert {(r["new_id"], r["index_id"]) for r in dups3.collect()} == {(200, 102)}


def test_index_survives_reopen_and_replay(spark, tmp_path):
    idx = MinHashIndex(spark, str(tmp_path / "idx"))
    idx.add(_df(spark, [(i, _doc(i)) for i in range(10)]))
    # replaying the SAME batch is an idempotent upsert, not growth
    idx.add(_df(spark, [(i, _doc(i)) for i in range(10)]))
    assert idx.doc_count() == 10

    # a fresh handle on the same path sees the persisted state
    idx2 = MinHashIndex(spark, str(tmp_path / "idx"))
    assert idx2.doc_count() == 10
    dups = idx2.find_dups(_df(spark, [(99, _doc(3))]), threshold=0.6)
    assert {(r["new_id"], r["index_id"]) for r in dups.collect()} == {(99, 3)}


def test_no_false_positives_across_batches(spark, index):
    index.add(_df(spark, [(i, _doc(i)) for i in range(40)]))
    fresh = _df(spark, [(100 + i, _doc(1000 + i)) for i in range(20)])
    accepted, dups = index.dedup_and_add(fresh, threshold=0.6)
    assert dups.count() == 0
    assert accepted.count() == 20


def test_band_probe_prunes_partitions(spark, index):
    """The bands table is partitioned by band, so the probe join scans
    band-matched partitions only — pinned via the lake scan planner."""
    index.add(_df(spark, [(i, _doc(i)) for i in range(20)]))
    plan = index.bands_table.plan_scan([("band", "=", 3)])
    assert plan["parts_kept"] == 1 and plan["parts_total"] == index.bands


def test_empty_index_probe_matches_caller_id_type(spark, tmp_path):
    """First probe against an empty index must carry the CALLER's id
    type (r3 advisor finding: a hardcoded long schema broke string-id
    corpora on union with later probes)."""
    idx = MinHashIndex(spark, str(tmp_path / "sidx"))
    docs = spark.createDataFrame(
        [("a", _doc(1)), ("b", _doc(2))], "doc_id string, text string")
    empty = idx.find_dups(docs)
    assert empty.count() == 0
    assert dict(empty.dtypes)["new_id"] == "string"
    assert dict(empty.dtypes)["index_id"] == "string"
    # and the string-id corpus works end-to-end: index, re-probe, dup hit
    accepted, dups = idx.dedup_and_add(docs)
    assert sorted(r["doc_id"] for r in accepted.collect()) == ["a", "b"]
    later = idx.find_dups(
        spark.createDataFrame([("z", _doc(1))], "doc_id string, text string"))
    # union of first (empty) and later probes — the schema must agree
    empty.unionByName(later).collect()
    assert [r["index_id"] for r in later.collect()] == ["a"]
