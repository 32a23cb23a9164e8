"""Metadata-tier scale pins (r8 judge item; r6 brief #6).

At 100 TB a table's CURRENT snapshot references millions of files; the
``files``/``partitions`` metadata tables must build from the manifest's
own per-file stats entries — never by walking directories or stat'ing
files (the r5 implementation did exactly that and was rebuilt in r6).
These tests pin that contract mechanically, not by timing alone:

- a synthetic 10,000-file manifest (100 partitions x 100 files) is
  served with the filesystem seam's ``walk_files``/``size`` POISONED —
  any touch fails the test — and the driver-side row build must still
  finish fast;
- the lazy delta-footer harvest (``_delta_footer_stats``) must run its
  one executor job ONCE per delta dir per table handle: repeat
  ``files_df``/``partitions_df`` calls hit the memo (delta dirs are
  immutable), pinned by counting ``harvest_stats`` invocations.
"""

from __future__ import annotations

import json
import os
import time

import pyspark.sql.functions as F

from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake import ParquetLakeTable
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake.metadata import (
    files_df,
    partitions_df,
)

N_PARTS, N_FILES = 100, 100  # 10,000 file entries


def _synthesize_10k_manifest(table):
    """Graft a v2 manifest carrying 10k per-file stats entries onto a
    real 1-partition table: `base` maps 100 tokens to (fictitious)
    snapshot dirs and every file's size/rows/bounds ride in `stats`,
    exactly the shape every post-r6 commit writes. The data files do
    not exist — which is the point: a manifest-only reader never asks."""
    vdir = os.path.join(table.path, "_versions")
    with open(os.path.join(vdir, "v000001.json")) as f:
        m = json.load(f)
    base, stats = {}, {}
    for p in range(N_PARTS):
        tok = f"p{p:03d}"
        snap = "snap-000002"  # one shared snapshot dir, like real commits
        base[tok] = snap
        files = {}
        file_rows = {}
        file_sizes = {}
        for i in range(N_FILES):
            rel = f"event={tok}/part-{i:05d}.parquet"
            files[rel] = {"trans_id": [p * 1000 + i, p * 1000 + i + 9]}
            file_rows[rel] = 10
            file_sizes[rel] = 4096 + i
        stats[tok] = {"rows": N_FILES * 10, "files": files,
                      "file_rows": file_rows, "file_sizes": file_sizes,
                      "cols": {"trans_id": [p * 1000, p * 1000 + 108]}}
    m.update(version=2, parent=1, base=base, stats=stats, deltas=[],
             operation="synthetic-scale-fixture")
    with open(os.path.join(vdir, "v000002.json"), "w") as f:
        json.dump(m, f)
    with open(os.path.join(vdir, "CURRENT"), "w") as f:
        f.write("2")


def test_files_partitions_tables_are_manifest_only_at_10k_files(
        spark, tmp_path):
    table = ParquetLakeTable(spark, str(tmp_path / "big"),
                             key_cols=["trans_id"], partition_col="event")
    table.create(spark.createDataFrame([(1, "p000", 1)],
                                       "trans_id long, event string, v int"))
    _synthesize_10k_manifest(table)

    def _poisoned(*a, **k):
        raise AssertionError(
            "metadata table touched the filesystem — the 10k-file "
            "manifest carries complete per-file stats, so the build "
            "must be manifest-only")

    table.fs.walk_files = _poisoned
    table.fs.size = _poisoned

    t0 = time.perf_counter()
    fdf = files_df(table)
    n = fdf.count()
    build_s = time.perf_counter() - t0
    assert n == N_PARTS * N_FILES
    # generous wall pin (driver loop + one LocalRelation): the r5
    # walk+stat version took one filesystem round-trip PER FILE and
    # could not pass the poisoned seam above at all
    assert build_s < 15.0, f"files_df took {build_s:.1f}s for 10k entries"

    # spot integrity: sizes/rows/bounds came from the manifest
    row = (fdf.filter((F.col("partition") == "p007")
                      & F.col("relpath").endswith("part-00099.parquet"))
           .collect()[0])
    assert row["size_bytes"] == 4096 + 99 and row["record_count"] == 10
    assert "trans_id" in row["column_bounds"]

    t0 = time.perf_counter()
    pdf = partitions_df(table)
    rows = pdf.collect()
    build_s = time.perf_counter() - t0
    assert len(rows) == N_PARTS
    assert build_s < 15.0, f"partitions_df took {build_s:.1f}s"
    by_part = {r["partition"]: r for r in rows}
    assert by_part["p042"]["n_files"] == N_FILES
    assert by_part["p042"]["n_rows"] == N_FILES * 10
    assert by_part["p042"]["size_bytes"] == sum(4096 + i
                                                for i in range(N_FILES))


def test_statsext_keeps_commit_manifest_o_batch_at_10k_files(
        spark, tmp_path):
    """The r8 statsext contract at metadata scale: against a 10k-file
    manifest, a commit touching ONE partition must (a) shrink the
    manifest from O(files) inline bytes to O(partitions) pointer
    bytes, (b) carry every untouched partition's sidecar pointer
    forward VERBATIM (no blob rewrite), and (c) never READ a sidecar —
    the merge plans entirely from the inline ``rows``/``cols``
    scalars. The untouched partitions carry one token data file each
    (the merge's logical plan enumerates referenced leaf dirs), but
    the manifest claims 100 — the stats tier is authoritative and
    nothing on the commit path may contradict it by listing files."""
    R = "trans_id long, event string, v int"
    table = ParquetLakeTable(spark, str(tmp_path / "big"),
                             key_cols=["trans_id"], partition_col="event",
                             stats_ext_threshold=0)
    table.create(spark.createDataFrame([(1, "p000", 1)], R))
    _synthesize_10k_manifest(table)
    # materialize the 100 leaf dirs the synthetic manifest references
    # (one token file each — far fewer than the stats claim)
    (spark.createDataFrame([(p * 1000, f"p{p:03d}", 0)
                            for p in range(N_PARTS)], R)
     .coalesce(1).write.partitionBy("event")
     .parquet(os.path.join(table.path, "snap-000002")))
    vdir = os.path.join(table.path, "_versions")
    inline_bytes = os.path.getsize(os.path.join(vdir, "v000002.json"))

    # merge 1 (inline -> external migration): batch keys far outside
    # every stored partition's cols bounds, so the probe prunes ALL
    # fictitious partitions and only the new partition is written
    t0 = time.perf_counter()
    table.merge(spark.createDataFrame([(10_000_000, "zz", 1)], R)
                .withColumn("_op", F.lit("insert")))
    merge_s = time.perf_counter() - t0
    assert merge_s < 30.0, f"merge took {merge_s:.1f}s at 10k files"
    m3 = json.load(open(os.path.join(vdir, "v000003.json")))
    ext_bytes = os.path.getsize(os.path.join(vdir, "v000003.json"))
    assert ext_bytes * 10 < inline_bytes, (
        f"externalized manifest {ext_bytes}B not <10% of inline "
        f"{inline_bytes}B")
    ptrs3 = {p: e.get("files_ext") for p, e in m3["stats"].items()
             if p.startswith("p")}
    assert len(ptrs3) == N_PARTS and all(ptrs3.values())
    assert all("files" not in e for e in m3["stats"].values())

    # merge 2: pointers carry forward verbatim, zero sidecar READS
    real_read = table.fs.read_text
    ext_reads = {"n": 0}

    def counting_read(path):
        if f"{os.sep}statsext{os.sep}" in path or "/statsext/" in path:
            ext_reads["n"] += 1
        return real_read(path)

    table.fs.read_text = counting_read
    table.merge(spark.createDataFrame([(10_000_001, "zz2", 1)], R)
                .withColumn("_op", F.lit("insert")))
    table.fs.read_text = real_read
    assert ext_reads["n"] == 0, (
        "commit resolved statsext sidecars for untouched partitions")
    m4 = json.load(open(os.path.join(vdir, "v000004.json")))
    assert {p: e.get("files_ext") for p, e in m4["stats"].items()
            if p.startswith("p")} == ptrs3
    # the blob store grew only by the two new partitions' content
    # (+1 for the v1 create's own externalized entry)
    blobs = os.listdir(os.path.join(vdir, "statsext"))
    assert len(blobs) <= N_PARTS + 3

    # and the files table still serves all file-level detail on demand
    assert files_df(table).count() == N_PARTS * N_FILES + 2


def test_delta_footer_memo_prevents_reharvest(spark, tmp_path, monkeypatch):
    R = "trans_id long, event string, amount int"
    table = ParquetLakeTable(spark, str(tmp_path / "mor"),
                             key_cols=["trans_id"], partition_col="event",
                             merge_mode="mor")
    table.create(spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], R))
    for wave in ([(1, "a", 11)], [(3, "b", 30)]):  # two delta dirs
        table.merge(spark.createDataFrame(wave, R)
                    .withColumn("_op", F.lit("update")))
    assert len(table._manifest()["deltas"]) == 2

    from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake import scan as scan_mod

    calls = {"n": 0}
    real = scan_mod.harvest_stats

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(scan_mod, "harvest_stats", counting)

    n1 = files_df(table).count()
    assert calls["n"] == 1  # ONE combined job for both missing dirs
    # repeat calls, both metadata tables: the per-dir memo on the
    # table handle serves them — zero further executor jobs
    n2 = files_df(table).count()
    partitions_df(table).collect()
    partitions_df(table, version=table.current_version()).collect()
    assert calls["n"] == 1, "delta footers were re-harvested"
    assert n1 == n2

    # a NEW delta dir harvests incrementally: one more job covering
    # only the unseen dir, memo intact for the old ones
    table.merge(spark.createDataFrame([(4, "a", 40)], R)
                .withColumn("_op", F.lit("insert")))
    files_df(table).count()
    assert calls["n"] == 2
    files_df(table).count()
    assert calls["n"] == 2
