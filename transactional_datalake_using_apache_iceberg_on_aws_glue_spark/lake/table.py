"""Partitioned-parquet lake table with keyed MERGE semantics.

The reference delegates MERGE to the Iceberg Spark extension
(/root/reference/src/main/python/spark_sql_merge_into_iceberg.py:59,
118-136): Iceberg rewrites only the data files containing matched keys
(copy-on-write). This module reproduces those semantics over plain
parquet, which is what the test image supports (no Iceberg jar):

- the table directory is hive-partitioned by a partition column
  (``PARTITIONED BY (event)`` in the reference's Athena DDL,
  README.md:355-368);
- a merge rewrites ONLY the partitions that contain matched keys or
  receive new rows (computed from partition-value metadata, never a
  full-table rewrite), via ``partitionOverwriteMode=dynamic``;
- merge itself is ONE shuffle: union(target-slice, batch) followed by
  latest-per-key — not a join cascade. Ordering is
  (op_timestamp, txn_id, is_source) descending, which simultaneously
  implements UPDATE SET * / INSERT * / DELETE *and* the late-data guard
  the reference lacks (SURVEY §2.9 T4): an older image arriving in a
  later batch loses to the newer row already in the table.
- replay idempotence (SURVEY T3): re-applying the same batch converges
  to the same state because the winner of (ts, txn, src) is stable.

Scale: the per-merge cost is O(affected partitions), exactly like
Iceberg COW. Partition values (not rows) are collected to the driver —
bounded metadata. At 100 TB with 1000 executors the shuffle is on the
primary key, AQE-coalesced; skew is impossible post-dedup (one row per
key per batch on the source side).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..constants import OP_COL, OP_TS_COL, TXN_COL

#: Lineage columns persisted in the table to power the late-data guard.
#: _deleted marks TOMBSTONES: deletes are retained (invisible to readers)
#: so an OLDER image arriving after a delete cannot resurrect the key —
#: found by property testing (spec fold: winner per key by (ts, txn)).
#: Tombstones are purged by compact(purge_tombstones=True), bounded by
#: the max event lateness you accept (log-compaction retention).
DELETED_COL = "_deleted"
LINEAGE_COLS = (OP_TS_COL, TXN_COL, DELETED_COL)
_SRC = "_is_source"


class ParquetLakeTable:
    """A keyed, partitioned lake table supporting CDC merge.

    Parameters
    ----------
    path: table root directory (hive layout ``part_col=value/``).
    key_cols: merge key (reference: ``trans_id``, README.md:85).
    partition_col: hive partition column (reference: ``event``).
    store_lineage: persist ``_op_timestamp``/``_txn_id`` so merges can
        reject out-of-order images (T4 guard). When False the table has
        exactly the reference's 7-column schema and the batch always
        wins (reference behavior).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: Sequence[str] = ("trans_id",),
        partition_col: str | None = "event",
        store_lineage: bool = True,
        allow_schema_evolution: bool = False,
    ) -> None:
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.partition_col = partition_col
        self.store_lineage = store_lineage
        #: when True, a batch may add columns (old rows read as NULL) or
        #: omit existing ones (filled NULL) — additive evolution only,
        #: the DMS add-column case; type changes still error loudly.
        #: The reference supports no evolution at all (SURVEY §1.3).
        self.allow_schema_evolution = allow_schema_evolution

    # -- basic IO ----------------------------------------------------------

    def exists(self) -> bool:
        """True only when the table holds data files. A table whose rows
        were ALL deleted has no partition dirs left (found by property
        testing: reading such a directory fails schema inference, and
        semantically the next merge should take the initial-load path)."""
        return self.file_count() > 0

    def read(self) -> DataFrame:
        """Read the table; a fully-emptied table (every row deleted)
        yields an empty DataFrame with the schema persisted by the last
        write — the minimal analogue of Iceberg's metadata file."""
        if self.file_count() == 0:
            schema_file = os.path.join(self.path, "_schema.json")
            if os.path.exists(schema_file):
                from pyspark.sql import types as T

                with open(schema_file) as f:
                    schema = T.StructType.fromJson(json.load(f))
                return self.spark.createDataFrame([], schema)
        reader = self.spark.read
        if self.allow_schema_evolution:
            # evolved tables hold files with different (additive) schemas:
            # old partitions keep the old footer until rewritten
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(self.path)

    def read_data(self) -> DataFrame:
        """Read the LIVE rows (tombstones filtered) without lineage
        columns — the user-facing relation."""
        df = self.read()
        if DELETED_COL in df.columns:
            df = df.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False)))
        return df.drop(*[c for c in LINEAGE_COLS if c in df.columns])

    def _write(self, df: DataFrame, mode: str) -> None:
        w = df.write.mode(mode)
        if self.partition_col:
            w = w.partitionBy(self.partition_col)
        w.parquet(self.path)
        # persist the schema so an emptied table stays readable (read())
        with open(os.path.join(self.path, "_schema.json"), "w") as f:
            json.dump(df.schema.jsonValue(), f)

    def create(self, df: DataFrame) -> None:
        """Initial load (the reference's DMS full-load phase)."""
        self._write(self._with_lineage(df), "overwrite")

    def _with_lineage(self, df: DataFrame) -> DataFrame:
        if not self.store_lineage:
            return df.drop(*[c for c in LINEAGE_COLS if c in df.columns])
        out = df
        if OP_TS_COL not in df.columns:
            out = out.withColumn(OP_TS_COL, F.lit(None).cast("timestamp"))
        if TXN_COL not in df.columns:
            out = out.withColumn(TXN_COL, F.lit(None).cast("long"))
        if DELETED_COL not in out.columns:
            out = out.withColumn(DELETED_COL, F.lit(False))
        return out

    # -- maintenance ---------------------------------------------------------

    def compact(self, target_files_per_partition: int = 1,
                purge_tombstones: bool = False) -> None:
        """Rewrite each partition into ``target_files_per_partition``
        files — the open-parquet analogue of Iceberg's
        ``rewrite_data_files`` (SURVEY §7 hard-part 5: 100 s triggers x
        tiny batches accumulate small files; run this out-of-band).

        ``purge_tombstones=True`` also drops delete tombstones — only
        safe once no in-flight data can be older than the deletes
        (retention contract, like Kafka log compaction).

        Writes the compacted layout to a sibling directory and swaps it
        in (read-your-own-overwrite is unsafe, and a cache-then-overwrite
        wouldn't survive 100 TB) — the snapshot-swap discipline Iceberg
        gets from its metadata pointer, done with directories here.
        """
        df = self.read()
        if purge_tombstones and DELETED_COL in df.columns:
            df = df.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False)))
        if self.partition_col:
            rewritten = df.repartition(target_files_per_partition, self.partition_col)
        else:
            rewritten = df.coalesce(target_files_per_partition)
        tmp = self.path.rstrip("/") + ".compacting"
        old = self.path.rstrip("/") + ".old"
        w = rewritten.write.mode("overwrite")
        if self.partition_col:
            w = w.partitionBy(self.partition_col)
        w.parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)

    def file_count(self) -> int:
        n = 0
        for root, _dirs, files in os.walk(self.path):
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    # -- merge -------------------------------------------------------------

    def _affected_partitions(self, batch: DataFrame) -> list | None:
        """Partition values whose files a merge must rewrite: partitions
        receiving batch rows plus partitions currently holding matched
        keys (a key may move across partitions on update — Iceberg finds
        this via file-level stats; we find it via a semi-join restricted
        to key+partition columns, then prune the scan with IN)."""
        if not self.partition_col:
            return None
        batch_parts = {r[0] for r in batch.select(self.partition_col).distinct().collect()}
        live_parts = self._fs_partitions()
        if live_parts is not None and live_parts <= {str(v) for v in batch_parts}:
            # batch already touches every live partition — the key-match
            # semi-join (a full keyed target scan) can't add any, skip it.
            # (dir names are strings; stringified compare is cover-only)
            return sorted(batch_parts)
        key_match = (
            self.read()
            .select(*self.key_cols, self.partition_col)
            .join(F.broadcast(batch.select(*self.key_cols).distinct()), self.key_cols, "left_semi")
            .select(self.partition_col)
            .distinct()
        )
        rows = key_match.collect()
        return sorted(batch_parts | {r[0] for r in rows})

    def _fs_partitions(self) -> set | None:
        """Partition values from directory names (pure metadata, no scan).
        Values come back as strings — callers may only use this for
        set-cover checks against stringified batch values."""
        if not os.path.isdir(self.path):
            return set()
        out = set()
        prefix = f"{self.partition_col}="
        for name in os.listdir(self.path):
            if name.startswith(prefix) and os.path.isdir(os.path.join(self.path, name)):
                out.add(name[len(prefix):])
        return out

    def merge(self, batch: DataFrame) -> None:
        """Apply a deduped CDC batch (one row per key, carrying
        ``_op``/``_op_timestamp``/``_txn_id``).

        Semantics = the reference's two MERGE statements combined
        (:118-122 upsert, :133-136 delete), plus the T4 late-data guard:

        - key matched, batch newer, op in (insert, update) -> replace row
        - key matched, batch newer, op = delete            -> drop row
        - key matched, batch older                          -> keep row
        - key unmatched, op != delete                       -> insert row
        """
        if not self.exists():
            if self.store_lineage:
                # keep deletes as tombstones even on first contact: their
                # lineage must outlive the (absent) row to block stale
                # older images (spec-fold property tests)
                initial = batch.withColumn(
                    DELETED_COL, F.col(OP_COL) == "delete"
                ).drop(OP_COL)
            else:
                initial = batch.filter(F.col(OP_COL) != "delete").drop(OP_COL)
            self._write(self._with_lineage(initial), "overwrite")
            return

        # the batch lineage (parse -> flatten -> window dedup) is referenced
        # by the partition probe AND the union; persist it once instead of
        # recomputing (the reference recomputes per count(), SURVEY §4)
        already_persisted = batch.storageLevel.useMemory or batch.storageLevel.useDisk
        if not already_persisted:
            batch = batch.persist()
        try:
            self._merge_into(batch)
        finally:
            if not already_persisted:
                batch.unpersist()

    def _merge_into(self, batch: DataFrame) -> None:
        parts = self._affected_partitions(batch)
        target = self.read()
        if parts is not None:
            # IN-list on the partition column -> parquet partition pruning:
            # only affected partitions' files are scanned or rewritten.
            target = target.filter(F.col(self.partition_col).isin(parts))
            if not parts:
                return

        tgt = (
            self._with_lineage(target)
            .withColumn(
                OP_COL,
                F.when(F.coalesce(F.col(DELETED_COL), F.lit(False)), "delete").otherwise(
                    "insert"
                )
                if self.store_lineage
                else F.lit("insert"),
            )
            .withColumn(_SRC, F.lit(0))
        )
        src = self._with_lineage(batch).withColumn(_SRC, F.lit(1))
        if self.allow_schema_evolution:
            # additive evolution: new batch columns appear (targets NULL),
            # missing batch columns fill NULL
            unioned = tgt.unionByName(src, allowMissingColumns=True)
        else:
            unioned = tgt.unionByName(src.select(*tgt.columns))

        if self.store_lineage:
            order = [F.desc_nulls_last(OP_TS_COL), F.desc_nulls_last(TXN_COL), F.desc(_SRC)]
        else:
            order = [F.desc(_SRC)]  # no lineage: batch always wins (reference behavior)
        w = Window.partitionBy(*self.key_cols).orderBy(*order)
        ranked = unioned.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
        if self.store_lineage:
            # winners persist with a tombstone flag instead of vanishing
            merged = ranked.withColumn(DELETED_COL, F.col(OP_COL) == "delete").drop(
                "_rn", OP_COL, _SRC
            )
        else:
            merged = ranked.filter(F.col(OP_COL) != "delete").drop("_rn", OP_COL, _SRC)
        if not self.store_lineage:
            merged = merged.drop(*[c for c in LINEAGE_COLS if c in merged.columns])

        merged = merged.cache()
        try:
            remaining = {
                r[0]
                for r in merged.select(self.partition_col).distinct().collect()
            } if self.partition_col else None
            self._write(merged, "overwrite")
            if parts is not None and remaining is not None:
                # dynamic overwrite can't express "this partition is now
                # empty" — drop emptied partition dirs explicitly (the
                # analogue of Iceberg committing a snapshot without them).
                for v in parts:
                    if v not in remaining:
                        d = os.path.join(self.path, f"{self.partition_col}={v}")
                        if os.path.isdir(d):
                            shutil.rmtree(d)
        finally:
            merged.unpersist()
