"""Incremental corpus dedup: a PERSISTED MinHash/LSH index, updated
batch by batch — the production shape of near-dedup for a growing
training corpus.

``operators.dedup.minhash_lsh_dedup`` answers "which docs in THIS
DataFrame duplicate each other" and recomputes signatures every call.
A 100 TB corpus ingesting daily batches needs the other question:
"which NEW docs duplicate anything ALREADY ACCEPTED" — without
re-reading accepted text. :class:`MinHashIndex` stores per-doc MinHash
state in two :class:`ParquetLakeTable`s (the engine's own versioned
lake layer, so index updates are atomic commits with time travel and
idempotent replay):

- ``bands``: one row per (doc_id, band) with the band hash, PARTITIONED
  BY ``band`` — a probe batch joins band-by-band against co-located
  partitions and never scans other bands' files;
- ``sigs``: one row per doc with the full signature (``array<long>``) —
  candidate verification by ESTIMATED Jaccard (fraction of equal
  minhash slots, the standard estimator; E[est] = J), so accepted TEXT
  is never needed again. Estimation error ~1/sqrt(num_hashes).

Scale notes: per batch the cost is one signature pass over the batch
(shingle -> groupBy min), one equi-join per band against pruned index
partitions, and one keyed join for verification — all near-linear in
batch size, independent of corpus size except for the band-bucket
collision lists (hot buckets are the AQE skew-join case, as in
``lsh_candidate_pairs``). Index writes are lake merges keyed on
(doc_id[, band]) — re-adding a batch is an idempotent upsert, which is
what makes the pipeline exactly-once downstream of a replayed source.

Reference: Broder's MinHash + LSH banding as in Leskovec/Rajaraman/
Ullman, Mining of Massive Datasets ch.3 (public); lake layer cited in
lake/table.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lake.table import ParquetLakeTable
from .dedup import minhash_signatures_from_arrays, shingle_hash_arrays


class MinHashIndex:
    """Persisted MinHash band index over a growing corpus."""

    def __init__(self, spark: SparkSession, path: str,
                 num_hashes: int = 64, bands: int = 16,
                 rows_per_band: int = 4) -> None:
        if bands * rows_per_band > num_hashes:
            raise ValueError("bands * rows_per_band must be <= num_hashes")
        self.spark = spark
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = rows_per_band
        self.bands_table = ParquetLakeTable(
            spark, os.path.join(path, "bands"),
            key_cols=["doc_id", "band"], partition_col="band",
        )
        self.sigs_table = ParquetLakeTable(
            spark, os.path.join(path, "sigs"),
            key_cols=["doc_id"], partition_col=None,
        )

    # -- signature computation (shared with the batch-mode pipeline) -----

    def _signatures(self, docs: DataFrame, text_col: str,
                    id_col: str) -> DataFrame:
        # array path: signatures fold row-locally, zero shuffle (r4)
        arrs = shingle_hash_arrays(docs, text_col, id_col)
        sig = minhash_signatures_from_arrays(arrs, id_col, self.num_hashes)
        cols = [f"mh_{i}" for i in range(self.num_hashes)]
        return sig.select(
            F.col(id_col).alias("doc_id"), F.array(*cols).alias("sig")
        )

    def _band_rows(self, sigs: DataFrame) -> DataFrame:
        r = self.rows_per_band
        rows = []
        for b in range(self.bands):
            slice_ = F.slice("sig", b * r + 1, r)
            rows.append(F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(F.concat_ws("_", *[
                    slice_.getItem(i).cast("string") for i in range(r)
                ])).alias("band_hash"),
            ))
        return (
            sigs.select("doc_id", F.explode(F.array(*rows)).alias("bb"))
            .select("doc_id", F.col("bb.band").alias("band"),
                    F.col("bb.band_hash").alias("band_hash"))
        )

    # -- index maintenance ----------------------------------------------

    def add(self, docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> int:
        """Accept a batch into the index (idempotent lake upsert keyed
        on doc id). Returns the number of docs added."""
        sigs = self._signatures(docs, text_col, id_col).persist()
        n = sigs.count()
        if n:
            op = F.lit("insert").alias("_op")
            self.bands_table.merge(self._band_rows(sigs).withColumn("_op", op))
            self.sigs_table.merge(sigs.withColumn("_op", op))
        sigs.unpersist()
        return n

    def doc_count(self) -> int:
        if not self.sigs_table.exists():
            return 0
        return self.sigs_table.read_data().count()

    # -- probing ---------------------------------------------------------

    def find_dups(self, new_docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  threshold: float = 0.7) -> DataFrame:
        """(new_id, index_id, est_jaccard) for every new doc whose
        estimated Jaccard against an ALREADY-INDEXED doc clears the
        threshold. Never compares new docs to each other — compose with
        ``minhash_lsh_dedup`` for within-batch dups."""
        sigs = self._signatures(new_docs, text_col, id_col)
        return self._find_dups_of_sigs(sigs, threshold)

    def _find_dups_of_sigs(self, sigs: DataFrame,
                           threshold: float) -> DataFrame:
        if not self.bands_table.exists():
            # derive the id type from the probe signatures — hardcoding
            # long broke string-id callers on the first (empty-index)
            # probe, yielding a schema inconsistent with later probes
            # (r3 advisor finding)
            id_type = sigs.schema["doc_id"].dataType
            return self.spark.createDataFrame(
                [], T.StructType([
                    T.StructField("new_id", id_type),
                    T.StructField("index_id", id_type),
                    T.StructField("est_jaccard", T.DoubleType()),
                ]))
        probe = self._band_rows(sigs)
        idx = self.bands_table.read_data()
        cand = (
            probe.alias("p")
            .join(idx.alias("i"), ["band", "band_hash"])
            .filter(F.col("p.doc_id") != F.col("i.doc_id"))
            .select(F.col("p.doc_id").alias("new_id"),
                    F.col("i.doc_id").alias("index_id"))
            .distinct()
        )
        new_sigs = sigs.select(F.col("doc_id").alias("new_id"),
                               F.col("sig").alias("sig_new"))
        idx_sigs = self.sigs_table.read_data().select(
            F.col("doc_id").alias("index_id"), F.col("sig").alias("sig_idx"))
        est = F.aggregate(
            F.zip_with("sig_new", "sig_idx",
                       lambda a, b: (a == b).cast("int")),
            F.lit(0), lambda acc, x: acc + x,
        ) / F.lit(self.num_hashes)
        return (
            cand.join(new_sigs, "new_id")
            .join(idx_sigs, "index_id")
            .withColumn("est_jaccard", F.round(est, 6))
            .filter(F.col("est_jaccard") >= threshold)
            .select("new_id", "index_id", "est_jaccard")
        )

    # -- the batch pipeline ----------------------------------------------

    def dedup_and_add(self, new_docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", threshold: float = 0.7
                      ) -> tuple[DataFrame, DataFrame]:
        """One ingestion step: (accepted_docs, dup_report). New docs
        duplicating the index are dropped; survivors are accepted into
        the index atomically (two lake commits). Within-batch dups are
        NOT collapsed here (run minhash_lsh_dedup upstream if the
        source can repeat content inside one batch)."""
        sigs = self._signatures(new_docs, text_col, id_col).persist()
        dups = self._find_dups_of_sigs(sigs, threshold).persist()
        dup_ids = dups.select(F.col("new_id").alias("doc_id")).distinct()
        accepted = new_docs.join(
            dup_ids, new_docs[id_col] == dup_ids["doc_id"], "left_anti")
        clean_sigs = sigs.join(dup_ids, "doc_id", "left_anti").persist()
        if clean_sigs.count():
            op = F.lit("insert").alias("_op")
            self.bands_table.merge(
                self._band_rows(clean_sigs).withColumn("_op", op))
            self.sigs_table.merge(clean_sigs.withColumn("_op", op))
        sigs.unpersist()
        clean_sigs.unpersist()
        return accepted, dups
