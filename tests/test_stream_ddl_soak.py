"""Stream-during-DDL soak (r8 judge item; r6 brief #5).

Runs a LIVE checkpointed ``lake-changes`` reader alongside the
210-statement DML×DDL soak (test_dml_ddl_soak.py) and asserts, at
every periodic model checkpoint, that the drained micro-batch equals
the engine's own ``read_changes`` over the same version span — across
ALTER TABLE add/rename/drop/widen column, partition-field
add/drop/replace (identity, bucket, truncate transforms), and
branch/tag churn (non-main refs claim global version numbers the main
stream must skip, not stumble on). The two parent soaks each caught
real bugs in r6; this is their product.

Comparison columns are the STREAM's schema (current at drain time):
``read_changes`` additionally null-carries columns dropped inside the
span — a documented union-schema behavior, not a divergence. Keys and
change-type labels must match exactly.
"""

from __future__ import annotations

import pytest

from test_dml_ddl_soak import _run_soak


class _StreamRider:
    """Drains one checkpointed lake-changes stream at every soak
    checkpoint and diffs the batch against read_changes on the same
    bounds."""

    def __init__(self, spark, ckpt):
        self.spark = spark
        self.ckpt = ckpt
        self.prev_v = 0
        self.drains = 0
        self.nonempty = 0

    def __call__(self, table, i):
        from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.sources.lake_stream import (
            register_lake_stream,
        )

        register_lake_stream(self.spark)
        batch_rows: list = []
        q = (self.spark.readStream.format("lake-changes")
             .option("path", table.path).option("keys", "trans_id")
             .load()
             .writeStream.foreachBatch(
                 lambda df, b: batch_rows.extend(df.collect()))
             .option("checkpointLocation", self.ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

        cur_v = table.current_version()
        oracle = table.read_changes(self.prev_v, cur_v).collect()
        cols = ([c for c in batch_rows[0].asDict() if c != "_change_type"]
                if batch_rows else ["trans_id"])

        def keyed(rows):
            # multiset semantics (r9): a dict here was multiplicity-
            # blind — duplicate delete emissions passed every seed
            # until the streaming-IVM signed fold double-subtracted
            from collections import Counter

            return Counter(
                (r["trans_id"], r["_change_type"])
                + tuple(r.asDict().get(c) for c in cols)
                for r in rows)

        got, want = keyed(batch_rows), keyed(oracle)
        assert got == want, (
            f"stream != read_changes after statement {i} "
            f"(v{self.prev_v}->v{cur_v}): "
            f"only_stream={ {k: v for k, v in got.items() if want.get(k) != v} } "
            f"only_oracle={ {k: v for k, v in want.items() if got.get(k) != v} }")
        self.prev_v = cur_v
        self.drains += 1
        if got:
            self.nonempty += 1


@pytest.mark.parametrize("seed", [20260814])
def test_stream_survives_dml_ddl_soak(spark, tmp_path, seed):
    rider = _StreamRider(spark, str(tmp_path / "ck_rider"))
    _run_soak(spark, tmp_path, seed, on_check=rider)
    # the rider really rode: every checkpoint drained, and the spans
    # were not all trivially empty
    assert rider.drains == 8
    assert rider.nonempty >= 6, (rider.drains, rider.nonempty)


@pytest.mark.parametrize("seed", [20260815])
def test_stream_rides_ddl_churn_with_externalized_stats(
        spark, tmp_path, seed):
    """The r8 statsext × stream × DDL product: with
    ``stats_ext_threshold=0`` every commit externalizes all file-level
    stats, so the live stream's OWN pyarrow sidecar resolution
    (``_resolve_stats_entry``) serves every manifest file list it
    plans from — including sidecars rewritten by column rename/drop
    DDL mid-span — and must still match ``read_changes`` drain for
    drain."""
    rider = _StreamRider(spark, str(tmp_path / "ck_rider"))
    _run_soak(spark, tmp_path, seed, on_check=rider, n_stmts=120,
              table_kw={"stats_ext_threshold": 0})
    assert rider.drains == 5
    assert rider.nonempty >= 3, (rider.drains, rider.nonempty)
