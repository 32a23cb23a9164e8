#!/usr/bin/env python
"""One-off A/B probe for the stats_ext_threshold default (r9 brief #1).

Times the bench's MOR churn merge + post-merge read at sf0.1 under
three thresholds — the r8 default (4 KiB, externalizes every commit),
the r9 default (256 KiB), and None (never externalize) — and prints
the serialized size of each partition's file-stats triple so the
crossover is a measured number, not a guess. Median of N runs each.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.cdc.apply import apply_cdc_batch
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake import ParquetLakeTable
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake.table import _STATS_FILE_KEYS
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.session import build_session, load_table

N = 3
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def envelopes(df, op, ts):
    return df.select(
        F.struct(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("trans_id"),
            F.col("l_suppkey").cast("string").alias("customer_id"),
            F.col("l_returnflag").alias("event"),
            F.col("l_linestatus").alias("sku"),
            F.col("l_quantity").cast("int").alias("amount"),
            F.lit("pc").alias("device"),
            F.date_format("l_shipdate", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("trans_datetime"),
        ).alias("data"),
        F.struct(
            F.lit(ts).alias("timestamp"),
            F.lit("data").alias("record-type"),
            F.lit(op).alias("operation"),
            F.lit("primary-key").alias("partition-key-type"),
            F.lit("bench").alias("schema-name"),
            F.lit("lineitem").alias("table-name"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("transaction-id"),
        ).alias("metadata"),
    )


def main():
    spark = build_session(app_name="statsext_ab",
                          extra_conf={"spark.ui.showConsoleProgress": "false"})
    li = load_table(spark, SF_DIR, "lineitem")
    churn = envelopes(li.filter(F.col("l_orderkey") % 10 == 0), "update",
                      "2024-01-02T00:00:00.000000").unionByName(
        envelopes(li.filter(F.col("l_orderkey") % 20 == 1), "delete",
                  "2024-01-02T00:00:00.000000"))

    results = {}
    blob_sizes = None
    for label, thr in (("4KiB_r8", 4096), ("256KiB_r9", 262_144), ("inline_None", None)):
        merges, reads = [], []
        for i in range(N):
            work = tempfile.mkdtemp(prefix=f"ab_{label}_{i}_")
            try:
                mor = ParquetLakeTable(spark, f"{work}/t", key_cols=["trans_id"],
                                       partition_col="event", merge_mode="mor",
                                       stats_ext_threshold=thr)
                apply_cdc_batch(envelopes(li, "insert", "2024-01-01T00:00:00.000000"), mor)
                t0 = time.perf_counter()
                apply_cdc_batch(churn, mor)
                merges.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                mor.read_data().write.format("noop").mode("overwrite").save()
                reads.append(time.perf_counter() - t0)
                if blob_sizes is None:
                    m = mor._manifest(mor.current_version())
                    blob_sizes = {}
                    for part, entry in (m.get("stats") or {}).items():
                        if "files_ext" in entry:
                            blob_sizes[part] = {"externalized": True,
                                                "n_files": entry.get("n_files")}
                        else:
                            triple = {k: entry[k] for k in _STATS_FILE_KEYS if k in entry}
                            blob_sizes[part] = {
                                "externalized": False,
                                "n_files": len(entry.get("files") or []),
                                "triple_bytes": len(json.dumps(triple, sort_keys=True))}
            finally:
                shutil.rmtree(work, ignore_errors=True)
        med = lambda xs: round(sorted(xs)[len(xs) // 2], 3)
        results[label] = {"merge_median": med(merges), "read_median": med(reads),
                          "merge_all": [round(x, 3) for x in merges],
                          "read_all": [round(x, 3) for x in reads]}
        if blob_sizes is not None:
            results[label]["stats_entries"] = blob_sizes
            blob_sizes = None
    spark.stop()
    print(json.dumps({"loadavg": [round(x, 2) for x in os.getloadavg()],
                      "results": results}, indent=1))


if __name__ == "__main__":
    main()
