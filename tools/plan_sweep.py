#!/usr/bin/env python
"""Registry-wide plan-hygiene sweep: executedPlan of every registered
query, flagging cartesian/nested-loop joins and row-at-a-time Python
UDFs, printing shuffle counts. Known-benign BNLJ: the broadcast
single-row query-vector pattern (cosine_topk_bruteforce, ANN probes)
and the bounded all-pairs oracle tier (ngram_jaccard_pairs).

Usage: python tools/plan_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.queries import load_all
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.session import build_session

BENIGN_BNLJ = {"approx_sketch_report", "cosine_topk_bruteforce",
               "ngram_jaccard_pairs",
               # 1-row scalar total broadcast-joined against per-part
               # sums (the scalar-subquery shape; commented in code)
               "q11_important_parts",
               # r12: recall gate — the same broadcast 1-row
               # query-vector pattern (exact + both ANN probes)
               "ann_recall_gate"}


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="plan-sweep", shuffle_partitions=8)
    bad = []
    for name, spec in sorted(load_all().items()):
        try:
            p = (spec.builder(spark, sf)
                 ._jdf.queryExecution().executedPlan().toString())
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            bad.append((name, f"ERROR {type(ex).__name__}: {ex}"))
            continue
        flags = []
        if "CartesianProduct" in p:
            flags.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in p and name not in BENIGN_BNLJ:
            flags.append("BNLJ")
        if "BatchEvalPython" in p:
            flags.append("ROW_PYTHON_UDF")
        n = p.count("Exchange hashpartitioning") + p.count(
            "Exchange rangepartitioning")
        print(f"{name}: shuffles={n}" + (" " + " ".join(flags) if flags else ""))
        if flags:
            bad.append((name, flags))
    print("\nFLAGGED:", bad if bad else "none")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
