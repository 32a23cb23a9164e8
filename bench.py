#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": "..."}

Each query is forced end-to-end with the noop sink (full computation,
no driver collect overhead). One warm-up action first so JVM/codegen
startup is not billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.queries import load_all
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.session import build_session

#: Queries timed for the headline number: the relational core, the
#: window/session analytics, and the LLM-pipeline operators.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_revenue",
    "topk_suppliers_per_nation",
    "rollup_lineitem_status",
    "distinct_counts_lineitem",
    "events_daily_rollup",
    "events_sessionization",
    "events_running_value",
    "events_asof_signup",
    "dedup_exact_documents",
    "doc_ngram_shingles",
    "doc_quality_scores",
    "cosine_topk_bruteforce",
    "knn_per_label_centroid",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="bench")
    registry = load_all()

    _force(registry["q1_pricing_summary"].builder(spark, sf_dir))  # warm-up

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = registry.get(name)
        if spec is None:
            continue
        t0 = time.perf_counter()
        _force(spec.builder(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline-suite-wallclock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
