"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` exposes
every implemented operator from SURVEY.md §2 (and the M4 LLM-pipeline
surface) as (spark, sf_dir) -> DataFrame builders; ``oracle_sql()``
returns the DuckDB-equivalent SQL per query (omitted only for
genuinely non-SQL-expressible ops, which the driver checks rows-only).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.queries import load_all


def _configure(spark: SparkSession) -> SparkSession:
    """Apply engine session confs to a driver-provided session (the
    driver may build its own plain SparkSession)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; load_table guards anyway
    from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.session import (
        ensure_package_shipped,
    )

    ensure_package_shipped(spark)  # UDF-by-reference needs the pkg on workers
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _configure(spark)
    registry = load_all()
    return registry["q3_shipping_priority"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry = load_all()

    def _wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return spec.builder(_configure(spark), sf_dir)

        return run

    return {name: _wrap(spec) for name, spec in sorted(registry.items())}


def oracle_sql() -> dict[str, str]:
    registry = load_all()
    return {
        name: spec.oracle for name, spec in sorted(registry.items()) if spec.oracle is not None
    }
