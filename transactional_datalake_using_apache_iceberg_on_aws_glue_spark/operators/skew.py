"""Skew-handling operators (build brief: 'skewed keys hurt ... salting
for skew').

AQE handles skewed JOINS automatically (skewJoin enabled in
``session.build_session``); what AQE does NOT fix is a skewed
high-cardinality AGGREGATION where one group receives a large fraction
of all rows (the classic hot-key: null user ids, bot traffic, empty
documents). ``salted_agg`` implements the standard two-phase fix as a
reusable operator:

    phase 1: groupBy(key, salt = crc32(row-random-free deterministic
             column) % buckets)  -> partial aggregates  (hot key split
             across `buckets` reducers)
    phase 2: groupBy(key) over the partials               (tiny input)

Only algebraic aggregates (sum/count/min/max + avg via sum/count) can
be salted this way; that covers the OLAP hot paths.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    counts: bool = True,
    buckets: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation: per-key count and sums.

    ``salt_source``: any column expression with per-row variability
    (an id, a timestamp); salted deterministically via crc32 so the
    result is reproducible. Defaults to the first sum column or
    ``F.spark_partition_id()`` as a last resort.
    """
    if salt_source is None:
        salt_source = F.col(sums[0]) if sums else F.spark_partition_id()
    salted = df.withColumn(_SALT, F.crc32(salt_source.cast("string")) % buckets)

    partial_aggs = []
    if counts:
        partial_aggs.append(F.count("*").alias("_pc"))
    for c in sums:
        partial_aggs.append(F.sum(c).alias(f"_ps_{c}"))
    partial = salted.groupBy(*keys, _SALT).agg(*partial_aggs)

    final_aggs = []
    if counts:
        final_aggs.append(F.sum("_pc").alias("n"))
    for c in sums:
        final_aggs.append(F.sum(f"_ps_{c}").alias(f"sum_{c}"))
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_distinct_count(
    df: DataFrame, keys: Sequence[str], value: str, buckets: int = 16
) -> DataFrame:
    """Skew-safe COUNT(DISTINCT value) per key: phase 1 dedups
    (key, salt, value) — the hot key's distinct set is partitioned by
    value hash — phase 2 sums per-salt distinct counts. Exact because
    the salt is derived FROM the value (each distinct value lands in
    exactly one bucket)."""
    salted = df.withColumn(_SALT, F.crc32(F.col(value).cast("string")) % buckets)
    per_bucket = (
        salted.select(*keys, _SALT, value)
        .distinct()
        .groupBy(*keys, _SALT)
        .agg(F.count("*").alias("_pd"))
    )
    return per_bucket.groupBy(*keys).agg(F.sum("_pd").alias(f"n_distinct_{value}"))
