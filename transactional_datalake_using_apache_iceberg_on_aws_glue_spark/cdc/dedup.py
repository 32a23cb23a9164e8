"""Latest-record-per-key dedup (SURVEY §2.5 W1 — the reference's core
operator, spark_sql_merge_into_iceberg.py:105-108).

Within one micro-batch, if a key has several CDC ops only the newest
survives; full-row images make intermediate states irrelevant.

Improvements over the reference:
- deterministic tie-break on ``transaction-id`` (the reference orders
  only by timestamp, so equal timestamps pick a nondeterministic winner);
- ``_op`` is kept explicitly through the split instead of relying on
  Catalyst's ``ResolveMissingReferences`` resurrecting a dropped column
  (SURVEY §2.2 semantics note).

Scale: one hash exchange on the key + per-partition sort. At 1000
executors this is the unavoidable shuffle of CDC apply; AQE coalesces
the tiny per-trigger batches, and skewed keys (one hot row updated
millions of times per batch) are bounded because the window keeps only
row 1 — map-side nothing to combine, but the sort is per-partition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .envelope import OP_TS_COL, PRIMARY_KEY, TXN_COL

_ROW = "_row"


def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str] = (PRIMARY_KEY,),
    order_cols: Sequence[str] = (OP_TS_COL, TXN_COL),
) -> DataFrame:
    """Keep the newest record per key, ordered by ``order_cols`` desc
    (timestamp first, then transaction id as tiebreaker)."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
    return (
        df.withColumn(_ROW, F.row_number().over(w))
        .filter(F.col(_ROW) == 1)
        .drop(_ROW)
    )
