"""As-of join: for each left row, the latest right row with
(right_ts, right_seq) <= (left_ts, left_seq) within the same key group.

Spark has no native as-of join (SURVEY §2.3 'absent'). The scalable
composition is union + running last_value — ONE shuffle on the join
key, no per-row range probe, no row explosion:

    union(left, right tagged) -> window(partition key, order ts/seq)
      -> last(right payload, ignorenulls) over rows-unbounded-preceding
      -> keep left rows

This beats the naive theta-join (O(n*m) per key) and matches
``pd.merge_asof`` backward semantics. At 100 TB: cost is the same
single hash exchange as the CDC dedup; skewed keys are the only risk,
mitigated by AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"  # 1 = right (payload provider), 0 = left


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    left_seq: str | None = None,
    right_seq: str | None = None,
) -> DataFrame:
    """Backward as-of join (left rows enriched with the most recent right
    payload at-or-before their timestamp).

    ``left_seq``/``right_seq`` break timestamp ties deterministically
    (the same discipline as the CDC dedup's transaction-id tiebreak).
    Right payload columns (everything not in ``on``/``right_ts``/
    ``right_seq``) are appended to left rows; unmatched lefts get NULL.
    """
    payload_cols = [c for c in right.columns if c not in set(on) | {right_ts}]
    if right_seq and right_seq in payload_cols:
        pass  # seq may double as payload (e.g. an event id)

    lt = left.withColumn(_SIDE, F.lit(0)).withColumn("_ts", F.col(left_ts))
    rt = right.withColumn(_SIDE, F.lit(1)).withColumn("_ts", F.col(right_ts))

    seq_expr_l = F.col(left_seq) if left_seq else F.lit(0)
    seq_expr_r = F.col(right_seq) if right_seq else F.lit(0)
    lt = lt.withColumn("_seq", seq_expr_l.cast("long"))
    rt = rt.withColumn("_seq", seq_expr_r.cast("long"))

    # align schemas: left carries NULL payload slots, right carries NULL
    # for left-only columns
    left_only = [c for c in left.columns if c not in rt.columns and c not in payload_cols]
    for c in left_only:
        rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in payload_cols:
        if c not in lt.columns:
            rt_type = dict(right.dtypes)[c]
            lt = lt.withColumn(c, F.lit(None).cast(rt_type))

    cols = on + ["_ts", "_seq", _SIDE] + left_only + payload_cols
    unioned = lt.select(*cols).unionByName(rt.select(*cols))

    # right rows sort BEFORE left rows at identical _ts so ts-equality is
    # inclusive (merge_asof backward semantics); _seq only orders rows
    # WITHIN a side (among equal-ts right rows the max _seq wins)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col(_SIDE).desc(), F.col("_seq").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # ALL payload columns ride in ONE struct, so the latest right row wins
    # atomically — filling columns independently would mix values from
    # different right rows whenever the latest right row has NULLs in some
    # payload columns (merge_asof takes the whole latest row, NULLs
    # included).
    payload_struct = F.struct(*[F.col(c) for c in payload_cols])
    filled = unioned.select(
        *on,
        "_ts",
        "_seq",
        _SIDE,
        *left_only,
        F.last(F.when(F.col(_SIDE) == 1, payload_struct), ignorenulls=True)
        .over(w)
        .alias("_payload"),
    )
    out = (
        filled.filter(F.col(_SIDE) == 0)
        .select(
            *on,
            *left_only,
            *[F.col(f"_payload.{c}").alias(c) for c in payload_cols],
        )
    )
    return out
