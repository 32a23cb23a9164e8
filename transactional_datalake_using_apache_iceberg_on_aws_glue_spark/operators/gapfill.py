"""Time-series gap fill: regularize each key's series onto a fixed
grid and fill the holes — the `time_bucket_gapfill` / `GROUP BY
GAPFILL` capability of time-series engines, composed from DataFrame
primitives:

- the SPINE is generated per key with ``sequence()`` + ``explode``
  (JVM-side, no driver loop): every grid instant from the key's first
  to last observation — or a caller-fixed [start, end) so all keys
  align;
- observations are bucketed to the grid (floor) and LEFT-joined onto
  the spine; multiple observations in one bucket reduce by
  ``max_by(value, time)`` (deterministic latest-wins regardless of
  partitioning) — change ``agg`` for sum/avg semantics;
- ``fill='ffill'`` carries the last observation forward with
  ``last(ignorenulls=True)`` over an unbounded-preceding window —
  one shuffle on the key, the same partitioning the spine join just
  used; ``fill='zero'``/``fill='null'`` are cheaper (no window).

Scale notes: the spine explode is |keys| x |grid slots| rows — the
output's own size, nothing bigger; the only shuffles are the
spine-observation join and (for ffill) the per-key window, both on
the key column, so AQE coalesces them into adjacent stages. Dense
grids for sparse keys are the cost trap (a key with 2 points over a
year at 1 s resolution explodes 31M rows); ``max_slots_per_key``
guards it inside the sequence bound, un-prunable by column pruning
(same trick as range_join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_FILLS = ("ffill", "zero", "null")


def gap_fill(df: DataFrame, key_cols: list[str], ts_col: str,
             value_cols: list[str], step: int,
             fill: str = "ffill",
             start=None, end=None,
             max_slots_per_key: int = 1_000_000) -> DataFrame:
    """One row per (key, grid slot) with holes filled.

    ``step`` is in the time column's normalized units (MICROSECONDS
    for timestamps, DAYS for dates, raw for numerics); the output
    ``ts_col`` is the bucket start in the original type. ``start`` /
    ``end`` (same type as the column) fix a common grid for all keys;
    by default each key spans its own [min, max] observations.
    """
    if fill not in _FILLS:
        raise ValueError(f"fill must be one of {_FILLS}")
    if step <= 0:
        raise ValueError("step must be positive")
    dtype = dict(df.dtypes)[ts_col]
    to_long, from_long = _converters(dtype)

    t = to_long(F.col(ts_col))
    slot = F.floor(t / step) * step
    obs = (
        df.withColumn("_slot", slot)
        .groupBy(*key_cols, "_slot")
        .agg(*[
            # latest observation (by time) wins within a bucket —
            # max_by, not last(): last() is partition-order-dependent
            # and only looks deterministic on single-partition frames
            F.max_by(c, t).alias(c)
            for c in value_cols
        ])
    )

    lo = F.lit(to_long_value(start, dtype)) if start is not None else F.min("_slot")
    hi = F.lit(to_long_value(end, dtype)) if end is not None else F.max("_slot")
    spans = obs.groupBy(*key_cols).agg(
        F.floor(lo / step).alias("_b0") if start is not None
        else F.floor(F.min("_slot") / step).alias("_b0"),
        F.floor(hi / step).alias("_b1") if end is not None
        else F.floor(F.max("_slot") / step).alias("_b1"),
    )
    n_slots = F.col("_b1") - F.col("_b0") + 1
    guarded_b1 = F.when(
        n_slots > max_slots_per_key,
        F.raise_error(F.format_string(
            "gap_fill: a key spans more than %s grid slots; raise step "
            "or bound [start, end)", F.lit(str(max_slots_per_key)))).cast("long"),
    ).otherwise(F.col("_b1"))
    spine = spans.select(
        *key_cols,
        F.explode(F.sequence(F.col("_b0"), guarded_b1)).alias("_bucket"),
    ).withColumn("_slot", F.col("_bucket") * step).drop("_bucket")

    filled = spine.join(obs, [*key_cols, "_slot"], "left")
    if fill == "ffill":
        w = (
            Window.partitionBy(*key_cols)
            .orderBy("_slot")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in value_cols:
            filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    elif fill == "zero":
        filled = filled.fillna(0, subset=value_cols)
    return filled.select(
        *key_cols, from_long(F.col("_slot")).alias(ts_col), *value_cols
    ).orderBy(*key_cols, ts_col)


def _converters(dtype: str):
    if dtype.startswith("timestamp"):
        return (lambda c: F.unix_micros(c.cast("timestamp")),
                lambda c: F.timestamp_micros(c).cast(dtype))
    if dtype.startswith("date"):
        return (lambda c: F.datediff(c, F.lit("1970-01-01")).cast("long"),
                lambda c: F.date_add(F.lit("1970-01-01"), c.cast("int")))
    return (lambda c: c.cast("long"), lambda c: c)


def to_long_value(v, dtype: str):
    import datetime as dt

    if isinstance(v, dt.datetime):
        return int(v.timestamp() * 1_000_000) if v.tzinfo else int(
            v.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    if isinstance(v, dt.date):
        return (v - dt.date(1970, 1, 1)).days
    return int(v)
