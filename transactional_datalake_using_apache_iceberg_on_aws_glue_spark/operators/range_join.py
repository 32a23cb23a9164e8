"""Binned range join: point-in-interval matching without a nested
loop.

``left.ts BETWEEN right.start AND right.end`` has no equi-key, so
Catalyst plans BroadcastNestedLoopJoin (or a cartesian) — O(|L|x|R|)
and the classic cluster-killer at scale. Engines with range-join
optimizations (Databricks' range join hint, Flink interval joins) bin
the domain so candidates meet on an equi-key; this module is that
strategy in plain DataFrame ops:

- each left row lands in ONE bin: ``floor(point / bin)``;
- each right interval EXPLODES across the bins it overlaps
  (``sequence(floor(start/bin), floor(end/bin))``);
- the join is a hash equi-join on the bin id (plus any caller equi
  keys), re-checked by the exact BETWEEN predicate — bins only shrink
  candidates, never decide matches (the same sound-overapproximation
  contract as the scan planner).

Cost model: shuffle is O(|L| + |R| * avg_span/bin) on the bin key;
pick ``bin_size`` ~ the typical interval length so the explode factor
stays ~2. Too-small bins inflate the right side; too-large bins
inflate candidate lists — both stay correct, just slower.
``max_bins_per_interval`` bounds the fan-out against pathological
intervals (one year-long interval over 1 s bins would explode 31M
rows); violators raise — inside the sequence-length expression, so
column pruning cannot optimize the check away.

Only INNER semantics: an outer range join needs a row identity on the
unmatched side to collapse bin duplicates, which a generic operator
cannot assume. Point-in-interval covers the reference-adjacent
analytics (events in campaign/session/validity windows); as-of
semantics live in ``operators.asof``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_long(col: Column, dtype: str) -> Column:
    if dtype.startswith("timestamp"):
        return F.unix_micros(col.cast("timestamp"))
    if dtype.startswith("date"):
        return F.datediff(col, F.lit("1970-01-01")).cast("long")
    return col.cast("long")


def range_join(left: DataFrame, right: DataFrame, left_point: str,
               right_start: str, right_end: str, bin_size: int,
               on: list[str] | None = None,
               max_bins_per_interval: int = 10_000) -> DataFrame:
    """Inner-join each left row to every right interval containing its
    point (inclusive bounds), optionally also equi-keyed on ``on``
    columns (e.g. user_id — the extra keys ride the same hash
    exchange). Output columns: all left columns, then right's
    non-``on`` columns.

    ``bin_size`` is in the point column's normalized units:
    MICROSECONDS for timestamps, DAYS for dates, the raw value for
    numerics.
    """
    if bin_size <= 0:
        raise ValueError("bin_size must be positive")
    l_types, r_types = dict(left.dtypes), dict(right.dtypes)
    on = list(on or [])
    overlap = set(left.columns) & set(right.columns) - set(on)
    if overlap:
        raise ValueError(
            f"ambiguous columns {sorted(overlap)}; rename before joining"
        )
    p = _to_long(F.col(left_point), l_types[left_point])
    s = _to_long(F.col(right_start), r_types[right_start])
    e = _to_long(F.col(right_end), r_types[right_end])

    lb = left.withColumn("_bin", F.floor(p / bin_size))
    first_bin, last_bin = F.floor(s / bin_size), F.floor(e / bin_size)
    # the guard lives INSIDE the sequence bound so it cannot be pruned
    guarded_last = F.when(
        last_bin - first_bin + 1 > max_bins_per_interval,
        F.raise_error(F.format_string(
            "range_join: interval spans more than %s bins; raise "
            "bin_size or split the interval",
            F.lit(str(max_bins_per_interval)))).cast("long"),
    ).otherwise(last_bin)
    rb = right.withColumn(
        "_bin", F.explode(F.sequence(first_bin, guarded_last))
    )
    cond = [lb["_bin"] == rb["_bin"]] + [lb[c] == rb[c] for c in on]
    exact = (
        _to_long(lb[left_point], l_types[left_point])
        .between(_to_long(rb[right_start], r_types[right_start]),
                 _to_long(rb[right_end], r_types[right_end]))
    )
    joined = lb.join(rb, [*cond, exact], "inner")
    return joined.select(
        *[lb[c] for c in left.columns],
        *[rb[c] for c in right.columns if c not in on],
    )
