"""Z-order (Morton) clustering for compaction — multi-dimensional
data skipping over plain parquet.

A linear sort gives tight per-file [min, max] bounds on the LEADING
sort column only; predicates on any other column cannot prune files.
Interleaving the bits of several columns into one Morton key and
range-partitioning on it makes every file a small hyper-rectangle in
the clustered dimensions, so the footer bounds that ``lake/scan.py``
already harvests become selective for predicates on ANY clustered
column. Iceberg/Delta expose the same lever as ``rewrite_data_files``
with a z-order strategy; the reference would inherit it from those
runtimes — here it is a pure Spark Column expression.

100 TB design notes:

- the Morton key is built from shift/and/or BUILT-INS (whole-stage
  codegen, no UDF); the only extra cost over a plain rewrite is one
  range-exchange on the key, which a compaction pays anyway;
- normalization bounds are served by the MANIFEST's footer stats when
  every live slice carries them (``ParquetLakeTable._stats_bounds`` —
  no Spark job at all), falling back to ONE 2-row aggregate per
  clustered column (driver-bounded metadata, not data);
- ``repartitionByRange`` samples the key to build balanced range
  boundaries — skew in the clustered columns becomes file-count skew,
  not task skew.

Only soundly-orderable numeric/temporal columns participate (same
rule as the stats pruner: strings are truncation-unsafe). 16 bits per
dimension bounds the key at 64 bits for up to 4 columns.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS_DEFAULT = 16
_ORDERABLE = ("int", "bigint", "smallint", "tinyint", "double", "float",
              "date", "timestamp", "timestamp_ntz", "decimal")


def _as_long(col: Column, dtype: str) -> Column:
    """Map an orderable column onto a monotone LongType axis."""
    if dtype.startswith("date"):
        return F.datediff(col, F.lit("1970-01-01")).cast("long")
    if dtype.startswith("timestamp"):
        return F.unix_micros(col.cast("timestamp"))
    return col.cast("double").cast("long") if dtype.startswith(
        ("double", "float", "decimal")) else col.cast("long")


def _check_columns(df: DataFrame, cols: list[str]) -> dict[str, str]:
    dtypes = dict(df.dtypes)
    out = {}
    for c in cols:
        if c not in dtypes:
            raise ValueError(f"cluster column {c!r} not in schema")
        if not dtypes[c].startswith(_ORDERABLE):
            raise ValueError(
                f"cluster column {c!r} has type {dtypes[c]} — only "
                "numeric/temporal columns are soundly orderable "
                "(string min/max may be truncated in parquet footers)"
            )
        out[c] = dtypes[c]
    return out


def zorder_key(df: DataFrame, cols: list[str],
               bits: int = ZBITS_DEFAULT,
               bounds: dict | None = None) -> Column:
    """A LongType Morton key interleaving ``bits`` bits of each column
    in ``cols`` (2-4 columns). Bounds for the fixed-point
    normalization come from ``bounds`` (``{col: (lo, hi)}`` on the
    long axis — e.g. served by the table manifest's footer stats, so
    a compaction launches no bounds job) or, absent that, one tiny
    aggregate over ``df``. Bounds only NORMALIZE: the code expression
    clamps to [0, 2^bits-1], so under-covering bounds degrade
    clustering tightness, never correctness."""
    if not 2 <= len(cols) <= 4:
        raise ValueError("z-order needs 2-4 columns")
    if bits * len(cols) > 63:
        bits = 63 // len(cols)
    dtypes = _check_columns(df, cols)
    axes = {c: _as_long(F.col(c), dtypes[c]) for c in cols}
    if bounds is not None and all(c in bounds for c in cols):
        bounds_row = {}
        for i, c in enumerate(cols):
            bounds_row[f"lo_{i}"], bounds_row[f"hi_{i}"] = bounds[c]
    else:
        bounds_row = df.agg(
            *[F.min(axes[c]).alias(f"lo_{i}") for i, c in enumerate(cols)],
            *[F.max(axes[c]).alias(f"hi_{i}") for i, c in enumerate(cols)],
        ).collect()[0]
    max_code = (1 << bits) - 1
    scaled = []
    for i, c in enumerate(cols):
        lo, hi = bounds_row[f"lo_{i}"], bounds_row[f"hi_{i}"]
        if lo is None or hi is None or hi <= lo:
            scaled.append(F.lit(0).cast("long"))
            continue
        # fixed-point rank on [lo, hi] -> [0, 2^bits - 1]; the double
        # detour keeps the scale multiply from overflowing long for
        # wide domains (epoch micros)
        frac = (axes[c].cast("double") - float(lo)) / float(hi - lo)
        code = F.least(
            F.greatest((frac * max_code).cast("long"), F.lit(0)),
            F.lit(max_code),
        )
        scaled.append(F.coalesce(code, F.lit(0)))
    n = len(cols)
    terms = []
    for b in range(bits):
        for i in range(n):
            bit = F.shiftright(scaled[i], b).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, b * n + i))
    return reduce(Column.bitwiseOR, terms).alias("_zorder")


def cluster_files(df: DataFrame, cols: list[str], n_files: int,
                  partition_col: str | None = None,
                  bits: int = ZBITS_DEFAULT,
                  bounds: dict | None = None) -> DataFrame:
    """Lay ``df`` out as ~``n_files`` files whose footer bounds are
    tight hyper-rectangles over ``cols``: range-partition on
    (partition_col?, morton_key) and sort within partitions so row
    groups inherit the clustering too. The helper column is dropped
    before the write; dropping a projection does not reorder rows."""
    z = zorder_key(df, cols, bits, bounds=bounds)
    keyed = df.withColumn("_zcluster", z)
    range_cols = ([partition_col] if partition_col else []) + ["_zcluster"]
    return (
        keyed.repartitionByRange(max(1, n_files), *range_cols)
        .sortWithinPartitions(*range_cols)
        .drop("_zcluster")
    )
