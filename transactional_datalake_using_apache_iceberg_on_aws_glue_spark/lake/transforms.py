"""Partition transforms — Iceberg's hidden partitioning over parquet.

The reference's Iceberg table is partitioned by a raw column, but
Iceberg's real partitioning model is a TRANSFORM of a source column
(``days(ts)``, ``bucket(16, id)``, ``truncate(4, s)``): the table
derives the partition value itself at write time, readers never see
the derived column, and a predicate on the SOURCE column prunes
partitions because every transform declares how predicates project
through it (Iceberg spec, "Partition Transforms"; the reference gets
this from the runtime jar it loads, /root/reference/src/main/python/
spark_sql_merge_into_iceberg.py:51-63).

Each transform provides:

- ``expr_for_type(dtype)`` — the Spark Column deriving the partition
  value from the source column (evaluated at WRITE, JVM-side, no UDF);
- ``decode(token)`` — partition directory token -> comparable value;
- ``project(op, value, dtype)`` — map a predicate on the source column
  into the partition-value space, or None when the transform cannot
  soundly prune that op (e.g. a range over ``bucket``). Monotone
  transforms (days/months/hours/truncate) project ranges NON-strictly:
  ``src > v`` becomes ``part >= T(v)``, because other rows of T(v)'s
  partition may still satisfy the source predicate.

Pruning through a projected predicate is sound by the transform
contract: T monotone non-decreasing ⇒ ``src op v`` implies
``T(src) op' T(v)``, so a partition failing op' holds no matching row.
A scan still re-applies the ORIGINAL predicate to the rows it reads —
projection only shrinks IO, never decides rows.

``bucket`` reimplements Spark's ``F.hash`` (Murmur3_x86_32, seed 42)
for int/long/date/timestamp so the planner can compute a literal's
bucket without running a Spark job; parity with ``F.hash`` is tested
in tests/test_transforms.py. Types we don't reimplement (strings,
floats) simply never prune — always sound.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH_D = _dt.date(1970, 1, 1)
_EPOCH_TS = _dt.datetime(1970, 1, 1)

#: strict range ops weaken to their non-strict floor under a monotone,
#: many-to-one transform
_RANGE_FLOOR = {">": ">=", ">=": ">=", "<": "<=", "<=": "<="}

_INT32_TYPES = {"int", "integer", "smallint", "short", "tinyint", "byte", "date"}
_INT64_TYPES = {"bigint", "long", "timestamp", "timestamp_ntz"}


# -- Murmur3_x86_32, exactly as Spark's hash() applies it ------------------

def _mask32(x: int) -> int:
    return x & 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    x = _mask32(x)
    return _mask32((x << r) | (x >> (32 - r)))


def _mix_k1(k1: int) -> int:
    k1 = _mask32(k1 * 0xCC9E2D51)
    return _mask32(_rotl32(k1, 15) * 0x1B873593)


def _mix_h1(h1: int, k1: int) -> int:
    h1 = _rotl32(h1 ^ k1, 13)
    return _mask32(h1 * 5 + 0xE6546B64)


def _fmix(h1: int, length: int) -> int:
    h1 = _mask32(h1 ^ length)
    h1 ^= h1 >> 16
    h1 = _mask32(h1 * 0x85EBCA6B)
    h1 ^= h1 >> 13
    h1 = _mask32(h1 * 0xC2B2AE35)
    return h1 ^ (h1 >> 16)


def _signed32(x: int) -> int:
    x = _mask32(x)
    return x - (1 << 32) if x >= (1 << 31) else x


def murmur3_int(value: int, seed: int = 42) -> int:
    """Spark ``hash()`` of an int/short/byte/date (one round, len 4)."""
    return _signed32(_fmix(_mix_h1(_mask32(seed), _mix_k1(_mask32(value))), 4))


def murmur3_long(value: int, seed: int = 42) -> int:
    """Spark ``hash()`` of a long/timestamp (low then high word, len 8)."""
    v = value & 0xFFFFFFFFFFFFFFFF
    h1 = _mix_h1(_mask32(seed), _mix_k1(_mask32(v)))
    h1 = _mix_h1(h1, _mix_k1(_mask32(v >> 32)))
    return _signed32(_fmix(h1, 8))


def spark_hash_value(value, dtype: str | None) -> int | None:
    """``F.hash(lit(value))`` as the given Spark column type, computed
    driver-side; None when the type isn't reimplemented (no pruning)."""
    if isinstance(value, bool):
        return None
    if isinstance(value, _dt.datetime):
        if value.tzinfo is not None:
            value = value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return murmur3_long(int((value - _EPOCH_TS).total_seconds() * 1_000_000))
    if isinstance(value, _dt.date):
        return murmur3_int((value - _EPOCH_D).days)
    if isinstance(value, int):
        if dtype in _INT32_TYPES:
            return murmur3_int(value)
        if dtype in _INT64_TYPES or dtype is None:
            return murmur3_long(value)
    return None


# -- transforms -------------------------------------------------------------

@dataclass(frozen=True)
class Transform:
    """Base/identity: partition BY the raw column (the reference's
    ``PARTITIONED BY (event)``). Identity keeps the column visible."""

    source_col: str

    hidden = False

    @property
    def partition_col(self) -> str:
        return self.source_col

    def expr_for_type(self, dtype: str) -> Column:
        return F.col(self.source_col)

    def partition_dtype(self, src_dtype: str) -> str:
        """Spark type of the derived partition column."""
        return src_dtype

    def to_dict(self) -> dict:
        """JSON form for manifests (partition-spec evolution records
        each snapshot's spec; ``transform_from_dict`` round-trips)."""
        return {"kind": type(self).__name__, "source_col": self.source_col}

    def decode(self, token: str | None):
        return token

    def project(self, op: str, value, dtype: str | None = None):
        return None  # identity pruning is the planner's own = / in path


@dataclass(frozen=True)
class _TimeTransform(Transform):
    """days/months/hours: a fixed-width, lexically ordered string
    derived from a date/timestamp column — lexical comparison of
    tokens IS chronological comparison, so range projection is free."""

    fmt = ""          # Spark date_format pattern
    strf = ""         # equivalent strftime pattern
    suffix = ""

    hidden = True

    @property
    def partition_col(self) -> str:
        # a NESTED source (dotted path, r5) derives a TOP-LEVEL
        # partition column — dots are flattened out of its name so the
        # hive directory token and F.col stay unambiguous
        return f"{self.source_col.replace('.', '_')}_{self.suffix}"

    def expr_for_type(self, dtype: str) -> Column:
        return F.date_format(F.col(self.source_col), self.fmt)

    def partition_dtype(self, src_dtype: str) -> str:
        return "string"

    def _apply(self, value) -> str | None:
        """Literal -> partition token, or None when the literal can't be
        interpreted (no pruning — always sound). ISO-format strings are
        accepted because Spark itself coerces string literals against
        date/timestamp columns, so callers legitimately pass them."""
        if isinstance(value, str):
            try:
                value = _dt.datetime.fromisoformat(value)
            except ValueError:
                return None
        if isinstance(value, _dt.datetime):
            if value.tzinfo is not None:
                value = value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        elif isinstance(value, _dt.date):
            value = _dt.datetime(value.year, value.month, value.day)
        else:
            return None
        return value.strftime(self.strf)

    def project(self, op: str, value, dtype: str | None = None):
        if op == "=":
            t = self._apply(value)
            return None if t is None else ("=", t)
        if op == "in":
            ts = {self._apply(v) for v in value}
            return None if None in ts else ("in", ts)
        if op in _RANGE_FLOOR:
            t = self._apply(value)
            return None if t is None else (_RANGE_FLOOR[op], t)
        return None


@dataclass(frozen=True)
class days(_TimeTransform):  # noqa: N801 — matches Iceberg's spelling
    fmt = "yyyy-MM-dd"
    strf = "%Y-%m-%d"
    suffix = "day"


@dataclass(frozen=True)
class months(_TimeTransform):  # noqa: N801
    fmt = "yyyy-MM"
    strf = "%Y-%m"
    suffix = "month"


@dataclass(frozen=True)
class hours(_TimeTransform):  # noqa: N801
    fmt = "yyyy-MM-dd-HH"
    strf = "%Y-%m-%d-%H"
    suffix = "hour"


@dataclass(frozen=True)
class truncate(Transform):  # noqa: N801
    """Iceberg ``truncate[W]``: ints floor to a multiple of W
    (``v - pmod(v, W)``), strings keep a W-char prefix. Both are
    monotone, so ranges project non-strictly; prefix dominance makes
    the string case lexically sound (s >= v ⇒ s[:W] >= v[:W])."""

    width: int = 1

    hidden = True

    @property
    def partition_col(self) -> str:
        return f"{self.source_col.replace('.', '_')}_trunc"

    def expr_for_type(self, dtype: str) -> Column:
        c = F.col(self.source_col)
        if dtype == "string":
            return F.substring(c, 1, self.width)
        return (c - F.pmod(c, F.lit(self.width))).cast(dtype)

    def to_dict(self) -> dict:
        return {"kind": "truncate", "source_col": self.source_col,
                "width": self.width}

    def decode(self, token: str | None):
        if token is None:
            return None
        try:
            return int(token)
        except ValueError:
            return token

    def _apply(self, value):
        if isinstance(value, str):
            return value[: self.width]
        if isinstance(value, int) and not isinstance(value, bool):
            return value - (value % self.width)  # == pmod for width > 0
        raise TypeError(f"truncate() predicate needs int or str, got {type(value)}")

    def project(self, op: str, value, dtype: str | None = None):
        if op == "=":
            return ("=", self._apply(value))
        if op == "in":
            return ("in", {self._apply(v) for v in value})
        if op in _RANGE_FLOOR:
            return (_RANGE_FLOOR[op], self._apply(value))
        return None


@dataclass(frozen=True)
class bucket(Transform):  # noqa: N801
    """Iceberg ``bucket[N]``: ``pmod(hash(col), N)``. Only equality/IN
    predicates project (hashing destroys order); the literal's bucket
    comes from the Murmur3 reimplementation above, keeping planning a
    pure metadata operation."""

    n: int = 16

    hidden = True

    @property
    def partition_col(self) -> str:
        return f"{self.source_col.replace('.', '_')}_bucket"

    def expr_for_type(self, dtype: str) -> Column:
        return F.pmod(F.hash(F.col(self.source_col)), F.lit(self.n))

    def partition_dtype(self, src_dtype: str) -> str:
        return "int"

    def to_dict(self) -> dict:
        return {"kind": "bucket", "source_col": self.source_col, "n": self.n}

    def decode(self, token: str | None):
        return None if token is None else int(token)

    def _apply(self, value, dtype: str | None):
        h = spark_hash_value(value, dtype)
        return None if h is None else h % self.n  # Python % == pmod for n > 0

    def project(self, op: str, value, dtype: str | None = None):
        if op == "=":
            b = self._apply(value, dtype)
            return None if b is None else ("=", b)
        if op == "in":
            bs = [self._apply(v, dtype) for v in value]
            return None if any(b is None for b in bs) else ("in", set(bs))
        return None


def transform_from_dict(d: dict | None) -> Transform | None:
    """Inverse of ``Transform.to_dict`` — reconstructs the transform a
    manifest's partition spec recorded."""
    if d is None:
        return None
    kind = d["kind"]
    if kind == "Transform":
        return Transform(d["source_col"])
    if kind == "days":
        return days(d["source_col"])
    if kind == "months":
        return months(d["source_col"])
    if kind == "hours":
        return hours(d["source_col"])
    if kind == "truncate":
        return truncate(d["source_col"], d["width"])
    if kind == "bucket":
        return bucket(d["source_col"], d["n"])
    raise ValueError(f"unknown partition transform kind {kind!r}")
