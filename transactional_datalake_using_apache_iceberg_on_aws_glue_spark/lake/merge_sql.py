"""SQL ``MERGE INTO`` front-end for :class:`ParquetLakeTable`.

The reference's whole write path is two Spark SQL statements
(/root/reference/src/main/python/spark_sql_merge_into_iceberg.py:118-122
and :133-136)::

    MERGE INTO cat.db.t t USING t_upsert s ON s.pk = t.pk
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *

    MERGE INTO cat.db.t t USING t_delete s ON s.pk = t.pk
    WHEN MATCHED THEN DELETE

Plain Spark cannot execute MERGE INTO against parquet — the statement
needs a row-level-operation-capable catalog (the Iceberg jar this
image lacks; ``lake/iceberg.py`` covers the jar-equipped deployment).
This module closes the gap for the manual engine: ``MergeSqlRunner``
parses exactly this statement family and routes it to
``ParquetLakeTable.merge``, so a reference user's MERGE SQL runs
verbatim, jar or no jar.

Supported grammar (a deliberate, validated subset — anything else
raises with a pointer to what IS supported)::

    MERGE INTO <ident> [AS] t USING <view> [AS] s
    ON s.<k> = t.<k> [AND s.<k2> = t.<k2> ...]
    [WHEN MATCHED [AND <src-cond>] THEN DELETE]
    [WHEN MATCHED [AND <src-cond>] THEN UPDATE SET *]
    [WHEN NOT MATCHED [AND <src-cond>] THEN INSERT *]

- the ON clause must be key equalities over the table's declared
  ``key_cols`` (MERGE's only sound join for a keyed CDC table);
- clause conditions may reference SOURCE columns only (``s.x = 'y'``):
  they are evaluated on the batch before the merge. Target-side
  conditions would need the pre-merge row images, which the engine's
  latest-wins semantics already subsume (T4 guard);
- UPDATE SET * / INSERT * only (full row images — what DMS emits and
  the only forms the reference uses).

Execution maps clauses onto the engine's one-pass merge: rows
matching a DELETE clause's condition become ``_op='delete'``, rows
admitted by UPDATE/INSERT clauses ``_op='upsert'``, rows admitted by
neither are dropped — then one ``table.merge`` call applies the
batch with the usual single-shuffle plan. The two reference
statements therefore collapse into at most one rewrite per call
instead of two.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constants import OP_COL
from .table import ParquetLakeTable

_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<target>[\w.`]+)\s+(?:AS\s+)?(?P<talias>\w+)\s+"
    r"USING\s+(?P<source>[\w.`]+)\s+(?:AS\s+)?(?P<salias>\w+)\s+"
    r"ON\s+(?P<on>.+?)\s*(?P<clauses>WHEN\s+.+)$",
    re.IGNORECASE | re.DOTALL,
)
_CLAUSE_RE = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED\s*(?:AND\s+(?P<cond>.+?))?\s*THEN\s+"
    r"(?P<action>DELETE|UPDATE\s+SET\s+\*|INSERT\s+\*)",
    re.IGNORECASE | re.DOTALL,
)


class MergeSqlError(ValueError):
    """Statement outside the supported MERGE INTO subset."""


class MergeSqlRunner:
    """Executes MERGE INTO statements against registered
    :class:`ParquetLakeTable` targets (identifier -> table). Source
    relations resolve through the session catalog (temp views, exactly
    how the reference stages its per-batch frames)."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._tables: dict[str, ParquetLakeTable] = {}

    def register(self, identifier: str, table: ParquetLakeTable) -> None:
        """Map a (possibly multi-part) SQL identifier to a lake table."""
        self._tables[self._norm_ident(identifier)] = table

    @staticmethod
    def _norm_ident(ident: str) -> str:
        return ident.replace("`", "").strip().lower()

    def sql(self, statement: str) -> None:
        """Parse and execute one MERGE INTO statement."""
        m = _MERGE_RE.match(statement)
        if not m:
            raise MergeSqlError(
                "unsupported statement; expected MERGE INTO <t> t USING "
                "<s> s ON ... WHEN [NOT] MATCHED [AND cond] THEN "
                "DELETE | UPDATE SET * | INSERT *"
            )
        target = self._norm_ident(m.group("target"))
        if target not in self._tables:
            raise MergeSqlError(
                f"unknown MERGE target {m.group('target')!r}; "
                f"registered: {sorted(self._tables)}"
            )
        table = self._tables[target]
        talias, salias = m.group("talias"), m.group("salias")
        self._check_on(m.group("on"), table, talias, salias)

        clauses = list(_CLAUSE_RE.finditer(m.group("clauses")))
        if not clauses:
            raise MergeSqlError("no WHEN clauses found")
        delete_cond = upsert_cond = None
        has_update = has_insert = False
        for c in clauses:
            cond = self._src_condition(c.group("cond"), salias, talias)
            action = re.sub(r"\s+", " ", c.group("action")).upper()
            if action == "DELETE":
                if c.group("not"):
                    raise MergeSqlError("WHEN NOT MATCHED THEN DELETE "
                                        "is not meaningful")
                delete_cond = cond if cond is not None else F.lit(True)
            elif action == "UPDATE SET *":
                has_update = True
                upsert_cond = self._or(upsert_cond,
                                       cond if cond is not None else F.lit(True))
            else:  # INSERT *
                has_insert = True
                upsert_cond = self._or(upsert_cond,
                                       cond if cond is not None else F.lit(True))
        src = self.spark.table(m.group("source"))
        batch = self._to_op_batch(src, delete_cond, upsert_cond,
                                  has_update or has_insert)
        table.merge(batch)

    # -- pieces ----------------------------------------------------------

    def _check_on(self, on: str, table: ParquetLakeTable,
                  talias: str, salias: str) -> None:
        keys = set()
        for part in re.split(r"\s+AND\s+", on, flags=re.IGNORECASE):
            eq = re.match(
                rf"^\s*(?:{salias}|{talias})\.(\w+)\s*=\s*"
                rf"(?:{salias}|{talias})\.(\w+)\s*$",
                part, re.IGNORECASE,
            )
            if not eq or eq.group(1).lower() != eq.group(2).lower():
                raise MergeSqlError(
                    f"ON must be key equalities s.k = t.k; got {part!r}"
                )
            keys.add(eq.group(1))
        if keys != set(table.key_cols):
            raise MergeSqlError(
                f"ON keys {sorted(keys)} != table key_cols "
                f"{sorted(table.key_cols)}"
            )

    @staticmethod
    def _src_condition(cond: str | None, salias: str, talias: str):
        if cond is None:
            return None
        if re.search(rf"\b{talias}\.", cond, re.IGNORECASE):
            raise MergeSqlError(
                "clause conditions may reference source columns only "
                f"(the engine's latest-wins merge already orders against "
                f"the target); got {cond!r}"
            )
        return F.expr(re.sub(rf"\b{salias}\.", "", cond, flags=re.IGNORECASE))

    @staticmethod
    def _or(a, b):
        return b if a is None else (a | b)

    @staticmethod
    def _to_op_batch(src: DataFrame, delete_cond, upsert_cond,
                     any_upsert: bool) -> DataFrame:
        if OP_COL in src.columns:
            base = src
        else:
            base = src.withColumn(OP_COL, F.lit("upsert"))
        op = F.col(OP_COL)
        if delete_cond is not None:
            op = F.when(delete_cond, F.lit("delete")).otherwise(op)
        batch = base.withColumn(OP_COL, op)
        if delete_cond is not None and not any_upsert:
            # delete-only statement (reference :133-136): non-matching
            # source rows take no action
            batch = batch.filter(delete_cond)
        elif upsert_cond is not None and delete_cond is not None:
            batch = batch.filter(delete_cond | upsert_cond)
        elif upsert_cond is not None:
            batch = batch.filter(upsert_cond)
        return batch
