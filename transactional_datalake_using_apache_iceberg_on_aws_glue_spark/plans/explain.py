"""Physical-plan inspection over the py4j boundary.

These helpers parse ``queryExecution`` output — the same text
``df.explain("formatted")`` prints — into assertable facts. Used by
tests/test_plans.py to pin the plan properties that matter at 100 TB:

- filters reach the parquet scan (PushedFilters non-empty);
- scans are column-pruned (ReadSchema ⊂ table schema);
- small dimensions broadcast (BroadcastHashJoin, not SortMergeJoin);
- global top-k plans TakeOrderedAndProject (no full sort);
- hot paths stay inside WholeStageCodegen spans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _full_explain(df: DataFrame) -> str:
    return df._jdf.queryExecution().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans.

    Plan text may truncate long filter lists with '...' before the
    closing bracket (and In-list filters nest brackets), so parse to
    end-of-segment rather than requiring a well-formed ']'."""
    text = _full_explain(df)
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\n]*)", text):
        body = m.group(1)
        # stop at ", ReadSchema" (same line) if present, else EOL
        body = body.split(", ReadSchema")[0].rstrip()
        body = body.rstrip("]").rstrip(".")
        if body.strip():
            out.extend(p.strip() for p in body.split(",") if p.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (pruning check).
    Plan text may truncate long schemas with '...', so parse to
    end-of-line and drop a trailing partial field."""
    text = _full_explain(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^\n]*)", text):
        body = m.group(1).rstrip()
        body = body[:-1] if body.endswith(">") else body
        fields = [c for c in body.split(",") if c.strip()]
        if body.endswith("..."):
            fields = fields[:-1]
        schemas.append({c.split(":")[0].strip() for c in fields})
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in executed_plan(df)


def has_cartesian(df: DataFrame) -> bool:
    """True when the plan contains a cartesian/nested-loop product —
    the join shape that must never appear in a hot path."""
    p = executed_plan(df)
    return "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators (each is a full shuffle stage)."""
    return len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning",
                          executed_plan(df)))


def wholestage_codegen_spans(df: DataFrame, execute: bool = True) -> int:
    """Distinct WholeStageCodegen span ids, parsed from formatted
    explain. Under AQE the final plan (and its codegen markers) only
    exists after execution, so by default the plan is forced first."""
    import contextlib
    import io

    if execute and "isFinalPlan=false" in executed_plan(df):
        # a .collect() on THIS df finalizes its own QueryExecution under
        # AQE (a write/count would plan a separate one); callers pass
        # small result sets here
        df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return len(set(re.findall(r"codegen id : (\d+)", buf.getvalue())))
