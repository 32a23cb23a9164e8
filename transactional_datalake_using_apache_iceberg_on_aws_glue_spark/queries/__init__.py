"""Analytic query surface (SURVEY §2 read-side + M3/M4).

Each query is registered as a ``QuerySpec`` pairing a Spark DataFrame
builder with the equivalent DuckDB oracle SQL; `__spark_entry__.py`
exposes the registry to the harness. Builders take ``(spark, sf_dir)``.

Alias discipline: every computed column is aliased identically in the
Spark builder and the oracle SQL (the harness hashes values after
sorting columns by name). Doubles are rounded (4-6 dp) on BOTH sides so
cross-engine float-summation-order noise cannot flip the hash.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None => not SQL-expressible; rows-only check
    doc: str = ""
    tags: tuple = ()


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], doc: str = "", tags: tuple = ()):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc, tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect registration) and return the
    registry."""
    from . import (  # noqa: F401
        events,
        lake,
        llmops,
        multimodal,
        relational,
        scalars,
        text,
        vectors,
    )

    return REGISTRY
