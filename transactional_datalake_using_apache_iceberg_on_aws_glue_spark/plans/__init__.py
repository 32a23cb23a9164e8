"""Plan introspection helpers (SURVEY §4): the engine's optimizer is
Catalyst; this module makes its decisions observable and assertable so
plan hygiene (pushdown, broadcast, top-k, codegen) is tested instead of
hoped for."""

from .explain import (
    executed_plan,
    has_broadcast_join,
    has_cartesian,
    has_take_ordered,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
    wholestage_codegen_spans,
)

__all__ = [
    "executed_plan",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "has_cartesian",
    "has_take_ordered",
    "shuffle_count",
    "wholestage_codegen_spans",
]
