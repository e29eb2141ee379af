"""Central query registry — the SURVEY.md §2 operator inventory.

Each operator module registers its queries with the ``@register``
decorator; ``all_specs()`` imports every operator module (idempotent) and
returns the merged registry. ``__spark_entry__.py`` derives its
``queries()`` / ``oracle_sql()`` dicts from here, so a query is "declared"
to the driver exactly when its module registers it.

Determinism contract for every registered query (SURVEY §5.3): float
outputs rounded 4-6dp on both sides, every ORDER BY ends in a unique key,
integer SUMs cast to BIGINT in the oracle, no raw nanosecond timestamps
emitted, computed columns aliased identically in Spark and SQL.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Operator modules that populate the registry on import.
_OPERATOR_MODULES = [
    "scans",
    "scalars",
    "experiment",
    "storage",
    "etl",
    "graph",
    "joins",
    "aggregates",
    "windows",
    "sorts",
    "setops",
    "text",
    "llmtext",
    "vectors",
    "udfs",
    "events_windows",
    "streaming_ops",
    "multimodal",
    "ml",
]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB ANSI SQL; None => rows-only check
    tier: str  # P0 / P1 / P2
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def register(
    name: str, oracle: str | None = None, tier: str = "P1", doc: str = ""
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, tier, doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(f"sd2_drp_experimentgen_spark.operators.{mod}")
    _LOADED = True


def all_specs() -> dict[str, QuerySpec]:
    _load()
    return dict(_REGISTRY)


def get_spec(name: str) -> QuerySpec:
    _load()
    return _REGISTRY[name]
