"""Query registry: the single source of truth for the engine's
query inventory, consumed by ``__spark_entry__.py`` (driver
contract), ``bench.py`` and the parity tests.

Each entry pairs a Spark implementation (a callable
``(spark, sf_dir) -> DataFrame``) with an optional DuckDB oracle SQL
string. Queries without an oracle are genuinely non-SQL-expressible
(custom stateful/streaming/iterative ops) and get the driver's
weaker rows-only check.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str] = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # headline query included in bench.py


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: Optional[str] = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query implementation."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tuple(tags), bench=bench)
        return fn

    return deco


def _load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    # Imports are for their registration side effects.
    import amplab_hive_spark.operators.relational  # noqa: F401
    import amplab_hive_spark.operators.grouping  # noqa: F401
    import amplab_hive_spark.operators.windows  # noqa: F401
    import amplab_hive_spark.operators.subqueries  # noqa: F401
    import amplab_hive_spark.operators.lateral  # noqa: F401
    import amplab_hive_spark.operators.matchpath  # noqa: F401
    import amplab_hive_spark.operators.sql_surface  # noqa: F401
    import amplab_hive_spark.operators.setops  # noqa: F401
    import amplab_hive_spark.operators.tpch_suite  # noqa: F401
    import amplab_hive_spark.functions.scalar_queries  # noqa: F401
    import amplab_hive_spark.functions.hive_compat  # noqa: F401
    import amplab_hive_spark.functions.macros  # noqa: F401
    import amplab_hive_spark.functions.semantics  # noqa: F401
    import amplab_hive_spark.llm.dedup  # noqa: F401
    import amplab_hive_spark.llm.components  # noqa: F401
    import amplab_hive_spark.llm.pipeline  # noqa: F401
    import amplab_hive_spark.llm.similarity  # noqa: F401
    import amplab_hive_spark.llm.text  # noqa: F401
    import amplab_hive_spark.llm.multimodal  # noqa: F401
    import amplab_hive_spark.streaming.event_windows  # noqa: F401


def all_queries() -> dict[str, QuerySpec]:
    _load_all_modules()
    return dict(_REGISTRY)
