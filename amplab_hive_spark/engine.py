"""Engine facade — the user-facing API surface.

Mirrors the reference's top-3 entry points (SURVEY.md §3.1: CLI,
HiveServer2, programmatic Driver.run) with a single programmatic
facade: ``Engine.sql`` replaces Driver.run's parse→analyze→optimize→
execute pipeline with Spark SQL end-to-end (reference:
ql/Driver.java:1041 → here: Catalyst).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional

from pyspark.sql import DataFrame, SparkSession

from amplab_hive_spark.catalog import load_tables
from amplab_hive_spark.session import get_spark


class Engine:
    """Thin session+catalog wrapper: ``sql``, ``table``,
    ``register_function``, ``append_batch``, ``explain``.
    """

    def __init__(self, spark: Optional[SparkSession] = None, sf_dir: Optional[str] = None):
        self.spark = spark or get_spark()
        self.sf_dir = sf_dir
        if sf_dir:
            self.attach(sf_dir)

    def attach(self, sf_dir: str) -> "Engine":
        """Register the testdata tables under this session's catalog."""
        self.sf_dir = sf_dir
        load_tables(self.spark, sf_dir)
        return self

    def sql(self, text: str) -> DataFrame:
        """Run a SQL statement (Spark SQL dialect; HiveQL ~98% compatible)."""
        return self.spark.sql(text)

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def register_function(self, name: str, fn: Callable[..., Any], return_type: Any) -> None:
        """CREATE TEMPORARY FUNCTION equivalent (reference:
        ql/parse/FunctionSemanticAnalyzer.java)."""
        self.spark.udf.register(name, fn, return_type)

    def append_batch(self, rows: Iterable[Any] | DataFrame, table_path: str, schema=None) -> None:
        """Transactional micro-batch ingest (reference surface:
        hcatalog/streaming TransactionBatch). Delegates to
        streaming.ingest — atomic visibility via the Parquet
        file-commit protocol."""
        from amplab_hive_spark.streaming.ingest import append_batch

        append_batch(self.spark, rows, table_path, schema=schema)

    def explain(self, df_or_sql: DataFrame | str, mode: str = "formatted") -> str:
        df = self.sql(df_or_sql) if isinstance(df_or_sql, str) else df_or_sql
        return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)  # type: ignore[attr-defined]
