"""Catalog: map the driver's Parquet testdata to named DataFrames.

The reference resolves tables through a Thrift metastore
(metastore/src/java/.../HiveMetaStore.java:232 in the reference
tree); here a table is a Parquet path registered as a temp view, and
Spark's built-in catalog supplies schema resolution. At cluster
scale the same API would point at a real catalog (Hive metastore /
Unity / Glue) — nothing else in the engine changes.
"""

from __future__ import annotations

import os
from types import SimpleNamespace

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor —
# region/nation are bounded by geography, not SF.
BROADCAST_TABLES = ("region", "nation")


# Per-session registration cache: (id(spark), sf_dir) → DataFrames.
# Re-reading 10 parquet footers per query call costs ~5s locally and
# a metastore round-trip per table on a cluster; registration is
# idempotent so caching is safe.
_LOADED: dict[tuple[int, str], dict[str, DataFrame]] = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; return the DataFrames.

    Reads are lazy — registering all ten views costs only file-footer
    reads. Filter/column pushdown happens per-query via Catalyst.
    """
    key = (id(spark), sf_dir)
    cached = _LOADED.get(key)
    if cached is not None:
        return cached
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        df = spark.read.parquet(path)
        if name == "events":
            # TIMESTAMP(NANOS) parquet is read as a raw nanos long
            # (spark.sql.legacy.parquet.nanosAsLong); truncate to
            # microseconds exactly like DuckDB does on read.
            from pyspark.sql import functions as F

            # integer DIV, not `/` — nanos exceed 2^53 so a double
            # round-trip would lose microseconds.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        df.createOrReplaceTempView(name)
        out[name] = df
    _LOADED[key] = out
    return out


def tables(spark: SparkSession, sf_dir: str) -> SimpleNamespace:
    """Attribute-style access: ``t = tables(spark, d); t.lineitem``."""
    return SimpleNamespace(**load_tables(spark, sf_dir))
