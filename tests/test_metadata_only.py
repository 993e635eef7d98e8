"""Metadata-only query shapes (reference clientpositive/
metadataonly1.q; MetadataOnlyOptimizer.java) — round-4 verdict task 7.

Hive answers partition-column-only aggregates (max(ds),
count(distinct ds), distinct ds) from partition SPECS without reading
data. Spark deliberately removed that rewrite because it is WRONG
when a partition exists with zero rows (metadata says the value
exists, the data says it doesn't). This engine therefore ships BOTH
answers explicitly:

- data path: normal SQL — Spark reads only the partition columns
  (ReadSchema contains no payload fields; gated below);
- metadata path: ``ddl.partition_values`` — one SHOW PARTITIONS
  catalog call, zero data-file scan (gated below: no FileScan at
  all).

Parity when all partitions are non-empty is TESTED, and the
empty-partition divergence that motivated Spark's removal is PINNED,
not hidden.
"""

import pytest
from pyspark.sql import functions as F

from amplab_hive_spark import ddl
from amplab_hive_spark.catalog import tables


@pytest.fixture(scope="module")
def meta_tables(spark, sf_dir, tmp_path_factory):
    """TEST1(ds)-/TEST2(ds,hr)-shaped partitioned tables built from
    orders: ds = orderstatus, hr = orderpriority."""
    base = tmp_path_factory.mktemp("meta_only")
    t = tables(spark, sf_dir)
    src = t.orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("v"),
        F.col("o_orderstatus").alias("ds"),
        F.col("o_orderpriority").alias("hr"),
    )
    spark.sql("DROP TABLE IF EXISTS meta_t1")
    spark.sql("DROP TABLE IF EXISTS meta_t2")
    ddl.create_table_as(spark, "meta_t1", src.drop("hr"), f"{base}/t1", partition_by=["ds"])
    ddl.create_table_as(spark, "meta_t2", src, f"{base}/t2", partition_by=["ds", "hr"])
    yield src
    spark.sql("DROP TABLE IF EXISTS meta_t1")
    spark.sql("DROP TABLE IF EXISTS meta_t2")


def test_partition_values_reads_no_data_files(spark, meta_tables):
    pv = ddl.partition_values(spark, "meta_t1")
    plan = pv._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan, f"metadata path must not scan data:\n{plan}"
    assert [f.name for f in pv.schema.fields] == ["ds"]


def test_metadata_matches_data_when_partitions_nonempty(spark, meta_tables):
    """metadataonly1.q shapes: max(ds), count(distinct ds),
    distinct ds, min/max — metadata and data paths must agree while
    every partition holds rows."""
    pv = ddl.partition_values(spark, "meta_t1")
    meta = pv.agg(
        F.max("ds").alias("mx"),
        F.min("ds").alias("mn"),
        F.countDistinct("ds").alias("nd"),
    ).collect()[0]
    data = spark.sql(
        "SELECT max(ds) AS mx, min(ds) AS mn, count(DISTINCT ds) AS nd FROM meta_t1"
    ).collect()[0]
    assert (meta.mx, meta.mn, meta.nd) == (data.mx, data.mn, data.nd)
    assert sorted(r.ds for r in pv.distinct().collect()) == sorted(
        r.ds for r in spark.sql("SELECT DISTINCT ds FROM meta_t1").collect()
    )


def test_two_level_partition_counts(spark, meta_tables):
    """metadataonly1.q TEST2 shape: per-ds count(distinct hr) from
    specs == from data (all partitions non-empty)."""
    meta = {
        (r.ds): r.nd
        for r in ddl.partition_values(spark, "meta_t2")
        .groupBy("ds")
        .agg(F.countDistinct("hr").alias("nd"))
        .collect()
    }
    data = {
        (r.ds): r.nd
        for r in spark.sql(
            "SELECT ds, count(DISTINCT hr) AS nd FROM meta_t2 GROUP BY ds"
        ).collect()
    }
    assert meta == data and len(meta) == 3


def test_join_against_max_partition_subquery(spark, meta_tables):
    """metadataonly1.q join shape: t JOIN (SELECT max(ds) m) ON
    t.ds = m — counts rows of the max partition."""
    got = spark.sql(
        "SELECT count(*) AS n FROM meta_t1 a2 "
        "JOIN (SELECT max(ds) AS m FROM meta_t1) b ON a2.ds = b.m"
    ).collect()[0].n
    src = meta_tables
    mx = src.agg(F.max("ds")).collect()[0][0]
    assert got == src.filter(F.col("ds") == mx).count() and got > 0


def test_partition_only_scan_reads_zero_payload_columns(spark, meta_tables):
    """Data-path partition-only aggregate: the parquet scan must
    request NO payload columns (ReadSchema struct<>) — column pruning
    down to nothing, the Spark-native version of metadata-only."""
    df = spark.sql("SELECT max(ds) AS mx FROM meta_t1")
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert read_schema.strip() == "struct<>", read_schema
    assert df.collect()[0].mx is not None


def test_empty_partition_divergence_is_real(spark, meta_tables):
    """The reason this is an explicit API, pinned: add a partition
    with ZERO rows whose ds sorts above every real value. Metadata
    sees it; data does not. (Hive's metadata-only answer would be
    'Z' — the wrong-answer class that got OptimizeMetadataOnlyQuery
    removed from Spark.)"""
    spark.sql("ALTER TABLE meta_t1 ADD IF NOT EXISTS PARTITION (ds = 'Z')")
    try:
        meta_max = ddl.partition_values(spark, "meta_t1").agg(F.max("ds")).collect()[0][0]
        data_max = spark.sql("SELECT max(ds) FROM meta_t1").collect()[0][0]
        assert meta_max == "Z"
        assert data_max != "Z", "empty partition must not contribute data rows"
    finally:
        spark.sql("ALTER TABLE meta_t1 DROP IF EXISTS PARTITION (ds = 'Z')")


def test_partition_values_rejects_unpartitioned(spark, sf_dir):
    tables(spark, sf_dir)
    spark.sql("DROP TABLE IF EXISTS meta_flat")
    spark.range(3).write.saveAsTable("meta_flat")
    try:
        with pytest.raises(ValueError, match="not partitioned"):
            ddl.partition_values(spark, "meta_flat")
    finally:
        spark.sql("DROP TABLE IF EXISTS meta_flat")
