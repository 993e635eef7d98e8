"""Storage formats (SURVEY §1.4) + EXPORT/IMPORT + LOAD DATA +
UDF registration + salted-join equivalence.

The reference's SerDe zoo (LazySimpleSerDe text, OpenCSVSerde, JSON,
Avro, ORC, Parquet, RCFile) maps to spark.read/write formats; RCFile
and custom SerDes are documented non-goals.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from amplab_hive_spark import ddl
from amplab_hive_spark.catalog import tables
from amplab_hive_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def io_dir(spark):
    d = tempfile.mkdtemp(prefix="io_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
    for t in ("fmt_src", "imported_nation", "load_target"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.mark.parametrize("fmt,options", [
    ("parquet", {}),
    ("orc", {}),
    ("csv", {"header": "true"}),
    ("json", {}),
])
def test_format_roundtrip(spark, sf_dir, io_dir, fmt, options):
    t = tables(spark, sf_dir)
    src = t.nation.orderBy("n_nationkey")
    path = f"{io_dir}/roundtrip_{fmt}"
    src.write.mode("overwrite").options(**options).format(fmt).save(path)
    back = spark.read.options(**options).format(fmt).load(path)
    if fmt == "csv":  # text formats are schema-on-read: re-apply types
        back = spark.read.options(**options).schema(src.schema).format(fmt).load(path)
    got = sorted((r["n_nationkey"], r["n_name"], r["n_regionkey"]) for r in back.collect())
    want = sorted((r["n_nationkey"], r["n_name"], r["n_regionkey"]) for r in src.collect())
    assert got == want


def test_text_format_lazy_simple(spark, io_dir):
    """LazySimpleSerDe text table equivalent: delimited text lines."""
    path = f"{io_dir}/textfmt"
    df = spark.createDataFrame([(i, f"row{i}") for i in range(10)], "id INT, name STRING")
    df.select(F.concat_ws("", F.col("id").cast("string"), "name").alias("value")) \
        .write.mode("overwrite").text(path)
    back = spark.read.text(path).select(
        F.split("value", "").getItem(0).cast("int").alias("id"),
        F.split("value", "").getItem(1).alias("name"),
    )
    assert sorted((r["id"], r["name"]) for r in back.collect()) == [
        (i, f"row{i}") for i in range(10)
    ]


def test_export_import(spark, sf_dir, io_dir):
    t = tables(spark, sf_dir)
    ddl.create_table_as(spark, "fmt_src", t.nation, f"{io_dir}/fmt_src")
    ddl.export_table(spark, "fmt_src", f"{io_dir}/export1")
    ddl.import_table(spark, "imported_nation", f"{io_dir}/export1", f"{io_dir}/imported_nation")
    a = sorted(r["n_name"] for r in spark.table("fmt_src").collect())
    b = sorted(r["n_name"] for r in spark.table("imported_nation").collect())
    assert a == b == sorted(r["n_name"] for r in t.nation.collect())


def test_export_import_preserves_partitioning(spark, sf_dir, io_dir):
    """Regression: export recorded only the column schema, so an
    exported PARTITIONED table silently imported as unpartitioned —
    partition_values raised 'not partitioned' and the partition-scoped
    UPDATE/DELETE paths fell back to full rewrites. The snapshot now
    carries the partition spec and import restores it."""
    t = tables(spark, sf_dir)
    ddl.create_table_as(
        spark, "exp_part", t.nation, f"{io_dir}/exp_part", partition_by=["n_regionkey"]
    )
    ddl.export_table(spark, "exp_part", f"{io_dir}/export_p")
    ddl.import_table(spark, "imp_part", f"{io_dir}/export_p", f"{io_dir}/imp_part")
    pv = sorted(r["n_regionkey"] for r in ddl.partition_values(spark, "imp_part").collect())
    assert pv == [0, 1, 2, 3, 4]
    assert spark.table("imp_part").count() == 25


def test_create_table_as_rejects_sort_without_bucket(spark, sf_dir, io_dir):
    """Spark's sortBy is bucket-local; a sort_by without bucket_by
    was silently dropped — now it raises."""
    import pytest as _pytest

    t = tables(spark, sf_dir)
    with _pytest.raises(ValueError, match="sort_by requires bucket_by"):
        ddl.create_table_as(
            spark, "bad_sort", t.nation, f"{io_dir}/bad_sort", sort_by=["n_name"]
        )


def test_load_data_csv(spark, sf_dir, io_dir):
    t = tables(spark, sf_dir)
    ddl.create_table_as(spark, "load_target", t.region.filter("1=0"), f"{io_dir}/load_target")
    csv_path = f"{io_dir}/incoming_csv"
    t.region.write.option("header", "true").mode("overwrite").csv(csv_path)
    ddl.load_data(spark, csv_path, "load_target", fmt="csv", options={"header": "true", "inferSchema": "true"})
    assert spark.table("load_target").count() == 5
    ddl.load_data(spark, csv_path, "load_target", fmt="csv", overwrite=True,
                  options={"header": "true", "inferSchema": "true"})
    assert spark.table("load_target").count() == 5


def test_register_function_surface(spark):
    """CREATE TEMPORARY FUNCTION equivalent (Engine.register_function
    → spark.udf.register; reference: FunctionSemanticAnalyzer)."""
    from amplab_hive_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.register_function("my_double", lambda x: x * 2, "bigint")
    out = spark.sql("SELECT my_double(21) AS v").first()["v"]
    assert out == 42


def test_salted_join_equivalence(spark, sf_dir):
    """Salted join returns exactly the plain join's result
    (reference skew path: SkewJoinHandler.java:74)."""
    t = tables(spark, sf_dir)
    plain = (
        t.orders.join(t.customer, t.orders["o_custkey"] == t.customer["c_custkey"])
        .groupBy("c_mktsegment")
        .count()
    )
    salted = (
        salted_join(t.orders, t.customer, "o_custkey", "c_custkey", salt=8)
        .groupBy("c_mktsegment")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_avro_documented_drop_or_roundtrip(spark, sf_dir, io_dir):
    """The ``spark-avro`` DATASOURCE module is still absent in this
    environment, and this test pins .format("avro")'s behavior: if
    present (cluster with spark.jars.packages) the round-trip must
    work; if absent, the error must be Spark's find-the-package hint,
    not silent corruption. Avro itself is NO LONGER a drop — the
    engine ships a native distributed reader/writer
    (sources/avro.py, cross-validated against the Apache Avro Java
    library in tests/test_avro.py); this test only covers the
    third-party-module seam."""
    t = tables(spark, sf_dir)
    path = f"{io_dir}/roundtrip_avro"
    try:
        t.region.write.mode("overwrite").format("avro").save(path)
    except Exception as exc:
        # Documented-drop path: exactly the missing-data-source error.
        assert "avro" in str(exc).lower(), exc
        assert "AVRO" in type(exc).__name__ or "FAILED_TO_LOAD" in str(exc) or "Failed to find" in str(exc), exc
        return
    back = spark.read.format("avro").load(path)
    assert back.count() == 5
    assert sorted(r["r_regionkey"] for r in back.collect()) == [0, 1, 2, 3, 4]
