"""§2.9 DDL long-tail surface (reference: DDLSemanticAnalyzer.java /
DDLTask.java — SHOW/DESCRIBE/ALTER/TRUNCATE/VIEW/DATABASE statement
families). Each statement here is one the reference grammar accepts
(HiveParser.g DDL tokens) and Spark SQL executes natively; the test
pins the behavior users would migrate with.
"""

import pytest

from amplab_hive_spark.catalog import tables


@pytest.fixture()
def ddl_db(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS ddl_surface")
    spark.sql("USE ddl_surface")
    yield "ddl_surface"
    spark.sql("USE default")
    spark.sql("DROP DATABASE IF EXISTS ddl_surface CASCADE")


def test_database_lifecycle(spark, ddl_db):
    # SHOW DATABASES / current database / comment round-trip
    dbs = [r[0] for r in spark.sql("SHOW DATABASES").collect()]
    assert "ddl_surface" in dbs
    assert spark.catalog.currentDatabase() == "ddl_surface"


def test_create_alter_describe_table(spark, ddl_db, tmp_path):
    spark.sql(
        f"CREATE TABLE t_alter (id BIGINT, name STRING) USING parquet"
        f" LOCATION '{tmp_path}/t_alter'"
    )
    spark.sql("INSERT INTO t_alter VALUES (1, 'a'), (2, 'b')")

    # ALTER TABLE ... ADD COLUMNS (DDLSemanticAnalyzer ADDCOLS)
    spark.sql("ALTER TABLE t_alter ADD COLUMNS (score DOUBLE)")
    cols = [f.name for f in spark.table("t_alter").schema.fields]
    assert cols == ["id", "name", "score"]
    # pre-existing rows read NULL for the new column
    assert spark.sql("SELECT COUNT(*) FROM t_alter WHERE score IS NULL").collect()[0][0] == 2

    # ALTER TABLE ... SET TBLPROPERTIES (DDLSemanticAnalyzer PROPERTIES)
    # ('owner' is reserved in Spark 4 — use a non-reserved key)
    spark.sql("ALTER TABLE t_alter SET TBLPROPERTIES ('team'='pipeline', 'quality'='gold')")
    props = spark.sql("SHOW TBLPROPERTIES t_alter").collect()
    assert {"team": "pipeline", "quality": "gold"}.items() <= {r[0]: r[1] for r in props}.items()
    # UNSET round-trip
    spark.sql("ALTER TABLE t_alter UNSET TBLPROPERTIES ('quality')")
    assert "quality" not in {r[0] for r in spark.sql("SHOW TBLPROPERTIES t_alter").collect()}

    # DESCRIBE (DESCTABLE)
    desc = {r["col_name"]: r["data_type"] for r in spark.sql("DESCRIBE TABLE t_alter").collect()}
    assert desc["id"] == "bigint" and desc["score"] == "double"

    # SHOW CREATE TABLE round-trips the schema
    stmt = spark.sql("SHOW CREATE TABLE t_alter").collect()[0][0]
    assert "t_alter" in stmt and "score DOUBLE" in stmt


def test_rename_and_truncate(spark, ddl_db):
    spark.sql("CREATE TABLE t_ren (k INT) USING parquet")
    spark.sql("INSERT INTO t_ren VALUES (1), (2), (3)")
    # ALTER TABLE ... RENAME TO (DDLSemanticAnalyzer RENAME)
    spark.sql("ALTER TABLE t_ren RENAME TO t_ren2")
    assert spark.table("t_ren2").count() == 3
    tabs = [r["tableName"] for r in spark.sql("SHOW TABLES").collect()]
    assert "t_ren2" in tabs and "t_ren" not in tabs
    # TRUNCATE TABLE (TRUNCATETABLE)
    spark.sql("TRUNCATE TABLE t_ren2")
    assert spark.table("t_ren2").count() == 0


def test_view_lifecycle(spark, ddl_db, sf_dir):
    # A persistent view can't reference a temp view — materialize a
    # persistent base table first (the INVALID_TEMP_OBJ_REFERENCE
    # rule; the reference has the same persistent/temporary split).
    tables(spark, sf_dir)
    spark.sql("CREATE TABLE nation_p USING parquet AS SELECT * FROM nation")
    spark.sql(
        "CREATE VIEW v_small_nations AS "
        "SELECT n_nationkey, n_name FROM nation_p WHERE n_regionkey = 0"
    )
    assert spark.table("v_small_nations").count() == 5
    # ALTER VIEW ... AS (ALTERVIEW_AS)
    spark.sql(
        "ALTER VIEW v_small_nations AS "
        "SELECT n_nationkey, n_name FROM nation_p WHERE n_regionkey IN (0, 1)"
    )
    assert spark.table("v_small_nations").count() == 10
    # SHOW VIEWS + DROP VIEW
    views = [r["viewName"] for r in spark.sql("SHOW VIEWS").collect()]
    assert "v_small_nations" in views
    spark.sql("DROP VIEW v_small_nations")
    assert "v_small_nations" not in [
        r["viewName"] for r in spark.sql("SHOW VIEWS").collect()
    ]


def test_show_partitions_and_columns(spark, ddl_db, tmp_path):
    spark.sql(
        f"CREATE TABLE t_part (k INT, dt STRING) USING parquet"
        f" PARTITIONED BY (dt) LOCATION '{tmp_path}/t_part'"
    )
    spark.sql("INSERT INTO t_part PARTITION (dt='2024-01-01') VALUES (1)")
    spark.sql("INSERT INTO t_part PARTITION (dt='2024-01-02') VALUES (2)")
    parts = sorted(r[0] for r in spark.sql("SHOW PARTITIONS t_part").collect())
    assert parts == ["dt=2024-01-01", "dt=2024-01-02"]
    cols = [r[0] for r in spark.sql("SHOW COLUMNS IN t_part").collect()]
    assert cols == ["k", "dt"]
    # ALTER TABLE ... DROP PARTITION (DROPPARTITION)
    spark.sql("ALTER TABLE t_part DROP PARTITION (dt='2024-01-01')")
    assert [r[0] for r in spark.sql("SHOW PARTITIONS t_part").collect()] == ["dt=2024-01-02"]


def test_describe_function_and_show_functions(spark):
    fns = [r[0] for r in spark.sql("SHOW FUNCTIONS LIKE 'xpath*'").collect()]
    assert "xpath" in fns and "xpath_int" in fns
    desc = "\n".join(r[0] for r in spark.sql("DESCRIBE FUNCTION pmod").collect())
    assert "pmod" in desc and "positive" in desc.lower()


def test_spark_tablesample_syntax(spark, sf_dir):
    """Spark's own TABLESAMPLE grammar (PERCENT and BUCKET forms)
    parses and bounds sensibly — the syntax half of the
    tablesample_bucket registry entry, whose oracle covers only the
    deterministic Hive bucket SEMANTICS (Spark has no ON col form)."""
    from amplab_hive_spark.catalog import tables

    tables(spark, sf_dir)
    total = spark.sql("SELECT COUNT(*) n FROM orders").collect()[0]["n"]
    pct = spark.sql(
        "SELECT COUNT(*) n FROM orders TABLESAMPLE (50 PERCENT) REPEATABLE (7)"
    ).collect()[0]["n"]
    assert 0 < pct < total
    bucket = spark.sql(
        "SELECT COUNT(*) n FROM orders TABLESAMPLE (BUCKET 1 OUT OF 4)"
    ).collect()[0]["n"]
    assert 0 < bucket < total
    # REPEATABLE pins the sample across runs
    again = spark.sql(
        "SELECT COUNT(*) n FROM orders TABLESAMPLE (50 PERCENT) REPEATABLE (7)"
    ).collect()[0]["n"]
    assert again == pct


def test_char_varchar_semantics(spark, tmp_path):
    """CHAR(n)/VARCHAR(n) typed columns (reference: clientpositive
    ctas_varchar.q / alter_char2.q; serde2 HiveChar pads, HiveVarchar
    bounds). Spark honors Hive's core semantics: CHAR pads on read to
    declared length, CHAR comparison against a shorter literal is
    padding-insensitive (the literal is padded before comparing), and
    VARCHAR stores unpadded. Documented divergence: on overflow Hive
    TRUNCATES silently while Spark raises the structured
    EXCEED_LIMIT_LENGTH — the engine chooses loud over lossy."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    spark.sql("DROP TABLE IF EXISTS char_sem")
    spark.sql(
        f"CREATE TABLE char_sem (c CHAR(5), v VARCHAR(5)) USING parquet"
        f" LOCATION '{tmp_path}/char_sem'"
    )
    try:
        spark.sql("INSERT INTO char_sem VALUES ('ab', 'ab')")
        r = spark.sql(
            """SELECT c, v, length(c) AS lc, length(v) AS lv,
                      c = 'ab' AS eq_short, c = 'ab   ' AS eq_padded
               FROM char_sem"""
        ).collect()[0]
        assert r.c == "ab   " and r.lc == 5, "CHAR must pad on read"
        assert r.v == "ab" and r.lv == 2, "VARCHAR must not pad"
        assert r.eq_short and r.eq_padded, "CHAR comparison pads the literal"
        for bad in ("('abcdef', 'x')", "('x', 'abcdef')"):
            with _pytest.raises(SparkRuntimeException, match="EXCEED_LIMIT_LENGTH"):
                spark.sql(f"INSERT INTO char_sem VALUES {bad}")
        assert spark.table("char_sem").count() == 1, "failed inserts wrote nothing"
    finally:
        spark.sql("DROP TABLE IF EXISTS char_sem")
