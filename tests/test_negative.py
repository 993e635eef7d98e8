"""Negative tests — analyzer/parser error classes, mirroring the
reference's clientnegative corpus themes (686 scripts: unresolved
columns/tables, type errors, invalid grouping, bad function arity).
The engine must fail with a structured AnalysisException (and a
helpful message), not silently misbehave.
"""

import pytest
from pyspark.errors.exceptions.captured import (
    AnalysisException,
    ParseException,
)

from amplab_hive_spark.catalog import tables


@pytest.fixture(autouse=True)
def _register(spark, sf_dir):
    tables(spark, sf_dir)


def test_unresolved_column(spark):
    with pytest.raises(AnalysisException, match="UNRESOLVED_COLUMN"):
        spark.sql("SELECT no_such_col FROM nation").collect()


def test_unresolved_table(spark):
    with pytest.raises(AnalysisException, match="TABLE_OR_VIEW_NOT_FOUND"):
        spark.sql("SELECT * FROM definitely_missing_table").collect()


def test_parse_error(spark):
    with pytest.raises(ParseException):
        spark.sql("SELEKT 1")


def test_nonaggregated_column_in_groupby(spark):
    with pytest.raises(AnalysisException, match="MISSING_AGGREGATION|GROUP_BY"):
        spark.sql("SELECT n_name, n_regionkey FROM nation GROUP BY n_regionkey").collect()


def test_wrong_function_arity(spark):
    with pytest.raises(AnalysisException, match="WRONG_NUM_ARGS|PARAMETER"):
        spark.sql("SELECT substr() FROM nation").collect()


def test_unknown_function(spark):
    with pytest.raises(AnalysisException, match="UNRESOLVED_ROUTINE"):
        spark.sql("SELECT totally_fake_fn(n_name) FROM nation").collect()


def test_ambiguous_column(spark):
    with pytest.raises(AnalysisException, match="AMBIGUOUS_REFERENCE"):
        spark.sql(
            """SELECT n_nationkey FROM
               (SELECT n_nationkey FROM nation) a,
               (SELECT n_nationkey FROM nation) b"""
        ).collect()


def test_union_column_count_mismatch(spark):
    with pytest.raises(AnalysisException, match="NUM_COLUMNS_MISMATCH|UNION"):
        spark.sql("SELECT n_name FROM nation UNION ALL SELECT r_name, r_regionkey FROM region").collect()


def test_scalar_subquery_multiple_rows(spark):
    # clientnegative subquery_scalar_multi_rows theme: runtime guard
    with pytest.raises(Exception, match="MULTI_VALUE|more than one row|SCALAR_SUBQUERY"):
        spark.sql(
            "SELECT (SELECT n_nationkey FROM nation) AS x FROM region"
        ).collect()


def test_window_function_in_where(spark):
    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT n_name FROM nation WHERE row_number() OVER (ORDER BY n_nationkey) = 1"
        ).collect()


def test_aggregate_in_where(spark):
    # clientnegative agg_in_where theme
    with pytest.raises(AnalysisException, match="WHERE|aggregate"):
        spark.sql("SELECT n_name FROM nation WHERE max(n_nationkey) > 1").collect()


def test_order_by_ordinal_out_of_range(spark):
    with pytest.raises(AnalysisException, match="ORDER_BY_POS_OUT_OF_RANGE|position"):
        spark.sql("SELECT n_name FROM nation ORDER BY 99").collect()


def test_generator_in_where(spark):
    # UDTF outside SELECT/LATERAL VIEW position (clientnegative udtf_not_supported)
    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT n_name FROM nation WHERE explode(array(1, 2)) = 1"
        ).collect()


def test_grouping_without_group_by(spark):
    with pytest.raises(AnalysisException):
        spark.sql("SELECT grouping(n_name) FROM nation").collect()


def test_insert_column_count_mismatch(spark, tmp_path):
    spark.sql(
        f"CREATE TABLE neg_ins (a INT, b STRING) USING parquet LOCATION '{tmp_path}/neg_ins'"
    )
    try:
        with pytest.raises(AnalysisException):
            spark.sql("INSERT INTO neg_ins VALUES (1, 'x', 99)").collect()
    finally:
        spark.sql("DROP TABLE neg_ins")


def test_duplicate_cte_name(spark):
    # clientnegative: ambiguous/duplicate aliases family
    with pytest.raises((AnalysisException, ParseException)):
        spark.sql(
            "WITH x AS (SELECT 1 AS a), x AS (SELECT 2 AS a) SELECT * FROM x"
        ).collect()


def test_recursive_view_reference(spark):
    # create_view family: a view cannot reference itself
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW v_neg_base AS SELECT 1 AS a")
    with pytest.raises(AnalysisException):
        spark.sql(
            "CREATE OR REPLACE TEMPORARY VIEW v_neg_base AS "
            "SELECT a + 1 AS a FROM v_neg_base"
        ).collect()


def test_star_in_aggregate_argument(spark):
    # udaf family: * only valid in count(*)
    with pytest.raises((AnalysisException, ParseException)):
        spark.sql("SELECT sum(*) FROM orders").collect()


def test_lateral_view_nongenerator(spark):
    # udtf_* negative family: LATERAL VIEW requires a generator fn
    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT t.x FROM nation LATERAL VIEW upper(n_name) t AS x"
        ).collect()


def test_distinct_window_function(spark):
    # windowing negative family: DISTINCT not supported over windows
    with pytest.raises((AnalysisException, ParseException)):
        spark.sql(
            "SELECT COUNT(DISTINCT o_custkey) OVER (ORDER BY o_orderkey) FROM orders"
        ).collect()


def test_drop_nonexistent_table_strict(spark):
    # drop_table family: DROP without IF EXISTS on a missing table errors
    with pytest.raises(AnalysisException, match="TABLE_OR_VIEW_NOT_FOUND"):
        spark.sql("DROP TABLE no_such_table_xyz").collect()


def test_truncate_view_rejected(spark):
    # truncate family: TRUNCATE only applies to tables
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW v_neg_trunc AS SELECT 1 AS a")
    with pytest.raises(AnalysisException):
        spark.sql("TRUNCATE TABLE v_neg_trunc").collect()


def test_having_without_groupby_on_nonagg(spark):
    # having negative family: HAVING referencing non-grouped column
    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT COUNT(*) FROM orders HAVING o_custkey > 5"
        ).collect()


def test_set_operation_incompatible_types(spark):
    # union negative family: un-coercible branch types
    with pytest.raises(AnalysisException, match="INCOMPATIBLE_COLUMN_TYPE|CANNOT_MERGE"):
        spark.sql(
            "SELECT array(1, 2) AS a UNION ALL SELECT 'text' AS a"
        ).collect()


def test_offset_without_order_is_ok_but_negative_limit_errors(spark):
    # limit negative family: LIMIT must be non-negative
    with pytest.raises((AnalysisException, ParseException)):
        spark.sql("SELECT 1 LIMIT -5").collect()


# --- round-4 tranche: more clientnegative themes -----------------


def test_update_partition_column_rejected(spark, sf_dir, tmp_path):
    """clientnegative/update_partition_col.q: UPDATE of a partition
    column must raise, not corrupt (see ddl.update_table)."""
    from amplab_hive_spark import ddl
    from amplab_hive_spark.catalog import tables as _t

    ddl.create_table_as(
        spark, "neg_upd_part", _t(spark, sf_dir).nation,
        str(tmp_path / "neg_upd_part"), partition_by=["n_regionkey"],
    )
    try:
        with pytest.raises(ValueError, match="partition column"):
            ddl.update_table(spark, "neg_upd_part", "n_nationkey = 1", {"n_regionkey": "0"})
    finally:
        spark.sql("DROP TABLE IF EXISTS neg_upd_part")


def test_subquery_multiple_columns_where_scalar_expected(spark):
    """clientnegative/subquery_multiple_cols_in_select.q."""
    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT * FROM nation WHERE n_nationkey = "
            "(SELECT n_nationkey, n_regionkey FROM nation LIMIT 1)"
        ).collect()


def test_scalar_subquery_more_than_one_row(spark):
    """clientnegative: scalar subquery cardinality violation is a
    RUNTIME error (surfaces as SCALAR_SUBQUERY_TOO_MANY_ROWS; on this
    build it crosses py4j as the raw java error, so match the error
    class in the message rather than the Python exception type)."""
    with pytest.raises(Exception, match="SCALAR_SUBQUERY_TOO_MANY_ROWS|MORE_THAN_ONE_ROW"):
        spark.sql(
            "SELECT (SELECT n_nationkey FROM nation) AS x FROM region"
        ).collect()


def test_order_by_position_out_of_range(spark):
    """clientnegative/orderbyposition (ordinal past the select list)."""
    with pytest.raises(AnalysisException, match="ORDER_BY_POS_OUT_OF_RANGE|position"):
        spark.sql("SELECT n_name FROM nation ORDER BY 5").collect()


def test_group_by_position_out_of_range(spark):
    with pytest.raises(AnalysisException, match="GROUP_BY_POS_OUT_OF_RANGE|position"):
        spark.sql("SELECT n_name FROM nation GROUP BY 3").collect()


def test_star_in_aggregate_argument(spark):
    """clientnegative: * is only valid inside count(*)."""
    with pytest.raises(AnalysisException):
        spark.sql("SELECT max(*) FROM nation").collect()


def test_window_function_in_where(spark):
    """clientnegative: window functions are illegal in WHERE."""
    with pytest.raises(AnalysisException, match="WINDOW|window"):
        spark.sql(
            "SELECT n_name FROM nation WHERE row_number() OVER (ORDER BY n_name) = 1"
        ).collect()


def test_aggregate_in_where(spark):
    """clientnegative/agg_in_where.q: aggregates belong in HAVING."""
    with pytest.raises(AnalysisException, match="WHERE|aggregate|AGGREGATE"):
        spark.sql("SELECT n_name FROM nation WHERE count(*) > 1").collect()


def test_union_column_count_mismatch(spark):
    """clientnegative/union2-cols: branch arity mismatch."""
    with pytest.raises(AnalysisException, match="NUM_COLUMNS_MISMATCH|number of columns"):
        spark.sql(
            "SELECT n_name, n_nationkey FROM nation UNION ALL SELECT r_name FROM region"
        ).collect()


def test_insert_into_missing_table(spark, sf_dir):
    from amplab_hive_spark import ddl
    from amplab_hive_spark.catalog import tables as _t

    with pytest.raises(AnalysisException, match="TABLE_OR_VIEW_NOT_FOUND"):
        ddl.insert_into(spark, "table_that_never_existed", _t(spark, sf_dir).nation)


def test_drop_null_partition_by_value_rejected(spark):
    """The NULL (__HIVE_DEFAULT_PARTITION__) partition cannot be
    addressed by value in DROP PARTITION — same limitation as Hive."""
    from amplab_hive_spark.ddl import _sql_partition_literal

    with pytest.raises(ValueError, match="HIVE_DEFAULT_PARTITION"):
        _sql_partition_literal(None)


def test_percentile_fraction_out_of_range(spark):
    """Ordered-set aggregate fraction must be in [0, 1] — the analyzer
    rejects 1.5 with a structured out-of-range class (clientnegative
    udaf percentile theme)."""
    with pytest.raises(AnalysisException, match="VALUE_OUT_OF_RANGE"):
        spark.sql(
            "SELECT percentile_cont(1.5) WITHIN GROUP (ORDER BY o_orderkey) FROM orders"
        ).collect()


def test_range_frame_requires_order(spark):
    """A value-offset RANGE frame with no ORDER BY is unanchorable —
    structured RANGE_FRAME_WITHOUT_ORDER, not a silent full-frame."""
    with pytest.raises(AnalysisException, match="RANGE_FRAME_WITHOUT_ORDER"):
        spark.sql(
            "SELECT SUM(o_totalprice) OVER (RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)"
            " FROM orders"
        ).collect()


def test_negative_limit_rejected(spark):
    """LIMIT -3 is a structured IS_NEGATIVE error, not an empty
    result (clientnegative limit theme)."""
    with pytest.raises(AnalysisException, match="IS_NEGATIVE"):
        spark.sql("SELECT * FROM nation LIMIT -3").collect()
