"""UPDATE / DELETE / MERGE as SQL TEXT through Engine.sql — the
statement surface the reference's UpdateDeleteSemanticAnalyzer
(ql/parse/UpdateDeleteSemanticAnalyzer.java:76) provides. The
execution semantics (partition scoping, cardinality, crash windows)
are the ddl verbs' own and are tested in test_ddl_writes/
test_properties; these tests pin statement RECOGNITION: parsing,
alias normalization, quote/paren awareness, count results, and that
non-DML text passes through untouched."""

import pytest

from amplab_hive_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark=spark)
    spark.sql("DROP TABLE IF EXISTS dmlt")
    spark.sql(
        f"CREATE TABLE dmlt (id INT, grp STRING, val INT) USING parquet"
        f" LOCATION '{tmp_path}/dmlt'"
    )
    spark.sql(
        "INSERT INTO dmlt VALUES (1,'a',10),(2,'a',20),(3,'b',30),(4,'b',40)"
    )
    yield e
    spark.sql("DROP TABLE IF EXISTS dmlt")


def _rows(spark):
    return sorted(tuple(r) for r in spark.table("dmlt").collect())


def test_update_statement(eng, spark):
    out = eng.sql("UPDATE dmlt SET val = val + 1 WHERE grp = 'a'").collect()
    assert out[0].updated == 2
    assert _rows(spark) == [(1, "a", 11), (2, "a", 21), (3, "b", 30), (4, "b", 40)]


def test_update_no_where_hits_all(eng, spark):
    out = eng.sql("UPDATE dmlt SET val = 0").collect()
    assert out[0].updated == 4
    assert all(r[2] == 0 for r in _rows(spark))


def test_update_quote_and_paren_awareness(eng, spark):
    # a comma and an '=' inside a string literal, a comma inside a
    # function call — neither may split the SET list
    eng.sql(
        "UPDATE dmlt SET grp = 'x,=y', val = greatest(val, 35) WHERE id >= 3"
    ).collect()
    assert _rows(spark) == [
        (1, "a", 10), (2, "a", 20), (3, "x,=y", 35), (4, "x,=y", 40),
    ]


def test_delete_statement(eng, spark):
    out = eng.sql("DELETE FROM dmlt WHERE val >= 30").collect()
    assert out[0].deleted == 2
    assert _rows(spark) == [(1, "a", 10), (2, "a", 20)]


def test_merge_statement_all_clauses(eng, spark):
    out = eng.sql(
        """MERGE INTO dmlt AS tgt
           USING (SELECT * FROM VALUES (2, 'a', 99), (3, 'b', 0), (9, 'c', 90)
                  AS v(id, grp, val)) AS src
           ON tgt.id = src.id
           WHEN MATCHED AND src.val = 0 THEN DELETE
           WHEN MATCHED THEN UPDATE SET val = src.val
           WHEN NOT MATCHED THEN INSERT (id, grp, val)
             VALUES (src.id, src.grp, src.val)"""
    ).collect()
    assert (out[0].updated, out[0].deleted, out[0].inserted) == (1, 1, 1)
    assert _rows(spark) == [(1, "a", 10), (2, "a", 99), (4, "b", 40), (9, "c", 90)]


def test_merge_insert_star(eng, spark):
    eng.sql(
        """MERGE INTO dmlt USING (SELECT 7 AS id, 'z' AS grp, 70 AS val) s
           ON dmlt.id = s.id
           WHEN NOT MATCHED THEN INSERT *"""
    ).collect()
    assert (7, "z", 70) in _rows(spark)


def test_merge_table_source_and_default_aliases(eng, spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS dml_src")
    spark.sql(
        f"CREATE TABLE dml_src (id INT, grp STRING, val INT) USING parquet"
        f" LOCATION '{tmp_path}/dml_src'"
    )
    try:
        spark.sql("INSERT INTO dml_src VALUES (1,'a',111)")
        out = eng.sql(
            """MERGE INTO dmlt t USING dml_src s ON t.id = s.id
               WHEN MATCHED THEN UPDATE SET val = s.val"""
        ).collect()
        assert out[0].updated == 1
        assert (1, "a", 111) in _rows(spark)
    finally:
        spark.sql("DROP TABLE IF EXISTS dml_src")


def test_non_dml_passthrough(eng):
    # SELECT mentioning the keywords must NOT be hijacked
    r = eng.sql("SELECT 'UPDATE dmlt SET x' AS s, 42 AS n").collect()
    assert r[0].n == 42


def test_malformed_set_rejected(eng):
    with pytest.raises(ValueError, match="malformed SET"):
        eng.sql("UPDATE dmlt SET val").collect()


def test_unsupported_when_clause_rejected(eng):
    with pytest.raises(ValueError, match="unsupported MERGE WHEN"):
        eng.sql(
            """MERGE INTO dmlt USING (SELECT 1 AS id) s ON dmlt.id = s.id
               WHEN MATCHED THEN FROB"""
        )


def test_merge_insert_arity_mismatch_rejected(eng):
    with pytest.raises(ValueError, match="arity mismatch"):
        eng.sql(
            """MERGE INTO dmlt USING (SELECT 1 AS id) s ON dmlt.id = s.id
               WHEN NOT MATCHED THEN INSERT (id, grp) VALUES (s.id)"""
        )


def test_merge_duplicate_clause_rejected(eng):
    with pytest.raises(ValueError, match="duplicate WHEN MATCHED"):
        eng.sql(
            """MERGE INTO dmlt USING (SELECT 1 AS id, 5 AS val) s
               ON dmlt.id = s.id
               WHEN MATCHED THEN UPDATE SET val = s.val
               WHEN MATCHED THEN UPDATE SET val = 0"""
        )


# --- review-pass regressions (round 6): the shim must parse like a
# SQL parser, not like a regex ---------------------------------------
def test_dangling_where_is_error_not_delete_all(eng, spark):
    """'WHERE ;' must raise, never silently become TRUE."""
    with pytest.raises(ValueError, match="WHERE requires a condition"):
        eng.sql("DELETE FROM dmlt WHERE ;")
    with pytest.raises(ValueError, match="WHERE requires a condition"):
        eng.sql("UPDATE dmlt SET val = 0 WHERE ;")
    assert len(_rows(spark)) == 4, "no row may be touched"


def test_where_keyword_inside_string_literal(eng, spark):
    eng.sql("UPDATE dmlt SET grp = 'x where y' WHERE id = 1").collect()
    assert (1, "x where y", 10) in _rows(spark)


def test_alias_prefix_inside_string_literal_survives(eng, spark):
    out = eng.sql(
        """MERGE INTO dmlt USING (SELECT 1 AS id) src ON dmlt.id = src.id
           WHEN MATCHED THEN UPDATE SET grp = 'call src.support'"""
    ).collect()
    assert out[0].updated == 1
    assert (1, "call src.support", 10) in _rows(spark)


def test_merge_source_with_nested_parens(eng, spark):
    out = eng.sql(
        """MERGE INTO dmlt USING
             (SELECT greatest(1, least(2, 1)) AS id, 77 AS val) s
           ON dmlt.id = s.id
           WHEN MATCHED THEN UPDATE SET val = s.val"""
    ).collect()
    assert out[0].updated == 1
    assert (1, "a", 77) in _rows(spark)


def test_escaped_quote_in_set_literal(eng, spark):
    eng.sql(r"UPDATE dmlt SET grp = 'O\'Brien, Inc', val = 2 WHERE id = 1").collect()
    assert (1, "O'Brien, Inc", 2) in _rows(spark)


def test_update_then_delete_order_rejected(eng):
    """merge_into evaluates delete-first; a textual UPDATE-then-DELETE
    order would silently invert the user's first-matching-clause
    intent — reject instead."""
    with pytest.raises(ValueError, match="DELETE must\n? *precede|DELETE must precede"):
        eng.sql(
            """MERGE INTO dmlt USING (SELECT 1 AS id, 5 AS val) s
               ON dmlt.id = s.id
               WHEN MATCHED THEN UPDATE SET val = s.val
               WHEN MATCHED AND s.val = 5 THEN DELETE"""
        )


def test_unconditional_delete_before_update_rejected(eng):
    with pytest.raises(ValueError, match="must carry AND"):
        eng.sql(
            """MERGE INTO dmlt USING (SELECT 1 AS id, 5 AS val) s
               ON dmlt.id = s.id
               WHEN MATCHED THEN DELETE
               WHEN MATCHED THEN UPDATE SET val = s.val"""
        )


def test_statement_updates_inherit_nondeterminism_rejection(eng):
    """The verbs' guard rails must fire through the statement path:
    a rand() condition is the silent-skip class ddl rejects."""
    with pytest.raises(ValueError, match="deterministic|non-deterministic"):
        eng.sql("UPDATE dmlt SET val = 0 WHERE rand() < 0.5")
    with pytest.raises(ValueError, match="deterministic|non-deterministic"):
        eng.sql("DELETE FROM dmlt WHERE rand() < 0.5")


def test_statement_merge_inherits_cardinality_check(eng):
    """Two source rows matching one target key must raise the ANSI
    cardinality violation through the statement path."""
    with pytest.raises(ValueError, match="cardinality"):
        eng.sql(
            """MERGE INTO dmlt USING (SELECT * FROM VALUES (1, 7), (1, 8)
                 AS v(id, val)) s
               ON dmlt.id = s.id
               WHEN MATCHED THEN UPDATE SET val = s.val"""
        )
