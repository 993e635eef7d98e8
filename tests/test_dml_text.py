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


def test_unguarded_update_then_delete_order_rejected(eng):
    """An unconditioned UPDATE followed by a DELETE leaves the DELETE
    unreachable under ANSI first-matching-clause — reject loudly
    (Hive 2.2 rule: the first of two MATCHED clauses must carry AND)."""
    with pytest.raises(ValueError, match="must carry AND"):
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


# --- round 7: conditioned UPDATE / INSERT clauses + ADVICE r6 alias
# collision fixes -----------------------------------------------------
def test_merge_conditioned_update(eng, spark):
    """WHEN MATCHED AND <cond> THEN UPDATE — the Hive 2.2 grammar form
    r6 rejected. A matched row failing the guard keeps its old values
    and is NOT counted as updated."""
    out = eng.sql(
        """MERGE INTO dmlt USING (SELECT * FROM VALUES (1, 100), (2, 5)
             AS v(id, val)) s
           ON dmlt.id = s.id
           WHEN MATCHED AND s.val > 50 THEN UPDATE SET val = s.val"""
    ).collect()
    assert (out[0].updated, out[0].deleted, out[0].inserted) == (1, 0, 0)
    assert _rows(spark) == [(1, "a", 100), (2, "a", 20), (3, "b", 30), (4, "b", 40)]


def test_merge_update_first_then_delete_ansi_order(eng, spark):
    """UPDATE-first with AND, then DELETE: first-matching-clause means
    a row satisfying the update guard updates even if the delete
    condition also holds; only guard-failing rows reach the DELETE."""
    out = eng.sql(
        """MERGE INTO dmlt USING (SELECT * FROM VALUES (1, 100), (2, 5), (3, 7)
             AS v(id, val)) s
           ON dmlt.id = s.id
           WHEN MATCHED AND s.val >= 7 THEN UPDATE SET val = s.val
           WHEN MATCHED THEN DELETE"""
    ).collect()
    # id=1 (100>=7) and id=3 (7>=7) update — id=3 would also satisfy
    # the unconditioned DELETE, but UPDATE is textually first; id=2
    # fails the guard and falls through to DELETE.
    assert (out[0].updated, out[0].deleted, out[0].inserted) == (2, 1, 0)
    assert _rows(spark) == [(1, "a", 100), (3, "b", 7), (4, "b", 40)]


def test_merge_conditioned_insert(eng, spark):
    """WHEN NOT MATCHED AND <cond> THEN INSERT — guarded-out source
    rows are ignored, not inserted."""
    out = eng.sql(
        """MERGE INTO dmlt USING (SELECT * FROM VALUES (8, 'x', 80), (9, 'y', 9)
             AS v(id, grp, val)) s
           ON dmlt.id = s.id
           WHEN NOT MATCHED AND s.val > 50 THEN INSERT (id, grp, val)
             VALUES (s.id, s.grp, s.val)"""
    ).collect()
    assert (out[0].updated, out[0].deleted, out[0].inserted) == (0, 0, 1)
    rows = _rows(spark)
    assert (8, "x", 80) in rows and not any(r[0] == 9 for r in rows)


def test_merge_alias_named_t_does_not_collide(eng, spark):
    """r6 ADVICE medium: `MERGE INTO tgt x USING src t` — the x->t
    rewrite must not be re-rewritten by the t->s source pass."""
    out = eng.sql(
        """MERGE INTO dmlt x USING (SELECT 1 AS id, 500 AS val) t
           ON x.id = t.id
           WHEN MATCHED THEN UPDATE SET val = t.val + x.val"""
    ).collect()
    assert out[0].updated == 1
    assert (1, "a", 510) in _rows(spark)


def test_merge_swapped_t_s_aliases(eng, spark):
    """Target aliased s, source aliased t — the pathological swap."""
    out = eng.sql(
        """MERGE INTO dmlt s USING (SELECT 2 AS id, 7 AS val) t
           ON s.id = t.id
           WHEN MATCHED THEN UPDATE SET val = s.val - t.val"""
    ).collect()
    assert out[0].updated == 1
    assert (2, "a", 13) in _rows(spark)


def test_merge_identical_aliases_rejected(eng):
    with pytest.raises(ValueError, match="aliases collide"):
        eng.sql(
            """MERGE INTO dmlt z USING (SELECT 1 AS id) z ON z.id = z.id
               WHEN MATCHED THEN DELETE"""
        )


def test_merge_when_keyword_inside_literal(eng, spark):
    """r6 ADVICE low: a SET literal containing 'WHEN MATCHED ...' must
    not split the clause list (scanner-found WHEN boundaries)."""
    out = eng.sql(
        """MERGE INTO dmlt USING (SELECT 1 AS id) s ON dmlt.id = s.id
           WHEN MATCHED THEN UPDATE SET grp = 'WHEN MATCHED THEN DELETE'"""
    ).collect()
    assert out[0].updated == 1
    assert (1, "WHEN MATCHED THEN DELETE", 10) in _rows(spark)


def test_merge_then_keyword_inside_guard_literal(eng, spark):
    """A guard containing ' THEN ' inside a string literal must not
    truncate the AND..THEN boundary."""
    out = eng.sql(
        """MERGE INTO dmlt USING (SELECT 1 AS id) s ON dmlt.id = s.id
           WHEN MATCHED AND 'if then else' = 'if then else' THEN
             UPDATE SET val = 0"""
    ).collect()
    assert out[0].updated == 1
    assert (1, "a", 0) in _rows(spark)


def test_schema_qualified_reference_not_rewritten():
    """r6 ADVICE low: `db.tbl.col` must survive when tbl is an alias
    short-name — the qualifier tail is not an alias use."""
    from amplab_hive_spark.dml_text import _rewrite_alias

    assert (
        _rewrite_alias("db.tbl.col = tbl.col", "tbl", "t")
        == "db.tbl.col = t.col"
    )


def test_alias_hidden_by_explicit_alias(eng, spark):
    """Standard SQL: once aliased, the bare table name is not a valid
    qualifier — `dmlt.val` with target aliased `x` must fail loudly
    (unresolved column), not silently rewrite."""
    with pytest.raises(Exception, match="dmlt|resolve|RESOLUTION"):
        eng.sql(
            """MERGE INTO dmlt x USING (SELECT 1 AS id) s ON x.id = s.id
               WHEN MATCHED THEN UPDATE SET val = dmlt.val + 1"""
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


def test_merge_source_alias_shadowing_target_name_rejected(eng):
    """Review finding: `MERGE INTO dst USING src AS dst` would bind
    every dst. qualifier to the SOURCE — ambiguous, reject loudly."""
    with pytest.raises(ValueError, match="collides with the unaliased"):
        eng.sql(
            """MERGE INTO dmlt USING (SELECT 1 AS id) dmlt ON dmlt.id = dmlt.id
               WHEN MATCHED THEN DELETE"""
        )


def test_merge_target_alias_shadowing_source_name_rejected(eng, spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS dml_src2")
    spark.sql(
        f"CREATE TABLE dml_src2 (id INT) USING parquet"
        f" LOCATION '{tmp_path}/dml_src2'"
    )
    try:
        with pytest.raises(ValueError, match="collides with the unaliased"):
            eng.sql(
                """MERGE INTO dmlt dml_src2 USING dml_src2
                   ON dml_src2.id = dml_src2.id
                   WHEN MATCHED THEN DELETE"""
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS dml_src2")


# r8: CASE ... END opens a scanner scope (r7 ADVICE) — an
# unparenthesized CASE inside a MERGE guard or SET expression must
# neither mis-split the AND..THEN boundary nor look like a new WHEN
# MATCHED clause.


def test_merge_guard_with_unparenthesized_case(eng, spark):
    out = eng.sql(
        """MERGE INTO dmlt USING (SELECT 1 AS id UNION ALL SELECT 3) s
           ON dmlt.id = s.id
           WHEN MATCHED AND CASE WHEN dmlt.grp = 'a' THEN 1 ELSE 0 END = 1
             THEN UPDATE SET val = -1"""
    ).collect()
    assert out[0].updated == 1  # only id=1 (grp 'a'); id=3 is grp 'b'
    assert (1, "a", -1) in _rows(spark) and (3, "b", 30) in _rows(spark)


def test_merge_case_over_column_named_matched(eng, spark):
    """CASE WHEN <boolean col expr> ... with text 'WHEN matched'
    appearing at what WOULD be depth 0 without CASE tracking must not
    split a new clause."""
    spark.sql("ALTER TABLE dmlt ADD COLUMNS (matched BOOLEAN)")
    try:
        out = eng.sql(
            """MERGE INTO dmlt USING (SELECT 2 AS id) s ON dmlt.id = s.id
               WHEN MATCHED THEN UPDATE SET
                 val = CASE WHEN matched THEN 1 ELSE 99 END"""
        ).collect()
        assert out[0].updated == 1
        assert any(r[0] == 2 and r[2] == 99 for r in _rows(spark))
    finally:
        spark.sql("DROP TABLE IF EXISTS dmlt")


def test_update_set_case_with_commas_inside(eng, spark):
    out = eng.sql(
        """UPDATE dmlt SET
             val = CASE WHEN grp = 'a' THEN val + 1 ELSE val END,
             grp = upper(grp)
           WHERE id <= 2"""
    ).collect()
    assert out[0].updated == 2
    assert (1, "A", 11) in _rows(spark) and (2, "A", 21) in _rows(spark)


def test_scan_bare_end_column_does_not_underflow():
    from amplab_hive_spark.dml_text import _find_keyword

    # a bare column named `end` at top level with no open CASE: the
    # WHERE after it must still be found at depth 0
    s = "SET a = end WHERE b = 1"
    assert _find_keyword(s, "WHERE") == s.index("WHERE")


def test_backticked_keyword_identifiers_parse(eng, spark):
    """Review r8: a backtick-quoted identifier named `case` (or `end`)
    must not open a phantom CASE scope and swallow the WHERE."""
    spark.sql("ALTER TABLE dmlt ADD COLUMNS (`case` INT, `end` INT)")
    try:
        out = eng.sql(
            "UPDATE dmlt SET `case` = 7, `end` = 8 WHERE id = 2"
        ).collect()
        assert out[0].updated == 1
        row = [r for r in spark.table("dmlt").collect() if r.id == 2][0]
        assert row["case"] == 7 and row["end"] == 8
        # and id=1 untouched (WHERE was honored, not swallowed)
        row1 = [r for r in spark.table("dmlt").collect() if r.id == 1][0]
        assert row1["case"] is None
    finally:
        spark.sql("DROP TABLE IF EXISTS dmlt")


def test_statements_route_to_mor_when_pinned(eng, spark):
    """r8: pin_mor_keys = the transactional=true analogue — the SAME
    UPDATE/DELETE statement text takes the delta path on a pinned
    table (base files untouched) and copy-on-write otherwise."""
    import os

    from amplab_hive_spark import acid

    def base_files():
        loc = acid._local_path(ddl_loc)
        return sorted(
            f for _root, _d, files in os.walk(loc) for f in files
            if not f.startswith(("_", ".")) and "_delete_delta" not in _root
        )

    from amplab_hive_spark import ddl as _ddl
    ddl_loc = _ddl._table_location(spark, "dmlt")
    eng.pin_mor_keys("dmlt", ["id"])
    before = base_files()
    out = eng.sql("UPDATE dmlt SET val = val + 100 WHERE grp = 'a'").collect()
    assert out[0].updated == 2
    out = eng.sql("DELETE FROM dmlt WHERE id = 3").collect()
    assert out[0].deleted == 1
    assert base_files() == before  # delta path: base never rewritten
    got = {r.id: r.val for r in acid.read_mor(spark, "dmlt").collect()}
    assert got == {1: 110, 2: 120, 4: 40}
    # fold and confirm the statements' net effect persisted
    acid.compact_mor(spark, "dmlt")
    got = {r.id: r.val for r in spark.table("dmlt").collect()}
    assert got == {1: 110, 2: 120, 4: 40}


def test_merge_statement_on_pinned_table_refuses(eng, spark):
    from amplab_hive_spark import acid

    eng.pin_mor_keys("dmlt", ["id"])
    acid.delete_mor(spark, "dmlt", "id = 1", ["id"])
    with pytest.raises(ValueError, match="compact_mor"):
        eng.sql(
            """MERGE INTO dmlt USING (SELECT 2 AS id) s ON dmlt.id = s.id
               WHEN MATCHED THEN DELETE"""
        )


def test_transactional_tblproperties_trigger(eng, spark, tmp_path):
    """r8: TBLPROPERTIES ('transactional'='true','merge_keys'=...) is
    the pure-SQL MOR trigger (AcidUtils.isTransactionalTable
    analogue); COMPACT 'major' folds; declaring transactional WITHOUT
    merge_keys raises instead of silently falling back to COW."""
    import os

    from amplab_hive_spark import acid

    spark.sql("DROP TABLE IF EXISTS dmlt_txn")
    spark.sql(
        f"CREATE TABLE dmlt_txn (id INT, v INT) USING parquet "
        f"LOCATION '{tmp_path}/txn' "
        f"TBLPROPERTIES ('transactional'='true','merge_keys'='id')"
    )
    try:
        spark.sql("INSERT INTO dmlt_txn VALUES (1,10),(2,20)")
        assert eng.sql("UPDATE dmlt_txn SET v = 0 WHERE id = 1") \
            .collect()[0].updated == 1
        assert os.path.isdir(acid._delta_path(spark, "dmlt_txn"))
        n = eng.sql("ALTER TABLE dmlt_txn COMPACT 'major'") \
            .collect()[0].compacted_deltas
        assert n == 2  # one update txn = delete+insert halves
        assert sorted(tuple(r) for r in spark.table("dmlt_txn").collect()) \
            == [(1, 0), (2, 20)]
        # r9: COMPACT 'minor' consolidates deltas WITHOUT a base
        # rewrite (CompactorMR's cheap half) — no longer raises
        eng.sql("UPDATE dmlt_txn SET v = 1 WHERE id = 1")
        eng.sql("UPDATE dmlt_txn SET v = 2 WHERE id = 1")
        base_before = sorted(tuple(r) for r in spark.table("dmlt_txn").collect())
        n = eng.sql("ALTER TABLE dmlt_txn COMPACT 'minor'") \
            .collect()[0].compacted_deltas
        assert n == 4  # two update txns, two files each
        # base untouched, MOR view reflects both updates
        assert sorted(tuple(r) for r in spark.table("dmlt_txn").collect()) \
            == base_before
        got = sorted(tuple(r) for r in acid.read_mor(spark, "dmlt_txn").collect())
        assert got == [(1, 2), (2, 20)]
        with pytest.raises(ValueError, match="major.*minor|minor.*major"):
            eng.sql("ALTER TABLE dmlt_txn COMPACT 'nope'")
    finally:
        spark.sql("DROP TABLE IF EXISTS dmlt_txn")

    spark.sql("DROP TABLE IF EXISTS dmlt_nokeys")
    spark.sql(
        f"CREATE TABLE dmlt_nokeys (id INT) USING parquet "
        f"LOCATION '{tmp_path}/nk' TBLPROPERTIES ('transactional'='true')"
    )
    try:
        spark.sql("INSERT INTO dmlt_nokeys VALUES (1)")
        with pytest.raises(ValueError, match="merge_keys"):
            eng.sql("DELETE FROM dmlt_nokeys WHERE id = 1")
    finally:
        spark.sql("DROP TABLE IF EXISTS dmlt_nokeys")


def test_merge_refuses_transactional_tblproperties_table(eng, spark, tmp_path):
    """Review r8: MERGE must refuse BOTH MOR triggers — a declared-
    transactional table with zero deltas previously took a silent
    copy-on-write rewrite."""
    spark.sql("DROP TABLE IF EXISTS dmlt_txn2")
    spark.sql(
        f"CREATE TABLE dmlt_txn2 (id INT, v INT) USING parquet "
        f"LOCATION '{tmp_path}/txn2' "
        f"TBLPROPERTIES ('transactional'='true','merge_keys'='id')"
    )
    try:
        spark.sql("INSERT INTO dmlt_txn2 VALUES (1,10)")
        with pytest.raises(ValueError, match="merge-on-read"):
            eng.sql(
                """MERGE INTO dmlt_txn2 USING (SELECT 1 AS id, 0 AS v) s
                   ON dmlt_txn2.id = s.id
                   WHEN MATCHED THEN UPDATE SET v = s.v"""
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS dmlt_txn2")


def test_merge_keys_tblproperty_case_insensitive(eng, spark, tmp_path):
    """Review r8: merge_keys='ID' must resolve against column id like
    every other identifier on the SQL surface."""
    spark.sql("DROP TABLE IF EXISTS dmlt_txn3")
    spark.sql(
        f"CREATE TABLE dmlt_txn3 (id INT, v INT) USING parquet "
        f"LOCATION '{tmp_path}/txn3' "
        f"TBLPROPERTIES ('transactional'='true','merge_keys'='ID')"
    )
    try:
        spark.sql("INSERT INTO dmlt_txn3 VALUES (1,10),(2,20)")
        assert eng.sql("DELETE FROM dmlt_txn3 WHERE id = 1") \
            .collect()[0].deleted == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS dmlt_txn3")
