"""Testdata schema contract (round-4 lesson, verdict task 3).

The driver REGENERATES /root/testdata each round, and in round 4 the
events.ts physical type silently flipped NANOS->MICROS, breaking nine
queries mid-round (commit 719248d) before anyone noticed. This test is
the round-start tripwire: it pins the exact logical schema of every
table at every scale factor, reading only parquet footers (pyarrow, no
Spark session — runs in well under a second), and names the changed
column in the failure message so the diff is one glance.

If this test fails at round start, the testdata contract moved:
update EXPECTED below AND audit every query touching the named column
(grep the column name across amplab_hive_spark/ and the oracle SQL).
"""

import glob
import os

import pyarrow.parquet as pq
import pytest

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))

# Logical (pyarrow) types as of round 5. timestamp[us] is the
# post-round-4 contract for every timestamp column.
EXPECTED = {
    "region": [("r_regionkey", "int32"), ("r_name", "string")],
    "nation": [("n_nationkey", "int32"), ("n_name", "string"), ("n_regionkey", "int32")],
    "customer": [
        ("c_custkey", "int64"),
        ("c_name", "string"),
        ("c_nationkey", "int32"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "int64"),
        ("s_name", "string"),
        ("s_nationkey", "int32"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "int64"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int32"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "int64"),
        ("o_custkey", "int64"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp[us]"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "int64"),
        ("l_partkey", "int64"),
        ("l_suppkey", "int64"),
        ("l_linenumber", "int32"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp[us]"),
    ],
    "events": [
        ("event_id", "int64"),
        ("ts", "timestamp[us]"),
        ("user_id", "int64"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "int64"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "int64"),
    ],
    "embeddings": [
        ("vec_id", "int64"),
        ("embedding", "list<element: float>"),
        ("label", "int32"),
    ],
}


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_testdata_schemas_match_contract(sf_dir):
    diffs = []
    for table, expected in EXPECTED.items():
        path = os.path.join(sf_dir, f"{table}.parquet")
        if not os.path.exists(path):
            diffs.append(f"{table}: file missing at {path}")
            continue
        schema = pq.read_schema(path)
        actual = [(name, str(schema.field(name).type)) for name in schema.names]
        if actual != expected:
            exp_d, act_d = dict(expected), dict(actual)
            for col in sorted(set(exp_d) | set(act_d)):
                if exp_d.get(col) != act_d.get(col):
                    diffs.append(
                        f"{table}.{col}: expected {exp_d.get(col, '<absent>')}, "
                        f"got {act_d.get(col, '<absent>')}"
                    )
    assert not diffs, "testdata contract changed (driver regenerated?): " + "; ".join(diffs)


def test_all_sf_dirs_present():
    names = {os.path.basename(d) for d in SF_DIRS}
    assert {"sf0.001", "sf0.01", "sf0.1"} <= names, f"missing scale factors: {names}"


def test_temp_views_follow_the_requested_sf_dir(spark):
    """Regression (round 6): temp-view names are GLOBAL per session,
    so loading a second sf_dir re-points them; a later cache hit on
    the first dir must re-assert its views or SQL-text queries
    silently read the other directory's data (surfaced as a 6-row
    `documents` view stolen by a constructed-fixture test)."""
    from amplab_hive_spark.catalog import tables

    d1, d2 = "/root/testdata/sf0.001", "/root/testdata/sf0.01"

    def n_orders():
        return spark.sql("SELECT count(*) AS n FROM orders").collect()[0].n

    tables(spark, d1)
    n1 = n_orders()
    tables(spark, d2)
    n2 = n_orders()
    assert n1 != n2, "fixture SFs must differ for this test to mean anything"
    tables(spark, d1)  # cache hit — must still re-point the views
    assert n_orders() == n1
    tables(spark, d2)
    assert n_orders() == n2
