"""Temporal joins (operators/asof.py): plan-shape gates and edge
semantics the oracle can't isolate. Oracle parity itself runs in
test_oracle_parity via the registry."""

import pytest
from pyspark.sql import Row, functions as F

from amplab_hive_spark.operators.asof import events_asof_join, events_range_join


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


def test_asof_plan_is_single_key_shuffle(spark, sf_dir):
    """The as-of join must plan as union + window (one shuffle on the
    key + the presentation sort), never a join node at all — that's
    the entire point of the union-marker shape."""
    df = events_asof_join(spark, sf_dir)
    df.count()
    plan = _plan(df)
    assert "Join" not in plan, plan
    assert "Window" in plan, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_plan_is_hash_join(spark, sf_dir):
    """Banding must turn the interval join into an equi hash join —
    the naive BETWEEN form plans as BroadcastNestedLoopJoin."""
    df = events_range_join(spark, sf_dir)
    df.count()
    plan = _plan(df)
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert ("HashJoin" in plan) or ("SortMergeJoin" in plan), plan


def test_asof_no_prior_click_is_null(spark, sf_dir):
    """A purchase that precedes every click by its user must surface
    with a NULL click_ts (LEFT as-of), not be dropped."""
    out = events_asof_join(spark, sf_dir)
    total_purchases = out.count()
    # every purchase row is present exactly once
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert total_purchases == ev.filter(F.col("event_type") == "purchase").count()
    # matched rows must satisfy click_ts <= purchase_ts
    bad = out.filter(F.col("click_ts") > F.col("purchase_ts")).count()
    assert bad == 0


def test_range_join_boundary_inclusivity(spark):
    """Interval is (p_ts - 10min, p_ts]: a click exactly at the
    purchase instant counts; one exactly 10 minutes before does not —
    and bucket-edge clicks still match across the band boundary."""
    base = 1_700_000_000  # seconds; arbitrary fixed epoch
    rows = [
        # u1: purchase at T; clicks at T (in), T-600s (out, open bound),
        # T-599s (in), T-601s (out)
        Row(event_id=1, user_id=1, event_type="purchase", sec=base),
        Row(event_id=2, user_id=1, event_type="click", sec=base),
        Row(event_id=3, user_id=1, event_type="click", sec=base - 600),
        Row(event_id=4, user_id=1, event_type="click", sec=base - 599),
        Row(event_id=5, user_id=1, event_type="click", sec=base - 601),
        # u2: purchase just after a bucket edge, click just before it —
        # only the +1-bucket copy of the click can reach it.
        Row(event_id=6, user_id=2, event_type="purchase", sec=base - (base % 600) + 1),
        Row(event_id=7, user_id=2, event_type="click", sec=base - (base % 600) - 1),
    ]
    ev = (
        spark.createDataFrame(rows)
        .withColumn("ts", F.timestamp_seconds("sec"))
        .withColumn("value", F.lit(0.0))
        .withColumn("props", F.lit("{}"))
        .drop("sec")
    )
    import amplab_hive_spark.operators.asof as asof_mod
    from amplab_hive_spark import catalog

    # run the operator body against the fixture by registering it as
    # the events view through a patched tables() namespace
    class _T:
        events = ev

    orig = asof_mod.tables
    asof_mod.tables = lambda *_a, **_k: _T()
    try:
        got = {r.event_id: r.n_recent_clicks for r in events_range_join(spark, "unused").collect()}
    finally:
        asof_mod.tables = orig
    assert got == {1: 2, 6: 1}, got
