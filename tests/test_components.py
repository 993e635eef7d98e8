"""Connected components (llm/components.py) vs a Python union-find
oracle — including the shapes that break naive propagation: long
chains (diameter ≫ rounds without pointer jumping), stars, and
disconnected singleton-pair soup. Plus the end-to-end dedup cluster
resolution invariants."""

import random

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from amplab_hive_spark.llm.components import connected_components, dedup_cluster_resolution


def union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min node in component
    comp = {}
    for n in list(parent):
        comp[n] = find(n)
    return comp


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: r.comp for r in connected_components(df).collect()}
    want = union_find(edges)
    # same partition of nodes into groups, same canonical min-label
    assert got == want


def test_chain_needs_pointer_jumping(spark):
    _check(spark, [(i, i + 1) for i in range(40)])


def test_star_and_separate_cluster(spark):
    edges = [(0, i) for i in range(1, 8)] + [(100, 101), (101, 102)]
    _check(spark, edges)


def test_two_chains_merged_by_bridge(spark):
    edges = [(i, i + 1) for i in range(10)] + [(20 + i, 21 + i) for i in range(10)] + [(5, 25)]
    _check(spark, edges)


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = rng.randint(2, 60)
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(rng.randint(1, 2 * n))
    ]
    edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
    _check(spark, edges)


def test_dedup_cluster_resolution_invariants(spark, sf_dir):
    res = dedup_cluster_resolution(spark, sf_dir)
    rows = res.collect()
    assert rows, "sf0.01 documents contain near-dup clusters"
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.canonical_id, []).append(r)
    for comp, members in by_comp.items():
        ids = [m.doc_id for m in members]
        assert comp == min(ids), "canonical must be the min doc_id"
        kept = [m for m in members if m.is_kept]
        assert len(kept) == 1 and kept[0].doc_id == comp
        assert all(m.cluster_size == len(members) for m in members)
        assert len(members) >= 2, "singletons must not appear"


def test_connected_components_raises_on_non_convergence(spark):
    """Exhausting max_iter with labels still changing must raise, not
    return mid-propagation labels (which would split one real cluster
    into several 'canonical' groups silently)."""
    import pytest as _pytest

    from amplab_hive_spark.llm.components import connected_components

    edges = spark.createDataFrame([(i, i + 1) for i in range(64)], "src long, dst long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1).collect()
    # the same chain converges with the default budget
    comp = connected_components(edges)
    assert comp.select("comp").distinct().count() == 1
