"""Connected components over the near-duplicate pair graph —
cluster resolution, the step after candidate pairs in a real dedup
pipeline: duplicates are transitive (A~B, B~C ⇒ one cluster), so
keep-one filtering needs each doc's component, not just its pairs.

Algorithm: alternating large-star / small-star label propagation
(Kiveris et al., "Connected Components in MapReduce and Beyond",
ACM SoCC 2014 — the standard shuffle-friendly formulation). Each
round is two join+agg passes over the edge list; convergence in
O(log² n) rounds on real graphs (near-dup graphs are shallow —
typically 2-3 rounds). Everything is DataFrame ops: the edge list
shuffles on node id, labels propagate as min(component id), no
driver-side state beyond the convergence counter.

Scale: state per round = the edge list itself (node-id pairs, no
payload). A 100 TB corpus with 1% dup rate has ~1e9 edges ≈ 16 GB
shuffled per round — trivial next to the candidate-generation scan.
Iteration count is data-dependent but bounded by graph diameter,
which LSH pair graphs keep tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.registry import register


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """Return (node, component) with component = min node id
    reachable. Input edges are undirected (either orientation).

    Each round references ``labels`` several times (edge join ×2,
    pointer-jump self-join, convergence diff), so without lineage
    truncation the Catalyst plan grows ~4× per iteration and the
    driver OOMs analyzing it around round 6. ``localCheckpoint``
    materializes the round's result and replaces the plan with a
    leaf scan — on a real cluster swap for ``checkpoint()`` with an
    HDFS dir if executor loss must be survivable mid-computation.
    """
    # normalize: undirected edge set, self-loops dropped
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    # label = current component guess per node, init = own id
    labels = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # attach labels to both endpoints
        lu = labels.select(F.col("node").alias("u"), F.col("comp").alias("cu"))
        lv = labels.select(F.col("node").alias("v"), F.col("comp").alias("cv"))
        le = e.join(lu, "u").join(lv, "v")
        # min-label propagation: each node adopts the smallest
        # component seen across its incident edges (star contraction)
        prop = (
            le.select(F.col("u").alias("node"), F.least("cu", "cv").alias("cand"))
            .union(le.select(F.col("v").alias("node"), F.least("cu", "cv").alias("cand")))
            .groupBy("node")
            .agg(F.min("cand").alias("new_comp"))
        )
        new_labels = (
            labels.join(prop, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("new_comp", F.col("comp"))).alias("comp"),
            )
        )
        # pointer-jump (small-star): comp := comp's comp, collapsing
        # chains so convergence is logarithmic, not diameter-linear
        as_node = new_labels.select(
            F.col("node").alias("comp"), F.col("comp").alias("jumped")
        )
        new_labels = (
            new_labels.join(as_node, "comp", "left")
            .select("node", F.coalesce("jumped", F.col("comp")).alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", "comp")


@register("dedup_cluster_resolution", tags=("llm", "dedup", "iterative"), oracle=None)
def dedup_cluster_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end keep-one dedup decision table: MinHash-LSH pairs →
    connected components → per-cluster canonical doc (min doc_id).
    Returns (doc_id, canonical_id, is_kept, cluster_size) for every
    doc that belongs to a near-dup cluster. Iterative (join-per-round
    label propagation) — genuinely non-SQL-expressible, driver gets
    the rows-only check; exactness is covered by unit tests against
    a Python union-find oracle."""
    from amplab_hive_spark.llm.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs, "doc_a", "doc_b")
    sizes = comp.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "comp")
        .select(
            F.col("node").alias("doc_id"),
            F.col("comp").alias("canonical_id"),
            (F.col("node") == F.col("comp")).alias("is_kept"),
            "cluster_size",
        )
        .orderBy("doc_id")
    )
