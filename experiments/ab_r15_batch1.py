"""Same-session A/B for r15 batch 1 (guide §1: measure first).

Pairs the r14 (HEAD) formulation of each touched operator — inlined
here verbatim-in-structure, reusing the repo's shared helpers — with
the r15 rewrite now in the package, runs both with the noop sink
(guide §1.4) in ONE JVM, and asserts the results are identical before
reporting timings. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python experiments/ab_r15_batch1.py [reps]

Prints one JSON line per operator: {"op", "old_sec", "new_sec",
"speedup", "rows", "identical": true}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from amplab_hive_spark.catalog import fan_out, tables
from amplab_hive_spark.llm._cache import cache_slot
from amplab_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


# --------------------------------------------------------------- r14 twins
def old_minhash(spark, sf_dir):
    """r14 dedup_minhash_lsh: FORCED broadcast of pair_ids."""
    from amplab_hive_spark.llm.dedup import (
        _MINHASH_PERMS, _explode_bands, _LSH_BUCKET_CAP, _shingles,
        minhash_signatures_arrow, pair_explode,
    )

    t = tables(spark, sf_dir)
    sigs = minhash_signatures_arrow(fan_out(t.documents, min_bytes=0))
    bands = _explode_bands(sigs)
    buckets = (
        bands.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "sig"))).alias("members"))
        .filter((F.size("members") > 1) & (F.size("members") <= _LSH_BUCKET_CAP))
    )
    est = (
        buckets.select(
            pair_explode(
                "members",
                {"doc_a": "{lo}.doc_id", "doc_b": "{hi}.doc_id",
                 "sig_a": "{lo}.sig", "sig_b": "{hi}.sig"},
            ).alias("p")
        )
        .select(
            "p.doc_a", "p.doc_b",
            (F.size(F.filter(F.zip_with("p.sig_a", "p.sig_b", lambda x, y: x == y),
                             lambda eq: eq)).cast("double") / _MINHASH_PERMS
             ).alias("est_jaccard"),
        )
        .distinct()
    )
    est = cache_slot("ab_old_minhash_est", est)
    pair_ids = est.select(F.explode(F.array("doc_a", "doc_b")).alias("doc_id")).distinct()
    cand_sh = cache_slot(
        "ab_old_minhash_cand_shingles",
        fan_out(
            t.documents.join(F.broadcast(pair_ids), "doc_id", "semi"), min_bytes=0
        ).select("doc_id", _shingles().alias("sh")),
    )
    va = cand_sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    vb = cand_sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        est.join(va, "doc_a").join(vb, "doc_b")
        .select(
            "doc_a", "doc_b", "est_jaccard",
            (F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
             / F.size(F.array_union("sh_a", "sh_b"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


def _old_members(docs):
    """r14 freq-join pair generation (two corpus passes, two posting
    exchanges)."""
    from amplab_hive_spark.llm.dedup import _JACCARD_DF_CAP, _shingles

    shingled = docs.select("doc_id", F.explode(_shingles()).alias("shingle"))
    freq = (
        shingled.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _JACCARD_DF_CAP)
    )
    return (
        shingled.join(freq, "shingle")
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
    )


def _jaccard_tail(members):
    from amplab_hive_spark.llm.dedup import pair_explode

    sizes = (
        members.select(F.explode("docs").alias("doc_id"))
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = (
        members.filter(F.size("docs") >= 2)
        .select(pair_explode("docs", {"doc_a": "{lo}", "doc_b": "{hi}"}).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b",
                (F.col("inter").cast("double")
                 / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"))
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
        .limit(20)
    )


def old_ngram_jaccard(spark, sf_dir):
    return _jaccard_tail(_old_members(tables(spark, sf_dir).documents))


def _containment_tail(members):
    from amplab_hive_spark.llm.dedup import _CONTAINMENT_MIN, pair_explode

    sizes = (
        members.select(F.explode("docs").alias("doc_id"))
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = (
        members.filter(F.size("docs") >= 2)
        .select(pair_explode("docs", {"doc_a": "{lo}", "doc_b": "{hi}"}).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    cont = F.col("inter").cast("double") / F.least("na", "nb")
    return (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", "inter", "na", "nb", cont.alias("containment"))
        .filter(F.col("containment") >= _CONTAINMENT_MIN)
        .orderBy(F.desc("containment"), "doc_a", "doc_b")
    )


def old_containment(spark, sf_dir):
    return _containment_tail(_old_members(tables(spark, sf_dir).documents))


def old_connected_components(edges, src="src", dst="dst", max_iter=20):
    """r14 connected_components: per-round convergence diff JOIN."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        lu = labels.select(F.col("node").alias("u"), F.col("comp").alias("cu"))
        lv = labels.select(F.col("node").alias("v"), F.col("comp").alias("cv"))
        le = e.join(lu, "u").join(lv, "v")
        prop = (
            le.select(F.col("u").alias("node"), F.least("cu", "cv").alias("cand"))
            .union(le.select(F.col("v").alias("node"), F.least("cu", "cv").alias("cand")))
            .groupBy("node")
            .agg(F.min("cand").alias("new_comp"))
        )
        new_labels = (
            labels.join(prop, "node", "left")
            .select("node",
                    F.least(F.col("comp"), F.coalesce("new_comp", F.col("comp"))).alias("comp"))
        )
        as_node = new_labels.select(F.col("node").alias("comp"), F.col("comp").alias("jumped"))
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
    else:
        raise RuntimeError("did not converge")
    return labels.select("node", "comp")


def old_cluster_resolution(spark, sf_dir):
    from amplab_hive_spark.llm.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    comp = old_connected_components(pairs, "doc_a", "doc_b")
    sizes = comp.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "comp")
        .select(F.col("node").alias("doc_id"), F.col("comp").alias("canonical_id"),
                (F.col("node") == F.col("comp")).alias("is_kept"), "cluster_size")
        .orderBy("doc_id")
    )


def old_q1(spark, sf_dir):
    """r14 q1: partials keyed on (group, pid) only — no overflow
    sub-bucket."""
    from amplab_hive_spark.operators._util import cents

    t = tables(spark, sf_dir)
    p2, d2, t2, q2 = (cents(c) for c in
                      ("l_extendedprice", "l_discount", "l_tax", "l_quantity"))
    partials = (
        t.lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .select(
            "l_returnflag", "l_linestatus",
            q2.alias("q2"), p2.alias("p2"), d2.alias("d2"),
            (p2 * (100 - d2)).alias("disc4"),
            (p2 * (100 - d2) * (100 + t2)).alias("charge6"),
        )
        .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid"))
        .agg(
            F.sum("q2").alias("sq"), F.sum("p2").alias("sp"),
            F.sum("disc4").alias("sd"), F.sum("charge6").alias("sc"),
            F.sum("d2").alias("sdisc"), F.count(F.lit(1)).alias("cnt"),
            F.count("q2").alias("cq"), F.count("p2").alias("cp"),
            F.count("d2").alias("cd"),
        )
    )
    totals = (
        partials.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("sq").cast("decimal(38,0)")).alias("sq"),
            F.sum(F.col("sp").cast("decimal(38,0)")).alias("sp"),
            F.sum(F.col("sd").cast("decimal(38,0)")).alias("sd"),
            F.sum(F.col("sc").cast("decimal(38,0)")).alias("sc"),
            F.sum(F.col("sdisc").cast("decimal(38,0)")).alias("sdisc"),
            F.sum("cnt").alias("cnt"),
            F.sum("cq").alias("cq"), F.sum("cp").alias("cp"),
            F.sum("cd").alias("cd"),
        )
    )
    return (
        totals.select(
            "l_returnflag", "l_linestatus",
            (F.col("sq") / 100).cast("double").alias("sum_qty"),
            (F.col("sp") / 100).cast("double").alias("sum_base_price"),
            (F.col("sd") / 10000).cast("double").alias("sum_disc_price"),
            (F.col("sc") / 1000000).cast("double").alias("sum_charge"),
            ((F.col("sq") / 100).cast("double") / F.col("cq")).alias("avg_qty"),
            ((F.col("sp") / 100).cast("double") / F.col("cp")).alias("avg_price"),
            ((F.col("sdisc") / 100).cast("double") / F.col("cd")).alias("avg_disc"),
            F.col("cnt").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------- harness
def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def time_fn(spark, fn, label: str) -> float:
    spark.sparkContext.setJobDescription(label)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        noop(fn())
        times.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    return round(statistics.median(times), 3)


def canon(df: DataFrame) -> list[tuple]:
    import struct

    def c(v):
        if isinstance(v, float):
            return struct.pack("<d", v)  # bit-identity for doubles
        return v

    return sorted(tuple(c(v) for v in row) for row in df.collect())


def main() -> None:
    spark = get_spark("ab-r15-batch1")
    new = {
        n: s.fn
        for n, s in __import__(
            "amplab_hive_spark.registry", fromlist=["all_queries"]
        ).all_queries().items()
    }
    pairs = [
        ("q1_pricing_summary", old_q1, new["q1_pricing_summary"]),
        ("dedup_ngram_jaccard", old_ngram_jaccard, new["dedup_ngram_jaccard"]),
        ("dedup_containment", old_containment, new["dedup_containment"]),
        ("dedup_minhash_lsh", old_minhash, new["dedup_minhash_lsh"]),
        ("dedup_cluster_resolution", old_cluster_resolution,
         new["dedup_cluster_resolution"]),
    ]
    for name, old_fn, new_fn in pairs:
        a = canon(old_fn(spark, SF_DIR))
        b = canon(new_fn(spark, SF_DIR))
        ident = a == b
        # warmup one rep each, then interleave-free medians
        noop(old_fn(spark, SF_DIR))
        noop(new_fn(spark, SF_DIR))
        old_t = time_fn(spark, lambda: old_fn(spark, SF_DIR), f"{name}:old")
        new_t = time_fn(spark, lambda: new_fn(spark, SF_DIR), f"{name}:new")
        print(json.dumps({
            "op": name, "old_sec": old_t, "new_sec": new_t,
            "speedup": round(old_t / new_t, 3) if new_t else None,
            "rows": len(b), "identical": ident, "sf_dir": SF_DIR,
            "load1": round(os.getloadavg()[0], 2),
        }), flush=True)
        assert ident, f"{name}: results differ between old and new forms"
    spark.stop()


if __name__ == "__main__":
    main()
