"""Same-session A/B: window-based probe ranking (r14) vs in-row
_probe_lists (r15) for sim_ann_ivf and sim_ann_ivfpq. Asserts
result-identity first. Usage:

    SPARK_GRAFT_SF_DIR=... python experiments/ab_ivf_probes_r15.py [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

import amplab_hive_spark.llm.similarity as sim
from amplab_hive_spark.catalog import tables
from amplab_hive_spark.llm._cache import cache_slot
from amplab_hive_spark.registry import all_queries
from amplab_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def old_sim_ann_ivf(spark, sf_dir):
    t = tables(spark, sf_dir)
    centroids, assigned = sim.build_ivf_index(t.embeddings)
    assigned = cache_slot("ab_old_ivf_assigned", assigned)
    queries = assigned.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qq"), F.col("embedding").alias("qv")
    )
    wq = Window.partitionBy("qid").orderBy("dist", "cid")
    probe_lists = (
        queries.crossJoin(F.broadcast(centroids))
        .select("qid", "qv", "cid",
                sim._ivf_dist(F.col("qq"), F.col("s"), F.col("n")).alias("dist"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= sim._IVF_NPROBE)
        .select("qid", "qv", sim._norm(F.col("qv")).alias("qn"), "cid")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        assigned.select("cid", "vec_id", "embedding",
                        sim._norm(F.col("embedding")).alias("cn"))
        .join(F.broadcast(probe_lists), "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id",
                F.round(sim._dot(F.col("qv"), F.col("embedding"))
                        / (F.col("qn") * F.col("cn")), 6).alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .orderBy("qid", "rnk")
    )


def old_sim_ann_ivfpq(spark, sf_dir):
    t = tables(spark, sf_dir)
    centroids, assigned = sim.build_ivf_index(t.embeddings)
    assigned = cache_slot("ab_old_ivfpq_assigned", assigned)
    codebook = cache_slot(
        "ab_old_ivfpq_codebook",
        sim.build_pq_codebook(spark, assigned.select("vec_id", "q")))
    vec_sub = sim._pq_subvectors(
        spark, assigned.select("vec_id", "cid", "q"), carry=("vec_id", "cid"))
    encoded = sim._pq_encode(vec_sub, codebook, carry=("vec_id", "cid"))
    queries = assigned.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qq"),
        F.col("embedding").alias("qv"))
    # --- r14 window-form search, inlined ---
    wq = Window.partitionBy("qid").orderBy("dist", "cid")
    probes = (
        queries.select("qid", "qq")
        .crossJoin(F.broadcast(centroids))
        .select("qid", "cid",
                sim._ivf_dist(F.col("qq"), F.col("s"), F.col("n")).alias("dist"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= sim._IVF_NPROBE)
        .select("qid", "cid")
    )
    q_sub = sim._pq_subvectors(spark, queries.select("qid", "qq"),
                               vec_col="qq", carry=("qid",))
    dtable = q_sub.join(F.broadcast(codebook), "j").select(
        "qid", "j", "code", sim._pq_dist_int(F.col("sq"), F.col("cb")).alias("d"))
    adc = (
        encoded.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .join(F.broadcast(dtable), ["qid", "j", "code"])
        .groupBy("qid", "vec_id")
        .agg(F.sum("d").alias("adc_dist"))
    )
    w_adc = Window.partitionBy("qid").orderBy("adc_dist", "vec_id")
    shortlist = (
        adc.withColumn("arn", F.row_number().over(w_adc))
        .filter(F.col("arn") <= sim._IVFPQ_SHORTLIST)
        .select("qid", "vec_id")
    )
    rerank = (
        shortlist.join(F.broadcast(queries.select("qid", "qv")), "qid")
        .join(assigned.select("vec_id", "embedding"), "vec_id")
        .select("qid", "vec_id",
                F.round(sim.cosine(F.col("qv"), F.col("embedding")), 6).alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        rerank.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .orderBy("qid", "rnk")
    )


def main() -> None:
    spark = get_spark("ab-ivf-probes")
    qs = all_queries()
    import struct

    def canon(df):
        def c(v):
            return struct.pack("<d", v) if isinstance(v, float) else v
        return sorted(tuple(c(v) for v in r) for r in df.collect())

    for name, old in (("sim_ann_ivf", old_sim_ann_ivf),
                      ("sim_ann_ivfpq", old_sim_ann_ivfpq)):
        new = qs[name].fn
        ident = canon(old(spark, SF_DIR)) == canon(new(spark, SF_DIR))
        old(spark, SF_DIR).collect(); new(spark, SF_DIR).collect()  # warm
        res = {}
        for label, fn in (("old", old), ("new", new)):
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter(); fn(spark, SF_DIR).collect()
                ts.append(time.perf_counter() - t0)
            res[label] = round(statistics.median(ts), 3)
        print(json.dumps({"op": name, **res,
                          "speedup": round(res["old"] / res["new"], 3),
                          "identical": ident, "sf_dir": SF_DIR,
                          "load1": round(os.getloadavg()[0], 2)}), flush=True)
        assert ident, name
    spark.stop()


if __name__ == "__main__":
    main()
