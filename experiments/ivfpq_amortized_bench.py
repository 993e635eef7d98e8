"""Measure IVFPQ with the index PREBUILT — the serving-path shape.

ann_composition_bench showed cold-call IVFPQ wall-clock is dominated
by building BOTH indexes (IVF centroids + PQ codebook + encoding)
inside the query. A real pipeline builds the index once, stores it
(8 codes + 1 cid per vector — ~1/32 the float bytes), and amortizes
the build across every query batch. This experiment materializes
the index tables to parquet, then runs the search stage alone
against them, reporting build-once vs per-search wall-clock and the
stored-index byte footprint vs the raw embeddings.

Run: ``PYTHONPATH=. python experiments/ivfpq_amortized_bench.py`` —
one JSON line.
"""

import json
import os
import shutil
import tempfile
import time

from pyspark.sql import Window, functions as F

from amplab_hive_spark.llm.similarity import (
    _IVF_NPROBE,
    _IVFPQ_SHORTLIST,
    _ivf_dist,
    _pq_dist_int,
    _pq_encode,
    _pq_subvectors,
    _quantized,
    build_ivf_index,
    build_pq_codebook,
    cosine,
)
from amplab_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    spark = get_spark("ivfpq-amortized-bench")
    out = tempfile.mkdtemp(prefix="ivfpq_index_")
    try:
        embeddings = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

        # ---- build ONCE: centroids + codebook + encoded codes ----
        t0 = time.time()
        centroids, assigned = build_ivf_index(embeddings)
        codebook = build_pq_codebook(spark, assigned.select("vec_id", "q"))
        vec_sub = _pq_subvectors(
            spark, assigned.select("vec_id", "cid", "q"), carry=("vec_id", "cid")
        )
        encoded = _pq_encode(vec_sub, codebook, carry=("vec_id", "cid"))
        centroids.write.mode("overwrite").parquet(f"{out}/centroids")
        codebook.write.mode("overwrite").parquet(f"{out}/codebook")
        encoded.write.mode("overwrite").parquet(f"{out}/encoded")
        build_wall = round(time.time() - t0, 3)

        # ---- search: read the stored index, never rebuild ----
        t0 = time.time()
        cent = spark.read.parquet(f"{out}/centroids")
        cb = spark.read.parquet(f"{out}/codebook")
        codes = spark.read.parquet(f"{out}/encoded")
        queries = embeddings.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qv"),
            _quantized(F.col("embedding")).alias("qq"),
        )
        wq = Window.partitionBy("qid").orderBy("dist", "cid")
        probes = (
            queries.select("qid", "qq")
            .crossJoin(F.broadcast(cent))
            .select("qid", "cid", _ivf_dist(F.col("qq"), F.col("s"), F.col("n")).alias("dist"))
            .withColumn("rn", F.row_number().over(wq))
            .filter(F.col("rn") <= _IVF_NPROBE)
            .select("qid", "cid")
        )
        q_sub = _pq_subvectors(spark, queries.select("qid", "qq"), vec_col="qq", carry=("qid",))
        dtable = q_sub.join(F.broadcast(cb), "j").select(
            "qid", "j", "code", _pq_dist_int(F.col("sq"), F.col("cb")).alias("d")
        )
        adc = (
            codes.join(F.broadcast(probes), "cid")
            .filter(F.col("vec_id") != F.col("qid"))
            .join(F.broadcast(dtable), ["qid", "j", "code"])
            .groupBy("qid", "vec_id")
            .agg(F.sum("d").alias("adc_dist"))
        )
        w_adc = Window.partitionBy("qid").orderBy("adc_dist", "vec_id")
        shortlist = (
            adc.withColumn("arn", F.row_number().over(w_adc))
            .filter(F.col("arn") <= _IVFPQ_SHORTLIST)
            .select("qid", "vec_id")
        )
        rerank = (
            shortlist.join(F.broadcast(queries.select("qid", "qv")), "qid")
            .join(embeddings.select("vec_id", "embedding"), "vec_id")
            .select("qid", "vec_id", F.round(cosine(F.col("qv"), F.col("embedding")), 6).alias("cos_sim"))
        )
        w_rank = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "vec_id")
        n_results = (
            rerank.withColumn("rnk", F.row_number().over(w_rank))
            .filter(F.col("rnk") <= 10)
            .count()
        )
        search_wall = round(time.time() - t0, 3)

        raw_bytes = _dir_bytes(f"{SF_DIR}/embeddings.parquet") if os.path.isdir(
            f"{SF_DIR}/embeddings.parquet"
        ) else os.path.getsize(f"{SF_DIR}/embeddings.parquet")
        print(json.dumps({
            "sf_dir": SF_DIR,
            "build_once_sec": build_wall,
            "search_only_sec": search_wall,
            "n_results": n_results,
            "index_bytes": {
                "encoded_codes": _dir_bytes(f"{out}/encoded"),
                "centroids": _dir_bytes(f"{out}/centroids"),
                "codebook": _dir_bytes(f"{out}/codebook"),
            },
            "raw_embedding_bytes": raw_bytes,
        }))
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
