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

from pyspark.sql import functions as F

from amplab_hive_spark.llm.similarity import (
    _pq_encode,
    _pq_subvectors,
    _quantized,
    build_ivf_index,
    build_pq_codebook,
    ivfpq_search,
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

        # ---- search: read the stored index, never rebuild — through
        # the SAME ivfpq_search the registry query uses, so these
        # numbers cannot drift from the shipped algorithm ----
        t0 = time.time()
        queries = embeddings.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("qid"),
            _quantized(F.col("embedding")).alias("qq"),
            F.col("embedding").alias("qv"),
        )
        n_results = ivfpq_search(
            spark,
            queries,
            spark.read.parquet(f"{out}/centroids"),
            spark.read.parquet(f"{out}/codebook"),
            spark.read.parquet(f"{out}/encoded"),
            embeddings.select("vec_id", "embedding"),
        ).count()
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
