"""Measure the product-quantization trade at sf0.1: compressed-domain
ADC scan + exact rerank of a bounded shortlist vs the exact
brute-force cosine scan it approximates.

What actually scales (the quantity to watch is BYTES MOVED per
candidate, not wall-clock on a 32-thread single box):

- **brute force**: every query × every vector runs a 64-float dot
  product — 256 bytes of embedding read per (query, vector) pair.
- **PQ/ADC**: the corpus is pre-encoded to 8 one-byte codes per
  vector (a one-time scan); each (query, vector) candidate costs 8
  BIGINT lookups against a broadcast 8×16 table — the 256-byte float
  kernel never runs outside the top-200 rerank. At 100 TB of
  embeddings the compressed codes table is ~1/32 the bytes and the
  rerank touches 200 vectors per query instead of all of them.

Run: ``PYTHONPATH=. python experiments/pq_adc_bench.py`` — one JSON
line with wall-clocks, the candidate-volume arithmetic, and the
measured recall of the PQ result against the exact top-10.
"""

import json
import os
import time

from amplab_hive_spark.registry import all_queries
from amplab_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("pq-adc-bench")
    qs = all_queries()

    t0 = time.time()
    exact = qs["sim_bruteforce_topk"].fn(spark, SF_DIR).collect()
    t_exact = time.time() - t0

    t0 = time.time()
    pq = qs["sim_ann_pq"].fn(spark, SF_DIR).collect()
    t_pq = time.time() - t0

    from collections import defaultdict

    ex, got = defaultdict(set), defaultdict(set)
    for r in exact:
        ex[r.qid].add(r.vec_id)
    for r in pq:
        got[r.qid].add(r.vec_id)
    recalls = [len(ex[q] & got[q]) / len(ex[q]) for q in ex]

    n_vec = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    n_q = len(ex)
    print(
        json.dumps(
            {
                "experiment": "pq_adc_vs_bruteforce",
                "sf_dir": SF_DIR,
                "n_vectors": n_vec,
                "n_queries": n_q,
                "bruteforce_s": round(t_exact, 3),
                "pq_adc_s": round(t_pq, 3),
                "recall_at_10_mean": round(sum(recalls) / len(recalls), 3),
                "recall_at_10_min": round(min(recalls), 3),
                # bytes-moved arithmetic, the scale-relevant quantity:
                "float_kernel_pairs_bruteforce": n_q * n_vec,
                "float_kernel_pairs_pq": n_q * 200,  # rerank shortlist only
                "code_bytes_per_vector": 8,
                "embedding_bytes_per_vector": 256,
            }
        )
    )


if __name__ == "__main__":
    main()
