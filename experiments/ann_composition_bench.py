"""Measure the full ANN ladder at sf0.1: exact brute force → IVF
(route only) → flat PQ (compress only) → IVFPQ (route × compress),
the composition the similarity module builds up to.

What actually scales (the quantity to watch is CANDIDATES SCORED per
query and BYTES per candidate, not wall-clock on one 32-thread box):

- **brute**: Q × N float kernels, 256 bytes/candidate.
- **IVF**: Q × (nprobe/K share of N) float kernels — routing cuts the
  candidate count, each candidate still costs the full float kernel.
- **flat PQ**: Q × N compressed lookups, 8 bytes/candidate — the
  kernel is cheap but the scan is still the whole corpus.
- **IVFPQ**: Q × (probed share of N) compressed lookups — BOTH axes
  cut; the float kernel runs only on the top-{shortlist} rerank.

Run: ``PYTHONPATH=. python experiments/ann_composition_bench.py`` —
one JSON line with per-method wall-clock, recall@10 vs the exact
top-10, and the probed-fraction / candidate-volume arithmetic.
"""

import json
import os
import time

from amplab_hive_spark.registry import all_queries
from amplab_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

METHODS = {
    "brute": "sim_bruteforce_topk",
    "ivf": "sim_ann_ivf",
    "pq_flat": "sim_ann_pq",
    "ivfpq": "sim_ann_ivfpq",
}


def main() -> None:
    spark = get_spark("ann-composition-bench")
    specs = all_queries()
    results: dict[str, dict] = {}
    top: dict[str, dict] = {}
    for label, name in METHODS.items():
        t0 = time.time()
        rows = specs[name].fn(spark, SF_DIR).collect()
        wall = round(time.time() - t0, 3)
        by_q: dict = {}
        for r in rows:
            by_q.setdefault(r.qid, set()).add(r.vec_id)
        top[label] = by_q
        results[label] = {"wall_sec": wall, "n_queries": len(by_q)}

    exact = top["brute"]
    for label in ("ivf", "pq_flat", "ivfpq"):
        recalls = [
            len(top[label].get(q, set()) & hits) / max(1, len(hits))
            for q, hits in exact.items()
        ]
        results[label]["recall_at_10"] = {
            "mean": round(sum(recalls) / len(recalls), 3),
            "min": round(min(recalls), 3),
        }

    # candidate-volume arithmetic: what fraction of the corpus each
    # method SCORES per query (the number that survives a 1000x
    # corpus, unlike the single-box wall-clocks above)
    from amplab_hive_spark.llm.similarity import (
        _IVF_CENTROIDS,
        _IVF_NPROBE,
        _IVFPQ_SHORTLIST,
        _PQ_SHORTLIST,
        _PQ_SUBSPACES,
    )

    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    probed_share = _IVF_NPROBE / _IVF_CENTROIDS  # balanced-cell estimate
    results["arithmetic"] = {
        "corpus": n,
        "ivf_probed_share_balanced": round(probed_share, 3),
        "bytes_per_candidate": {"float_kernel": 256, "adc": _PQ_SUBSPACES},
        "float_kernels_per_query": {
            "brute": n,
            "ivf": int(n * probed_share),
            "pq_flat": _PQ_SHORTLIST,
            "ivfpq": _IVFPQ_SHORTLIST,
        },
        "compressed_lookups_per_query": {
            "brute": 0,
            "ivf": 0,
            "pq_flat": n,
            "ivfpq": int(n * probed_share),
        },
    }
    print(json.dumps({"sf_dir": SF_DIR, **results}))


if __name__ == "__main__":
    main()
