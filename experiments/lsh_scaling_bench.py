"""Measure how MinHash-LSH candidate volume scales with corpus size —
the property that makes bucketed dedup the 100 TB path.

All-pairs comparisons grow quadratically (N²/2); LSH candidates
should track the number of genuinely-similar pairs (≈ linear in N
for a corpus with a fixed dup rate). This experiment runs the
candidate-generation stage of dedup_minhash_lsh at the two distinct
corpus sizes the driver ships (500 docs at sf0.01, 5000 at sf0.1)
and reports the growth ratio of candidates vs the 100× growth of
the all-pairs space.

Run: ``PYTHONPATH=. python experiments/lsh_scaling_bench.py`` — one
JSON line.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.llm.dedup import (
    _LSH_BANDS,
    _LSH_BUCKET_CAP,
    _MINHASH_PERMS,
    minhash_signatures_arrow,
)
from amplab_hive_spark.session import get_spark


def candidate_count(spark, sf_dir: str) -> dict:
    """Candidate pairs emitted by the banded-bucket stage (before
    exact verification) + wall time for the full stage."""
    docs = tables(spark, sf_dir).documents
    n_docs = docs.count()
    rows_per_band = _MINHASH_PERMS // _LSH_BANDS
    t0 = time.perf_counter()
    sigs = minhash_signatures_arrow(docs)
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_LSH_BANDS - 1)),
                lambda band: F.struct(
                    band.alias("band"),
                    F.concat_ws(
                        "_",
                        F.transform(
                            F.slice("sig", band * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    ).alias("bucket"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.bucket")
    members = (
        bands.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("m"))
        .filter((F.col("m") > 1) & (F.col("m") <= _LSH_BUCKET_CAP))
    )
    # Σ m·(m−1)/2 per bucket = candidate pairs before cross-band dedup
    cand = (
        members.agg(F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("c")).collect()[0]["c"]
        or 0
    )
    wall = time.perf_counter() - t0
    return {
        "n_docs": n_docs,
        "all_pairs": n_docs * (n_docs - 1) // 2,
        "candidates": int(cand),
        "stage_sec": round(wall, 3),
    }


def main() -> None:
    spark = get_spark("lsh-scaling")
    small = candidate_count(spark, "/root/testdata/sf0.01")
    large = candidate_count(spark, "/root/testdata/sf0.1")
    growth_pairs = large["all_pairs"] / max(small["all_pairs"], 1)
    growth_cand = large["candidates"] / max(small["candidates"], 1)
    out = {
        "metric": "lsh_candidate_scaling",
        "small": small,
        "large": large,
        "corpus_growth": round(large["n_docs"] / small["n_docs"], 1),
        "all_pairs_growth": round(growth_pairs, 1),
        "candidate_growth": round(growth_cand, 1),
    }
    # The claim: candidates grow FAR slower than the quadratic
    # all-pairs space (on 10× docs: pairs grow ~100×).
    assert growth_cand < growth_pairs / 2, out
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
