"""text_langid scoring-pass variants (VERDICT r14 item 6): can the
per-character explode fold into something cheaper without touching the
trained-model mechanism (profile = explode + groupBy, unchanged)?

Variants (same integer-exact score, same argmax, bit-identical rows):
  current — explode bigrams, broadcast-join profile (one row per
            (bigram instance × lang sharing it)), groupBy doc.
  preagg  — explode ONCE into per-(doc,bigram) counts c, join the
            per-bigram PACKED profile row (array of (p_lang, n)),
            explode the ≤|langs| array, sum c·n per (doc, p_lang).
            Join fan-out shrinks from |instances|×langs to
            |distinct postings|×langs.

Usage: SPARK_GRAFT_SF_DIR=... python experiments/ab_langid_r15.py [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def _bigrams(spark, sf_dir):
    t = tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "lang", F.lower("text").alias("txt"))
    return docs.select(
        "doc_id", "lang",
        F.explode(
            F.when(
                F.length("txt") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.length("txt") - 1),
                    lambda i: F.col("txt").substr(i, F.lit(2)),
                ),
            ).otherwise(F.expr("array()").cast("array<string>"))
        ).alias("bigram"),
    )


def _head(bigrams):
    profile = (
        bigrams.groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("lang").alias("p_lang"), "bigram", "n")
    )
    totals = profile.groupBy("p_lang").agg(F.sum("n").cast("bigint").alias("total"))
    return profile, totals


def _rank(scored):
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "p_lang")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("label"), F.col("p_lang").alias("predicted"))
        .orderBy("doc_id")
    )


def langid_current(spark, sf_dir):
    bigrams = _bigrams(spark, sf_dir)
    profile, totals = _head(bigrams)
    scored = (
        bigrams.join(F.broadcast(profile), "bigram")
        .groupBy("doc_id", "lang", "p_lang")
        .agg(F.sum("n").cast("bigint").alias("matched"))
        .join(F.broadcast(totals), "p_lang")
        .withColumn("score", F.col("matched").cast("double") / F.col("total"))
    )
    return _rank(scored)


def langid_preagg(spark, sf_dir):
    bigrams = _bigrams(spark, sf_dir)
    profile, totals = _head(bigrams)
    packed = profile.groupBy("bigram").agg(
        F.collect_list(F.struct("p_lang", "n")).alias("pls")
    )
    dbg = bigrams.groupBy("doc_id", "lang", "bigram").agg(
        F.count(F.lit(1)).alias("c")
    )
    scored = (
        dbg.join(F.broadcast(packed), "bigram")
        .select("doc_id", "lang", "c", F.explode("pls").alias("pl"))
        .groupBy("doc_id", "lang", F.col("pl.p_lang").alias("p_lang"))
        .agg(F.sum(F.col("c") * F.col("pl.n")).cast("bigint").alias("matched"))
        .join(F.broadcast(totals), "p_lang")
        .withColumn("score", F.col("matched").cast("double") / F.col("total"))
    )
    return _rank(scored)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("ab-langid-r15")
    a = sorted(tuple(r) for r in langid_current(spark, SF_DIR).collect())
    b = sorted(tuple(r) for r in langid_preagg(spark, SF_DIR).collect())
    ident = a == b
    for fn in (langid_current, langid_preagg):
        noop(fn(spark, SF_DIR))  # warm
    out = {}
    for label, fn in (("current", langid_current), ("preagg", langid_preagg)):
        spark.sparkContext.setJobDescription(f"langid:{label}")
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            noop(fn(spark, SF_DIR))
            ts.append(time.perf_counter() - t0)
        out[label] = round(statistics.median(ts), 3)
    print(json.dumps({"op": "text_langid", **out, "identical": ident,
                      "rows": len(a), "sf_dir": SF_DIR,
                      "load1": round(os.getloadavg()[0], 2)}), flush=True)
    assert ident
    spark.stop()


if __name__ == "__main__":
    main()
