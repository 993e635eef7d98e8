"""Measure join-key skew and the engine's mitigation at sf0.1.

The reference hand-implements skew handling (SkewJoinHandler.java:74:
rows of a skewed key spill to side files, a follow-up map-join
processes them). This engine has two layers:

1. **AQE skew-join** (`spark.sql.adaptive.skewJoin.*`, on in
   session.py): at runtime an oversized shuffle partition is split
   and the build side replicated. OBSERVED on this Spark 4.1.2 /
   local[32] setup: the rule runs (`DEBUG OptimizeSkewedJoin:
   Optimizing skewed join`) but reports `number of skewed
   partitions: left 0, right 0` even for a 90%-one-key shuffle with
   factor=1.0 / threshold=100k — detection is calibrated for
   cluster-scale map statistics, so at bench scale it never fires.
   Keep it on (it is free), but do NOT rely on it as the only path.
2. **`salted_join` (operators/skew.py)** — the explicit, guaranteed
   mitigation: the skewed side's key is salted k ways, the build
   side replicated k ways, restoring parallelism deterministically
   at any scale. Equivalence-tested in test_formats_and_io.py.

This experiment constructs a 70%-one-key skew, shows the shuffle
partition histogram (the straggler evidence), then measures the
plain shuffle join vs salted_join(salt=16) and asserts identical
aggregate results. Run: ``PYTHONPATH=. python
experiments/skew_join_bench.py`` — one JSON line.

At sf0.1/local[32] wall-clock differences are modest (one straggler
among 32 in-memory threads); the quantity that scales is the
partition histogram: 70% of bytes in ONE task means a 1000-executor
cluster runs at 1/700 of its paid parallelism for that stage.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from amplab_hive_spark.operators.skew import salted_join
from amplab_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("skew-join-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # no broadcast: measure the shuffle-join regime skew matters in
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    # 70% of fact rows collapse onto join key 1.
    fact = lineitem.withColumn(
        "jk",
        F.when(F.col("l_orderkey") % 10 < 7, F.lit(1)).otherwise(F.col("l_orderkey")),
    ).select("jk", "l_quantity")
    dim = orders.select(F.col("o_orderkey").alias("jk"), "o_orderpriority")

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    hist = (
        fact.groupBy(F.expr(f"pmod(hash(jk), {n_part})").alias("p"))
        .count()
        .orderBy(F.desc("count"))
        .collect()
    )
    top = hist[0]["count"]
    total = sum(r["count"] for r in hist)

    def agg_of(joined):
        return joined.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(38,2)")).alias("qty"),
        )

    plain = agg_of(fact.join(dim, "jk"))
    salted = agg_of(salted_join(fact, dim, "jk", "jk", salt=16))

    for df in (plain, salted):  # codegen warmup
        df.collect()
    t0 = time.time(); plain_rows = plain.collect(); t_plain = time.time() - t0
    t0 = time.time(); salted_rows = salted.collect(); t_salted = time.time() - t0

    canon = lambda rows: sorted((r["o_orderpriority"], r["n"], str(r["qty"])) for r in rows)
    assert canon(plain_rows) == canon(salted_rows), "salting must not change results"

    print(
        json.dumps(
            {
                "experiment": "skew_join_mitigation",
                "sf_dir": SF_DIR,
                "shuffle_partitions": n_part,
                "skewed_partition_share": round(top / total, 3),
                "top_partition_rows": top,
                "median_partition_rows": sorted(r["count"] for r in hist)[len(hist) // 2],
                "plain_join_sec": round(t_plain, 3),
                "salted_join_sec": round(t_salted, 3),
                "results_identical": True,
                "aqe_skew_join_fired_at_this_scale": False,
            }
        )
    )


if __name__ == "__main__":
    main()
