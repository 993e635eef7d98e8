"""Measure what bucketing buys: the SMB-join story at sf0.1.

The reference's bucket-map / sort-merge-bucket joins
(SMBMapJoinOperator.java:57, BucketMapJoinOptimizer.java:44) exist
to join co-bucketed tables without a shuffle. Spark's equivalent is
``bucketBy`` tables + sort-merge join: when both sides are bucketed
on the join key with matching bucket counts, the Exchange disappears
from the plan.

Run: ``python experiments/bucketed_join_bench.py`` — prints one JSON
line with shuffle-join vs bucketed-join timings and the exchange
counts observed in each plan. Writes bucketed copies under
spark-warehouse/ (dropped and recreated per run).
"""

import json
import os
import shutil
import time

from amplab_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BUCKETS = 16


def timed(df) -> tuple[float, int]:
    t0 = time.time()
    n = df.count()
    return time.time() - t0, n


def main() -> None:
    spark = get_spark("bucketed-join-bench")
    # broadcast would hide the effect at this SF (orders fits under the
    # threshold); at 100 TB neither side broadcasts, so force SMJ to
    # measure what bucketing buys in the regime bucketing exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("bb_lineitem", "bb_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a fresh in-memory catalog doesn't know about last run's dirs
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    lineitem.write.bucketBy(BUCKETS, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("bb_lineitem")
    orders.write.bucketBy(BUCKETS, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("bb_orders")

    def join_of(l, o):
        return (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )

    # steady state: warm each shape once, then measure
    plain = join_of(lineitem, orders)
    bl, bo = spark.table("bb_lineitem"), spark.table("bb_orders")
    bucketed = join_of(bl, bo)
    for df in (plain, bucketed):
        df.count()

    t_plain, n1 = timed(join_of(lineitem, orders))
    t_bucketed, n2 = timed(join_of(bl, bo))
    assert n1 == n2

    def exchanges(df) -> int:
        df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.split("== Initial Plan ==")[0].count("Exchange hashpartitioning")

    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "buckets": BUCKETS,
                "shuffle_join_sec": round(t_plain, 3),
                "bucketed_join_sec": round(t_bucketed, 3),
                "shuffle_join_exchanges": exchanges(join_of(lineitem, orders)),
                "bucketed_join_exchanges": exchanges(join_of(bl, bo)),
            }
        )
    )


if __name__ == "__main__":
    main()
