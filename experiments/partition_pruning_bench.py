"""Measure what partition layout buys: static pruning + dynamic
partition pruning (DPP), the Spark realization of the reference's
PartitionPruner (Optimizer.java:80) and Tez-era DPP events
(AppMasterEventOperator.java:45, DynamicPartitionPruningOptimization.java:73).

Writes the sf0.1 events table partitioned by event date, then
measures:
  1. full scan aggregate (no partition predicate),
  2. statically pruned aggregate (one day),
  3. DPP: join against a tiny filtered dim on the partition key —
     the partition filter is only known at runtime.

Run: ``PYTHONPATH=. python experiments/partition_pruning_bench.py``
— one JSON line with timings, files read, and whether the DPP
subquery fired in the plan.
"""

import json
import os
import shutil
import time

from pyspark.sql import functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(df):
    t0 = time.time()
    df.count()
    return time.time() - t0


def files_read(df) -> int:
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # "files read" isn't in the plan text; use partition filters as proxy
    return plan.count("PartitionFilters")


def main() -> None:
    spark = get_spark("partition-pruning-bench")
    # catalog converts the TIMESTAMP(NANOS) column; raw reads see LONG
    events = tables(spark, SF_DIR).events
    path = "/tmp/pp_events"
    shutil.rmtree(path, ignore_errors=True)
    events.withColumn("event_date", F.to_date("ts")).write.partitionBy(
        "event_date"
    ).parquet(path)
    part = spark.read.parquet(path)
    n_days = part.select("event_date").distinct().count()

    full = part.groupBy("event_type").count()
    one_day = part.filter(
        F.col("event_date") == part.agg(F.min("event_date")).collect()[0][0]
    ).groupBy("event_type").count()

    # DPP probe: dim table of 3 dates, filter known only at runtime
    dim = (
        part.select("event_date").distinct().orderBy("event_date").limit(3)
        .withColumn("keep", F.lit(1))
    )
    dim.write.mode("overwrite").parquet("/tmp/pp_dim")
    # DPP requires a selective filter on the dim side (the runtime-
    # only predicate that makes static pruning impossible)
    dimr = spark.read.parquet("/tmp/pp_dim").filter(F.col("keep") == 1)
    dpp_join = part.join(dimr, "event_date").groupBy("event_type").count()

    for df in (full, one_day, dpp_join):  # warm codegen
        df.count()

    t_full, t_one, t_dpp = timed(full), timed(one_day), timed(dpp_join)
    dpp_join.count()
    dpp_plan = dpp_join._jdf.queryExecution().executedPlan().toString()

    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "n_partitions": n_days,
                "full_scan_sec": round(t_full, 3),
                "one_day_sec": round(t_one, 3),
                "dpp_join_sec": round(t_dpp, 3),
                "static_pruning_in_plan": "PartitionFilters: [isnotnull(event_date"
                in one_day._jdf.queryExecution().executedPlan().toString(),
                "dpp_fired": "dynamicpruning" in dpp_plan.lower()
                or "SubqueryBroadcast" in dpp_plan,
            }
        )
    )


if __name__ == "__main__":
    main()
