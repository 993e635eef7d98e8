"""Sketch aggregates have no cross-engine hash oracle; instead bound
their error against exact answers (mirrors how the reference tests
GenericUDAFPercentileApprox / NumDistinctValueEstimator accuracy).
"""

from pyspark.sql import functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.registry import all_queries


def test_sketch_aggregates_accuracy(spark, sf_dir):
    df = all_queries()["sketch_aggregates"].fn(spark, sf_dir).collect()
    t = tables(spark, sf_dir)
    exact = {
        r["l_returnflag"]: r
        for r in t.lineitem.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("median_price"),
        )
        .collect()
    }
    assert len(df) == 3
    for row in df:
        ex = exact[row["l_returnflag"]]
        assert abs(row["approx_orders"] - ex["n_orders"]) / ex["n_orders"] < 0.05
        assert abs(row["approx_median_price"] - ex["median_price"]) / ex["median_price"] < 0.05
        hist = row["qty_histogram"]
        assert len(hist) == 5 and all(b["y"] > 0 for b in hist)
