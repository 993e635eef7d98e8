"""Stage-by-stage profile of acid_mor_lifecycle and
streaming_upsert_cdc_lifecycle (VERDICT r14 item 4): wall-clock and
SPARK JOB COUNT per lifecycle verb, so incidental driver barriers
(extra count()/isEmpty() jobs) are visible independent of host load.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python experiments/lifecycle_profile_r15.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from amplab_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


class Prof:
    def __init__(self, spark):
        self.spark = spark
        self.steps = []

    def _jobs(self) -> int:
        return len(self.spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None))

    def step(self, label):
        prof = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()
                self.j0 = prof._jobs()

            def __exit__(self, *exc):
                prof.steps.append({
                    "step": label,
                    "sec": round(time.perf_counter() - self.t0, 3),
                    "jobs": prof._jobs() - self.j0,
                })

        return _Ctx()


def profile_acid(spark) -> list[dict]:
    from amplab_hive_spark.engine import Engine

    p = Prof(spark)
    name = f"prof_mor_{uuid.uuid4().hex[:8]}"
    loc = tempfile.mkdtemp(prefix="prof_mor_")
    engine = Engine(spark)
    try:
        with p.step("create+insert"):
            spark.sql(
                f"CREATE TABLE {name} (l_orderkey BIGINT, l_linenumber INT, "
                f"l_quantity DOUBLE, l_returnflag STRING) USING parquet "
                f"LOCATION '{loc}/{name}' TBLPROPERTIES "
                f"('transactional'='true', 'merge_keys'='l_orderkey,l_linenumber')"
            )
            src = f"prof_src_{uuid.uuid4().hex[:8]}"
            (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
             .filter("l_orderkey <= 100")
             .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
             .createOrReplaceTempView(src))
            spark.sql(f"INSERT INTO {name} SELECT * FROM {src}")
            spark.catalog.dropTempView(src)
        with p.step("update"):
            engine.sql(f"UPDATE {name} SET l_quantity = l_quantity + 100 "
                       f"WHERE l_returnflag = 'R'")
        with p.step("delete"):
            engine.sql(f"DELETE FROM {name} WHERE l_linenumber = 7")
        with p.step("read_pre"):
            engine.sql(f"SELECT l_returnflag, COUNT(*), SUM(l_quantity) "
                       f"FROM {name} GROUP BY l_returnflag").collect()
        with p.step("compact_minor"):
            engine.sql(f"ALTER TABLE {name} COMPACT 'minor'")
        with p.step("read_post_minor"):
            engine.sql(f"SELECT l_returnflag, COUNT(*), SUM(l_quantity) "
                       f"FROM {name} GROUP BY l_returnflag").collect()
        with p.step("compact_major"):
            engine.sql(f"ALTER TABLE {name} COMPACT 'major'")
        with p.step("read_post_major"):
            engine.sql(f"SELECT l_returnflag, COUNT(*), SUM(l_quantity) "
                       f"FROM {name} GROUP BY l_returnflag").collect()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(loc, ignore_errors=True)
    return p.steps


def profile_streaming(spark) -> list[dict]:
    from amplab_hive_spark.engine import Engine
    from amplab_hive_spark.streaming.tombstones import apply_tombstone_batch
    from amplab_hive_spark.streaming.upsert import merge_upsert_batch

    p = Prof(spark)
    name = f"prof_cdc_{uuid.uuid4().hex[:8]}"
    loc = tempfile.mkdtemp(prefix="prof_cdc_")
    engine = Engine(spark)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    try:
        with p.step("create+insert"):
            spark.sql(
                f"CREATE TABLE {name} (o_orderkey BIGINT, o_orderstatus STRING, "
                f"o_totalprice DOUBLE, v INT) USING parquet "
                f"LOCATION '{loc}/{name}' TBLPROPERTIES "
                f"('transactional'='true', 'merge_keys'='o_orderkey')")
            init = (orders.filter("o_orderkey <= 200")
                    .select("o_orderkey", "o_orderstatus", "o_totalprice",
                            F.lit(1).alias("v")))
            src = f"prof_cdc_src_{uuid.uuid4().hex[:8]}"
            init.createOrReplaceTempView(src)
            spark.sql(f"INSERT INTO {name} SELECT * FROM {src}")
            spark.catalog.dropTempView(src)
        batch = (orders.filter("o_orderkey BETWEEN 101 AND 300")
                 .select("o_orderkey", "o_orderstatus",
                         (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice"),
                         F.lit(2).alias("v")))
        with p.step("merge_upsert_1"):
            merge_upsert_batch(spark, name, batch, ["o_orderkey"], ["v"])
        with p.step("read_p1"):
            engine.sql(f"SELECT o_orderstatus, COUNT(*) FROM {name} "
                       f"GROUP BY o_orderstatus").collect()
        with p.step("merge_upsert_redeliver"):
            merge_upsert_batch(spark, name, batch, ["o_orderkey"], ["v"])
        with p.step("read_p2"):
            engine.sql(f"SELECT o_orderstatus, COUNT(*) FROM {name} "
                       f"GROUP BY o_orderstatus").collect()
        tombstones = (orders.filter("o_orderkey <= 300 AND o_orderkey % 10 = 0")
                      .select("o_orderkey"))
        with p.step("tombstones_1"):
            apply_tombstone_batch(spark, name, tombstones, ["o_orderkey"])
        with p.step("read_p3"):
            engine.sql(f"SELECT o_orderstatus, COUNT(*) FROM {name} "
                       f"GROUP BY o_orderstatus").collect()
        with p.step("tombstones_redeliver"):
            apply_tombstone_batch(spark, name, tombstones, ["o_orderkey"])
        with p.step("compact_major"):
            engine.sql(f"ALTER TABLE {name} COMPACT 'major'")
        with p.step("read_p4"):
            engine.sql(f"SELECT o_orderstatus, COUNT(*) FROM {name} "
                       f"GROUP BY o_orderstatus").collect()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(loc, ignore_errors=True)
    return p.steps


def main() -> None:
    warehouse = tempfile.mkdtemp(prefix="prof_wh_")
    spark = get_spark("lifecycle-prof-r15")
    try:
        for label, fn in (("acid_mor", profile_acid),
                          ("streaming_cdc", profile_streaming)):
            fn(spark)  # warm (codegen, catalogs)
            steps = fn(spark)
            total = round(sum(s["sec"] for s in steps), 3)
            jobs = sum(s["jobs"] for s in steps)
            print(json.dumps({"lifecycle": label, "total_sec": total,
                              "total_jobs": jobs, "steps": steps,
                              "load1": round(os.getloadavg()[0], 2)}), flush=True)
    finally:
        spark.stop()
        shutil.rmtree(warehouse, ignore_errors=True)


if __name__ == "__main__":
    main()
