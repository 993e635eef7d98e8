"""fan_out scaling evidence (VERDICT r14 item 7).

The driver's sf0.1 fixtures are SINGLE-row-group parquet files, so
every scan is one task and the 8-vs-32-core bench ratios sit at ~1 —
that block cannot distinguish the engine from the fixture layout.
This experiment separates the two on the 10x tiled corpus:

  layout=multi  — documents/embeddings rewritten as 32 parquet files
                  (the healthy-cluster layout). fan_out must be a
                  NO-OP (plan checked), and the compute-heavy stages
                  should scale with cores on their own.
  layout=single — the tiled corpus left as one file per table (the
                  fixture layout). fan_out fires, and the same
                  stages should STILL scale with cores — i.e. the
                  repartition recovers the parallelism the layout
                  took away.

Stages measured (the fan_out consumers): minhash signatures
(dedup_simhash's Arrow scan shares the shape) and the brute-force
cosine probe. Each (layout, cores) cell runs in its OWN process
(master is fixed per JVM): this script re-executes itself via
SPARK_GRAFT_CPUS. Writes experiments/fanout_scaling_r15.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MULTI_DIR = "/tmp/amplab_10x/sf1_multifile"
SINGLE_DIR = "/tmp/amplab_10x/sf1"
REPS = 3


def prepare() -> None:
    from experiments.scale10x_bench import ensure_dataset

    ensure_dataset(SINGLE_DIR)
    marker = os.path.join(MULTI_DIR, "_DONE")
    if os.path.exists(marker):
        return
    from amplab_hive_spark.session import get_spark

    spark = get_spark("fanout-prep")
    os.makedirs(MULTI_DIR, exist_ok=True)
    for t in ("documents", "embeddings"):
        (spark.read.parquet(f"{SINGLE_DIR}/{t}.parquet")
         .repartition(32)
         .write.mode("overwrite").parquet(f"{MULTI_DIR}/{t}.parquet"))
    # the other tables are only read by the harness's table loader —
    # symlink them so tables() resolves everything
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        dst = f"{MULTI_DIR}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SINGLE_DIR}/{t}.parquet", dst)
    open(marker, "w").close()
    spark.stop()


def run_cell(sf_dir: str) -> dict:
    """One (layout, cores) cell: time the two fan_out consumer stages
    with the noop sink; report whether fan_out fired (plan contains
    the round-robin exchange)."""
    from pyspark.sql import functions as F

    from amplab_hive_spark.catalog import fan_out, tables
    from amplab_hive_spark.llm.dedup import minhash_signatures_arrow
    from amplab_hive_spark.session import get_spark

    spark = get_spark("fanout-cell")
    t = tables(spark, sf_dir)

    def sig_stage():
        return minhash_signatures_arrow(fan_out(t.documents, min_bytes=0))

    def probe_stage():
        corpus = fan_out(t.embeddings, min_bytes=0).select("doc_id", "vec")
        q = corpus.filter(F.col("doc_id") % 97 == 0).select(
            F.col("doc_id").alias("qid"), F.col("vec").alias("qv"))
        # dot-product fan-out probe (sim_bruteforce's per-row shape)
        return (corpus.crossJoin(F.broadcast(q))
                .select((F.aggregate(F.zip_with("vec", "qv", lambda a, b: a * b),
                                     F.lit(0.0), lambda acc, x: acc + x)).alias("dot"))
                .groupBy().agg(F.sum("dot").alias("s")))

    out = {}
    for label, fn in (("minhash_signatures", sig_stage),
                      ("cosine_probe", probe_stage)):
        df = fn()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple")
        fired = "RoundRobinPartitioning" in plan
        df.write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        out[label] = {"sec": round(statistics.median(ts), 3),
                      "fan_out_fired": fired}
    spark.stop()
    return out


def main() -> None:
    if os.environ.get("_FANOUT_CELL"):
        sf_dir = os.environ["_FANOUT_CELL"]
        print(json.dumps(run_cell(sf_dir)))
        return
    prepare()
    rec: dict = {"cells": {}}
    for layout, sf_dir in (("multi", MULTI_DIR), ("single", SINGLE_DIR)):
        for cores in ("32", "8"):
            env = dict(os.environ, _FANOUT_CELL=sf_dir, SPARK_GRAFT_CPUS=cores)
            p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, capture_output=True, text=True)
            line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
            rec["cells"][f"{layout}_c{cores}"] = json.loads(line)
            print(layout, cores, line, flush=True)
    for layout in ("multi", "single"):
        for stage in ("minhash_signatures", "cosine_probe"):
            lo = rec["cells"][f"{layout}_c8"][stage]["sec"]
            hi = rec["cells"][f"{layout}_c32"][stage]["sec"]
            rec.setdefault("ratios_8_over_32", {})[f"{layout}.{stage}"] = round(lo / hi, 2)
    rec["load"] = [round(x, 2) for x in os.getloadavg()]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "experiments", "fanout_scaling_r15.json"), "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec["ratios_8_over_32"], indent=1))
    print("recorded experiments/fanout_scaling_r15.json")


if __name__ == "__main__":
    main()
