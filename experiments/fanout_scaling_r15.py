"""fan_out scaling evidence (VERDICT r14 item 7).

The driver's sf0.1 fixtures are SINGLE-row-group parquet files, so
every scan is one task and the 8-vs-32-core bench ratios sit at ~1 —
that block cannot distinguish the engine from the fixture layout.
This experiment isolates fan_out's contribution on the 10x tiled
corpus (same single-file layout, 10x rows):

  fanout=off — the compute stage runs directly on the 1-task scan:
               core count CANNOT matter (the fixture pins it), so
               the 8-core/32-core ratio must sit at ~1. This is the
               bench scaling block's flatness, reproduced on purpose.
  fanout=on  — the same stage behind catalog.fan_out: the round-robin
               repartition spreads the rows, and the ratio should
               move toward the core ratio, bounded by the stage's
               serial fraction (scan + shuffle of the input).

Stages measured (the fan_out consumers): the Arrow minhash signature
pass and a brute-force cosine probe (sim_bruteforce's per-row shape,
query density raised to %31 so compute dominates fixed overhead).
Each (mode, cores) cell runs in its OWN process (master is fixed per
JVM): the script re-executes itself with SPARK_GRAFT_CPUS. Writes
experiments/fanout_scaling_r15.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SINGLE_DIR = "/tmp/amplab_10x/sf1"
REPS = 3


def run_cell(use_fanout: bool) -> dict:
    from pyspark.sql import functions as F

    from amplab_hive_spark.catalog import fan_out, tables
    from amplab_hive_spark.llm.dedup import minhash_signatures_arrow
    from amplab_hive_spark.session import get_spark

    spark = get_spark("fanout-cell")
    t = tables(spark, SINGLE_DIR)
    wrap = (lambda df: fan_out(df, min_bytes=0)) if use_fanout else (lambda df: df)

    def sig_stage():
        return minhash_signatures_arrow(wrap(t.documents))

    def probe_stage():
        corpus = wrap(t.embeddings).select("vec_id", "embedding")
        q = corpus.filter(F.col("vec_id") % 31 == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
        return (corpus.crossJoin(F.broadcast(q))
                .select((F.aggregate(F.zip_with("embedding", "qv", lambda a, b: a * b),
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
        print(json.dumps(run_cell(os.environ["_FANOUT_CELL"] == "on")))
        return
    from experiments.scale10x_bench import ensure_dataset

    ensure_dataset(SINGLE_DIR)
    rec: dict = {"cells": {}}
    for mode in ("on", "off"):
        for cores in ("32", "8"):
            env = dict(os.environ, _FANOUT_CELL=mode, SPARK_GRAFT_CPUS=cores)
            p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, capture_output=True, text=True)
            lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if not lines:
                print(p.stderr[-2000:])
                raise SystemExit(f"cell fanout={mode} cores={cores} failed")
            rec["cells"][f"fanout_{mode}_c{cores}"] = json.loads(lines[-1])
            print(mode, cores, lines[-1], flush=True)
    for mode in ("on", "off"):
        for stage in ("minhash_signatures", "cosine_probe"):
            lo = rec["cells"][f"fanout_{mode}_c8"][stage]["sec"]
            hi = rec["cells"][f"fanout_{mode}_c32"][stage]["sec"]
            rec.setdefault("ratios_8_over_32", {})[f"fanout_{mode}.{stage}"] = round(lo / hi, 2)
    rec["load"] = [round(x, 2) for x in os.getloadavg()]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "experiments", "fanout_scaling_r15.json"), "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec["ratios_8_over_32"], indent=1))
    print("recorded experiments/fanout_scaling_r15.json")


if __name__ == "__main__":
    main()
