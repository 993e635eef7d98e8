"""10x scale dispersion for the round-15 OPTIMIZED queries (same
harness and tiled sf1-equivalent dataset as scale10x_r14_opt.py).

The r15 question list:
- dedup_minhash_lsh: the verify prune's pair-id semi-join is now
  UNhinted (VERDICT r14 #1) — the tiled corpus is the dup-heavy case
  (|pairs| ≈ 5·|docs|), exactly where the forced broadcast was the
  hazard; the done-bar is ratio ≤ the r14 recorded 4.12 with the plan
  shape intact (a broadcast→shuffle semi-join flip at volume would be
  AQE doing its job, and is reported either way).
- dedup_ngram_jaccard / dedup_containment: single-exchange window-cap
  pair generation (VERDICT #5) at 10x.
- dedup_cluster_resolution: de-barriered convergence check (VERDICT
  #3) at 10x (iterative — fingerprint varies with checkpoint ids, so
  only time is compared).
- q1_pricing_summary: the pmod(orderkey,64) overflow sub-bucket must
  stay free at 10x.

Run: python experiments/scale10x_r15_opt.py
Writes experiments/scale10x_r15_opt.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import plan_fingerprint  # noqa: E402
from experiments.scale10x_bench import ensure_dataset, out_arg  # noqa: E402

QUERIES = (
    "q1_pricing_summary",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_minhash_lsh",
    "dedup_cluster_resolution",
)


def main() -> None:
    from amplab_hive_spark.registry import all_queries
    from amplab_hive_spark.session import get_spark

    out = out_arg()
    ensure_dataset(out)
    spark = get_spark("scale10x_r15_opt")
    specs = {n: all_queries()[n] for n in QUERIES}
    rec: dict = {"queries": {}}
    for name, spec in specs.items():
        row: dict = {}
        for label, sf_dir in (("sf01", "/root/testdata/sf0.1"), ("x10", out)):
            spec.fn(spark, sf_dir).collect()  # warm: codegen + footers
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            df.collect()
            row[label] = round(time.perf_counter() - t0, 3)
            row[f"plan_{label}"] = plan_fingerprint(df)
        row["ratio"] = round(row["x10"] / row["sf01"], 2)
        row["plans_equal"] = row["plan_sf01"] == row["plan_x10"]
        rec["queries"][name] = row
        print(f"{name:28s} sf0.1 {row['sf01']:7.3f}  x10 {row['x10']:7.3f} "
              f" ratio {row['ratio']:5.2f}  plans_equal={row['plans_equal']}",
              flush=True)
    rec["load"] = [round(x, 2) for x in os.getloadavg()]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "experiments",
                           "scale10x_r15_opt.json"), "w") as fh:
        json.dump(rec, fh, indent=1)
    print("recorded experiments/scale10x_r15_opt.json")


if __name__ == "__main__":
    main()
