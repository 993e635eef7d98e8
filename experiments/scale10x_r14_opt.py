"""10x scale dispersion for the round-14 OPTIMIZED queries.

The optimization round restructured plans on purpose (the eleven-
round fingerprint freeze ends at r14 by design — OPTIMIZATION_r14.md),
so the r11-r13 question is re-asked of every restructured query at
sf1-equivalent volume: does the NEW plan keep its shape at 10x rows,
and is wall-time sub-linear? Reuses scale10x_bench.generate's tiled
dataset (keys shifted per copy, dimensions fixed, document text
perturbed) and bench.plan_fingerprint's AQE-final shape keys.

Run: python experiments/scale10x_r14_opt.py
Writes experiments/scale10x_r14_opt.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import plan_fingerprint  # noqa: E402
from experiments.scale10x_bench import ensure_dataset, out_arg  # noqa: E402

# every query whose PLAN the optimization round changed
QUERIES = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q18_large_order_customers",
    "q21_suppliers_kept_waiting",
    "dedup_minhash_lsh",
    "sim_bruteforce_topk",
    "dedup_simhash",
    "matchpath_price_runs",
    "sim_ann_ivf",
    "dedup_semantic",
)


def main() -> None:
    from amplab_hive_spark.registry import all_queries
    from amplab_hive_spark.session import get_spark

    out = out_arg()
    ensure_dataset(out)
    spark = get_spark("scale10x_r14_opt")
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
                           "scale10x_r14_opt.json"), "w") as fh:
        json.dump(rec, fh, indent=1)
    print("recorded experiments/scale10x_r14_opt.json")


if __name__ == "__main__":
    main()
