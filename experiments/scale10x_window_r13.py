"""10x scale dispersion for the round-13 window promotions.

Rounds 11/12 measured the bench headliners and the r12 promotions
at sf1-equivalent volume; round 13 promoted five never-graded
certificates into the driver window (fn_date_suite,
q7_nation_volume_shipping, events_range_join, sim_ann_ivf,
events_funnel), so the same two questions are asked of THEM: does the plan change
shape with 10x the data (it must not), and is wall-time sub-linear
on 10x rows? Reuses scale10x_bench.generate's tiled dataset (keys
shifted per copy, dimensions fixed, document text perturbed) and
bench.plan_fingerprint's AQE-final shape keys.

Run: python experiments/scale10x_window_r13.py
Writes experiments/scale10x_window_r13.json.
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
    "fn_date_suite",
    "q7_nation_volume_shipping",
    "events_range_join",
    "sim_ann_ivf",
    "events_funnel",
)


def main() -> None:
    from amplab_hive_spark.registry import all_queries
    from amplab_hive_spark.session import get_spark

    out = out_arg()
    ensure_dataset(out)
    spark = get_spark("scale10x_window_r13")
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
              f" ratio {row['ratio']:5.2f}  plans_equal={row['plans_equal']}")
    rec["load"] = [round(x, 2) for x in os.getloadavg()]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "experiments",
                           "scale10x_window_r13.json"), "w") as fh:
        json.dump(rec, fh, indent=1)
    print("recorded experiments/scale10x_window_r13.json")


if __name__ == "__main__":
    main()
