"""IVF routing sweep at a chosen SF: K x nprobe grid, each config in
a fresh subprocess (the oracle CTE chain is generated from the
constants at import, so the env override changes both engines at
once). Measures mean/min routing recall of sim_ann_ivf vs
sim_bruteforce_topk AND re-proves oracle exactness per config.

Run: python experiments/ivf_sweep.py [sf_dir]
"""

import json
import os
import subprocess
import sys

_WORKER = r"""
import json, os, sys
sys.path.insert(0, "/root/repo")
from amplab_hive_spark.session import get_spark
from amplab_hive_spark.registry import all_queries
from amplab_hive_spark.testing import compare

sf_dir = sys.argv[1]
spark = get_spark("ivf-sweep")
qs = all_queries()
exact = {}
for r in qs["sim_bruteforce_topk"].fn(spark, sf_dir).collect():
    exact.setdefault(r["qid"], set()).add(r["vec_id"])
ivf = {}
for r in qs["sim_ann_ivf"].fn(spark, sf_dir).collect():
    ivf.setdefault(r["qid"], set()).add(r["vec_id"])
recalls = [len(exact[q] & ivf.get(q, set())) / len(exact[q]) for q in exact]
oracle_exact, oracle_err = True, None
try:
    compare(spark, qs["sim_ann_ivf"], sf_dir)
except AssertionError as ex:
    oracle_exact, oracle_err = False, str(ex)[:120]
print("RESULT " + json.dumps({
    "mean": round(sum(recalls) / len(recalls), 3),
    "min": round(min(recalls), 3),
    "oracle_exact": oracle_exact,
    **({"oracle_err": oracle_err} if oracle_err else {}),
}))
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    default_grid = [(16, 8), (32, 8), (32, 12), (32, 16), (48, 12)]
    grid = ([tuple(map(int, g.split("x")))
             for g in os.environ["SPARK_GRAFT_IVF_GRID"].split(",")]
            if os.environ.get("SPARK_GRAFT_IVF_GRID") else default_grid)
    out = []
    for k, nprobe in grid:
        env = dict(os.environ,
                   SPARK_GRAFT_IVF_K=str(k),
                   SPARK_GRAFT_IVF_NPROBE=str(nprobe))
        p = subprocess.run(
            [sys.executable, "-c", _WORKER, sf_dir],
            capture_output=True, text=True, env=env, timeout=900,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")]
        rec = json.loads(line[0][7:]) if line else {"error": p.stderr[-400:]}
        rec.update({"K": k, "nprobe": nprobe})
        out.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"experiment": "ivf_sweep", "sf_dir": sf_dir,
                      "grid": out}))


if __name__ == "__main__":
    main()
