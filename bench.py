"""Benchmark harness: run the headline queries (``bench=True`` in the
registry) at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Output contract: TWO JSON lines — a verbose record first (for humans
and the archive), then a compact record LAST, which is the canonical
one: {"metric": "headline_queries_total", "value": total_sec,
"unit": "sec", "queries": {...}, "plans": {...}, "plan_keys": [...],
"sf": ...}. The driver tail-captures ~2000 bytes of stdout and parses
the LAST parseable line, so the compact line is emitted last and
degrades itself (drops plans, then per-query timings) to stay under
the capture window. Consumers must read the last line, not
json.loads the whole stdout.

Each query is fully executed (collect) so the timing covers scan →
shuffle → result, not just plan construction. A warmup run of every
query absorbs JVM/codegen startup so numbers reflect steady state,
matching how a long-lived cluster session would behave.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from amplab_hive_spark.registry import all_queries
from amplab_hive_spark.session import get_spark


def plan_fingerprint(df) -> dict[str, int]:
    """Machine-readable shape of the EXECUTED (AQE-final) plan, so
    round-over-round regressions (an extra shuffle, a lost broadcast)
    diff mechanically instead of by eyeball."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )
    broadcasts = plan.count("BroadcastExchange")
    reused = plan.count("ReusedExchange")
    return {
        # shuffle exchanges only: "Exchange" is a substring of both
        # "BroadcastExchange" and "ReusedExchange", so subtract rather
        # than substring-match.
        "exchanges": plan.count("Exchange") - broadcasts - reused,
        "broadcast_exchanges": broadcasts,
        "reused_exchanges": reused,
        "broadcast_joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        # simple-mode explain marks codegen'd operators with "*(n)".
        "wholestage_codegen_ops": plan.count("*("),
        "python_eval": plan.count("ArrowEvalPython")
        + plan.count("BatchEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # Load context (round-4 lesson): wall-clock varied 1.4-1.6x across
    # rounds purely from host load, costing the judge a re-run to rule
    # out regression. Record 1/5/15-min load avg at start AND end so
    # the BENCH_r{N}.json line is self-describing about measurement
    # conditions; plans stay the real cross-round invariant.
    load_start = [round(x, 2) for x in os.getloadavg()]
    spark = get_spark("amplab_hive_spark-bench")

    specs = [s for s in all_queries().values() if s.bench]
    specs.sort(key=lambda s: s.name)

    # Warmup: JVM + whole-stage-codegen compile + parquet footer
    # caches, per plan shape — codegen compilation is a fixed cost
    # paid once per query shape, irrelevant at 100 TB but dominant
    # at sf0.1, so steady-state timing excludes it.
    for spec in specs:
        spec.fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    plans: dict[str, dict[str, int]] = {}
    for spec in specs:
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.collect()
        timings[spec.name] = round(time.perf_counter() - t0, 3)
        # After collect the queryExecution holds the AQE-final plan.
        plans[spec.name] = plan_fingerprint(df)

    total = round(sum(timings.values()), 3)
    load = {
        "start": load_start,
        "end": [round(x, 2) for x in os.getloadavg()],
        "cpus": os.cpu_count(),
    }
    # Verbose record first (humans / archive), compact record LAST:
    # the driver keeps only the last ~2000 bytes of stdout, and r2's
    # single verbose line blew past that, clipping the timings out of
    # BENCH_r02.json. The final line carries everything (timings AND
    # fingerprints) in < ~1.2 KB: plan fingerprints become fixed-order
    # int arrays keyed by PLAN_KEYS.
    plan_keys = [
        "exchanges",
        "broadcast_exchanges",
        "reused_exchanges",
        "broadcast_joins",
        "sortmerge_joins",
        "wholestage_codegen_ops",
        "python_eval",
    ]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_verbose",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "plans": plans,
                "plan_keys": plan_keys,
                "sf": float(sf) if sf else None,
                "load": load,
            }
        )
    )
    sys.stdout.flush()
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "plans": {n: [p[k] for k in plan_keys] for n, p in plans.items()},
        "plan_keys": plan_keys,
        "sf": float(sf) if sf else None,
        "load": load,
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800:  # stay inside the driver's tail capture
        compact.pop("plans")
        compact.pop("plan_keys")
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800:  # still too big (many bench queries): the
        # headline total must survive even if per-query detail can't.
        compact.pop("queries")
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
