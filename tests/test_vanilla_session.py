"""Vanilla-session gate: the driver's harness builds its OWN bare
SparkSession (no engine configs) and calls ``__spark_entry__``'s three
functions. Round 1 shipped 50 red CORRECTNESS rows because
``catalog.load_tables`` assumed confs only ``session.get_spark`` set
(``spark.sql.legacy.parquet.nanosAsLong`` for events.parquet's
TIMESTAMP(NANOS); ``spark.sql.ansi.enabled=false`` for Hive implicit
casts). This test reproduces the driver's exact contract in a fresh
subprocess — a bare ``SparkSession.builder.master("local[4]")`` — so
that class of session-portability bug can never ship again.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# One representative query per registering module (all 20).
REPRESENTATIVES = [
    "q1_pricing_summary",        # relational
    "agg_basic_suite",           # grouping
    "window_rank_suite",         # windows
    "subquery_exists_correlated",  # subqueries
    "explode_word_counts",       # lateral
    "matchpath_price_runs",      # matchpath
    "null_ordering_semantics",   # sql_surface
    "setop_intersect",           # setops
    "q21_suppliers_kept_waiting",  # tpch_suite
    "fn_string_suite",           # scalar_queries
    "ngrams_top_bigrams",        # hive_compat
    "macro_disc_price_revenue",  # macros
    "hive_semantics_arithmetic",  # semantics
    "dedup_exact",               # dedup
    "dedup_cluster_resolution",  # components
    "pipeline_train_split",      # pipeline
    "sim_bruteforce_topk",       # similarity
    "text_token_stats",          # text
    "multimodal_binary_stats",   # multimodal
    "events_sessionization",     # event_windows (touches TIMESTAMP(NANOS))
]

_SCRIPT = r"""
import json, sys
from pyspark.sql import SparkSession

# The driver's session: NO engine configs at all.
spark = SparkSession.builder.master("local[4]").appName("vanilla-gate").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, %(repo)r)
import __spark_entry__ as e

out = {}

df = e.entry(spark)
out["entry"] = {"rows": df.count(), "schema": [f.name for f in df.schema.fields]}

qs = e.queries()
oracles = e.oracle_sql()
out["n_queries"] = len(qs)
out["n_oracles"] = len(oracles)

sf = "/root/testdata/sf0.001"
results = {}
for name in %(reps)r:
    try:
        d = qs[name](spark, sf)
        results[name] = {"rows": d.count()}
    except Exception as exc:
        results[name] = {"error": f"{type(exc).__name__}: {exc}"}
out["queries"] = results

# ANSI regression: '3' + int must coerce to double (Hive non-ANSI),
# not stay bigint — round-1 judge caught '4' vs oracle '4.0'.
sem = qs["hive_semantics_arithmetic"](spark, sf)
out["str_plus_int_type"] = dict(sem.dtypes)["str_plus_int"]

print("RESULT:" + json.dumps(out))
"""


def test_driver_contract_on_bare_session():
    script = _SCRIPT % {"repo": REPO, "reps": REPRESENTATIVES}
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert proc.returncode == 0, f"subprocess failed:\n{proc.stderr[-4000:]}"
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT:")]
    assert line, f"no RESULT line in output:\n{proc.stdout[-2000:]}"
    out = json.loads(line[-1][len("RESULT:"):])

    assert out["entry"]["rows"] >= 1
    assert out["entry"]["schema"][0] == "l_returnflag"
    assert out["n_queries"] >= 111
    assert out["n_oracles"] >= 100

    errors = {n: r["error"] for n, r in out["queries"].items() if "error" in r}
    assert not errors, f"queries failed on a vanilla session: {errors}"
    for name, r in out["queries"].items():
        assert r["rows"] >= 0, name

    # Hive implicit string->double coercion must survive an ANSI-on
    # default session (Spark 4 defaults ansi=true).
    assert out["str_plus_int_type"] == "double", out["str_plus_int_type"]
