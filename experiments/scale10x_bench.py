"""10x scale dispersion point for the 100 TB argument (round 11 —
r10 verdict task 7).

The scale claims rest on plan shape (broadcasts, bounded buckets,
no cartesians); this experiment adds one MEASURED point: generate an
sf1-equivalent dataset (10x sf0.1) into a TEMP dir — never checked
in — by tiling each fact table 10 times with a constant key offset
(foreign keys shift together, so join selectivity and group
cardinalities scale naturally; dimension tables nation/region stay
fixed, like TPC-H itself). Document text gets a per-copy suffix so
the minhash near-dup rate stays natural instead of every doc gaining
9 exact clones.

Run:  python experiments/scale10x_bench.py [--out /tmp/amplab_10x/sf1]
Then the script re-execs bench.py at the generated dir with
SPARK_GRAFT_BENCH_REPS=1 and prints (a) the per-query wall-times next
to the committed sf0.1 quiet-host record and (b) a plan-fingerprint
diff (the fingerprints must be IDENTICAL to sf0.1 — a plan that
changes shape with data volume is exactly what the scale argument
says cannot happen; AQE may legitimately vary runtime-only details,
which the fingerprint keys deliberately exclude).

Result (recorded in PERF.md "Round 11 — 10x scale dispersion"):
see experiments/scale10x_r11.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFFSET = 10_000_000  # > every key at sf0.1; copy i shifts keys by i*OFFSET
COPIES = 10
SRC = "/root/testdata/sf0.1"

# key columns to shift per table; absent tables copy verbatim
KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]  # fixed-size dimensions, copied once


def generate(out: str) -> None:
    from pyspark.sql import functions as F

    from amplab_hive_spark.session import get_spark

    spark = get_spark("scale10x_gen")
    os.makedirs(out, exist_ok=True)
    for t in DIMS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite") \
            .parquet(f"{out}/{t}.parquet")
        print(f"copied dim {t}")
    for t, keys in KEYED.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(COPIES):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * OFFSET))
            if t == "documents" and i > 0:
                # keep the near-dup rate natural: a suffix changes a
                # few shingles instead of minting 9 exact clones
                df = df.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" x{i}"))
                ).withColumn("n_chars", F.col("n_chars") + F.lit(len(f" x{i}")))
            parts.append(df)
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        n_files = 32 if t in ("lineitem", "orders", "events") else 8
        union.repartition(n_files).write.mode("overwrite") \
            .parquet(f"{out}/{t}.parquet")
        print(f"tiled {t} x{COPIES}")
    spark.stop()


def out_arg(default: str = "/tmp/amplab_10x/sf1") -> str:
    """--out <path> from argv; basename must be sf<N> (bench.py
    parses the SF from it)."""
    if "--out" in sys.argv:
        i = sys.argv.index("--out")
        if i + 1 >= len(sys.argv):
            raise SystemExit("--out requires a path argument")
        return sys.argv[i + 1]
    return default


def ensure_dataset(out: str) -> None:
    """Generate the tiled sf1-equivalent dataset unless every table
    already exists at ``out`` (shared with scale10x_window_r12.py)."""
    if all(os.path.exists(f"{out}/{t}.parquet") for t in list(KEYED) + DIMS):
        print(f"reusing {out}")
    else:
        generate(out)


def main() -> None:
    out = out_arg()
    ensure_dataset(out)
    env = dict(
        os.environ, SPARK_GRAFT_SF_DIR=out, SPARK_GRAFT_BENCH_REPS="1"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, env=env,
    )
    json_lines = [l for l in res.stdout.splitlines() if l.startswith("{")]
    if res.returncode != 0 or not json_lines:
        sys.stderr.write(res.stderr[-4000:])
        raise SystemExit(
            f"bench.py failed (exit {res.returncode}); stderr above"
        )
    big = json.loads(json_lines[-1])
    # committed quiet-host sf0.1 record for the side-by-side
    with open(os.path.join(repo, "experiments", "bench_quiet_r11.json")) as fh:
        small = json.loads(
            [l for l in fh if l.startswith('{"metric": "headline')][0]
        )
    print("\nquery                     sf0.1(med)  10x(1rep)  ratio  plans_equal")
    for q, t10 in sorted(big["queries"].items()):
        t1 = small["queries"][q]
        same = big["plans"][q] == [small["plans"][q][k] for k in small["plan_keys"]]
        print(f"{q:25s} {t1:9.3f} {t10:9.3f} {t10 / t1:7.2f}  {same}")
    rec = {
        "sf01_total_med": small["value"],
        "x10_total_1rep": big["value"],
        "per_query_ratio": {
            q: round(big["queries"][q] / small["queries"][q], 2)
            for q in big["queries"]
        },
        "plans_equal": {
            q: big["plans"][q]
            == [small["plans"][q][k] for k in small["plan_keys"]]
            for q in big["queries"]
        },
        "x10": big,
    }
    with open(os.path.join(repo, "experiments", "scale10x_r11.json"), "w") as fh:
        json.dump(rec, fh, indent=1)
    print("\nrecorded experiments/scale10x_r11.json")


if __name__ == "__main__":
    main()
