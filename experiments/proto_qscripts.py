"""Prototype harness for q-corpus candidates (round-9 workflow, per
the r5-r8 playbook): run each candidate's SQL text on BOTH engines at
sf0.01, report ok / column mismatch / row mismatch / error / empty /
name collision. Only green candidates get promoted into a tranche in
tests/test_qscripts.py; the rest are documented drops.

Usage: python experiments/proto_qscripts.py [candidates_module]
Reads CANDIDATES = [(name, sql), ...] from the given python file
(default: experiments/cand_r9.py).
"""

import importlib.util
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.session import get_spark
from amplab_hive_spark.testing import duckdb_connection, duckdb_rows, spark_rows

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def existing_names() -> set:
    src = open(os.path.join(os.path.dirname(__file__), "..",
                            "tests", "test_qscripts.py")).read()
    return set(re.findall(r'^\s{4}\(\s*\n?\s*"([\w.]+)",', src, re.M))


def main(path: str) -> None:
    spec = importlib.util.spec_from_file_location("cands", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cands = mod.CANDIDATES
    taken = existing_names()
    spark = get_spark("proto-qscripts")
    tables(spark, SF_DIR)
    ok = []
    for name, sql in cands:
        if name in taken:
            print(f"COLLIDE  {name}")
            continue
        try:
            s_cols, s_rows = spark_rows(spark.sql(sql))
        except Exception as e:
            print(f"SPARK_ERR {name}: {str(e)[:160]}")
            continue
        con = duckdb_connection(SF_DIR)
        try:
            d_cols, d_rows = duckdb_rows(con, sql)
        except Exception as e:
            print(f"DUCK_ERR  {name}: {str(e)[:160]}")
            continue
        finally:
            con.close()
        if s_cols != d_cols:
            print(f"COLS      {name}: {s_cols} != {d_cols}")
        elif not s_rows:
            print(f"EMPTY     {name}")
        elif s_rows != d_rows:
            diffs = [
                (a, b) for a, b in zip(s_rows, d_rows) if a != b
            ][:2]
            print(f"ROWS      {name}: {len(s_rows)}/{len(d_rows)} first diffs {diffs}")
        else:
            print(f"ok        {name} ({len(s_rows)} rows)")
            ok.append(name)
    print(f"\nGREEN {len(ok)}/{len(cands)}: {ok}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(os.path.dirname(__file__), "cand_r9.py"))
