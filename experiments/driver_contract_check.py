"""Driver-contract self-check (the /verify recipe as a script): run
every registry query AND its DuckDB oracle side-by-side at sf0.01,
exactly like the external driver's correctness gate. Exit 1 on any
mismatch. Canon note: DuckDB SUM over integers returns HUGEINT
(Decimal) — canonicalize integral Decimals to int before formatting
or integer results false-mismatch against Spark's bigint."""
import sys

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e  # noqa: E402
from amplab_hive_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def canon(v):
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        if v == v.to_integral_value():
            return str(int(v))
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def main():
    spark = get_spark("driver-contract-check")
    rows = e.entry(spark).collect()
    print(len(rows), "entry rows")
    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    bad = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, SF)
            cols = sorted(sdf.columns)
            srows = sorted(
                tuple(canon(r[c]) for c in cols) for r in sdf.collect()
            )
            if name not in oracles:
                print(f"{name}: rows-only ({len(srows)} rows)")
                continue
            od = con.execute(oracles[name]).fetch_arrow_table().to_pylist()
            orows = sorted(
                tuple(canon(r[c]) for c in cols) for r in od
            )
            if srows != orows:
                bad.append(name)
                print(f"{name}: MISMATCH spark={len(srows)} oracle={len(orows)}")
                for s, o in list(zip(srows, orows)):
                    if s != o:
                        print("  s:", s[:6], "\n  o:", o[:6])
                        break
            else:
                print(f"{name}: ok ({len(srows)})")
        except Exception as ex:  # noqa: BLE001
            bad.append(name)
            print(f"{name}: ERROR {ex}")
    print("TOTAL", len(qs), "BAD", len(bad), bad)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
