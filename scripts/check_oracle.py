"""Driver-style correctness check: run queries()[name] on Spark and
compare against oracle_sql()[name] on DuckDB (order-insensitive row
multiset), exactly like the spark-graft driver's t2 gate.

Usage:
    python scripts/check_oracle.py [--sf-dir /root/testdata/sf0.01] [q1 q2 ...]

With no query names, checks every query that has an oracle. Exits non-zero
on the first mismatch (prints both sides' first differing rows).
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__spark_entry__"] = mod
    spec.loader.exec_module(mod)

    sys.path.insert(0, REPO)
    from find_that_charity_spark.session import get_spark

    spark = get_spark(app_name="ftc-check-oracle")
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracles = mod.oracle_sql()
    qs = mod.queries()
    names = args.names or [n for n in qs if n in oracles]
    bad = 0
    for name in names:
        if name not in oracles:
            print(f"{name}: NO ORACLE (skipped)")
            continue
        t0 = time.perf_counter()
        sdf = qs[name](spark, args.sf_dir)
        got = sorted(tuple(map(str, r)) for r in sdf.collect())
        t1 = time.perf_counter()
        want = sorted(tuple(map(str, r)) for r in con.sql(oracles[name]).fetchall())
        ok = got == want
        schema_ok = [f.name for f in sdf.schema.fields] == [
            d[0] for d in con.sql(oracles[name]).description
        ]
        status = "OK" if (ok and schema_ok) else "MISMATCH"
        print(f"{name}: {status} rows={len(got)} spark_s={t1 - t0:.2f}"
              + ("" if schema_ok else " SCHEMA-MISMATCH"))
        if not ok:
            bad += 1
            only_got = [r for r in got if r not in want][:3]
            only_want = [r for r in want if r not in got][:3]
            print(f"  spark-only: {only_got}")
            print(f"  oracle-only: {only_want}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
