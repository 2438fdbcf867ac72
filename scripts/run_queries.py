"""CLI batch query runner over a built index.

    python scripts/run_queries.py --index /tmp/idx \
        --queries /tmp/fx/queries.parquet --out /tmp/results --master local[8]

Prints one JSON line with per-query latency p50/p99 (BASELINE.json metric)
and optionally writes the results table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--queries", required=True, help="parquet of (qid, text, k, mode)")
    p.add_argument("--out", default=None, help="optional results parquet dir")
    p.add_argument("--master", default=None)
    p.add_argument("--no-bmw", action="store_true", help="exhaustive scoring (debug)")
    p.add_argument("--per-query-latency", action="store_true",
                   help="also run each query alone for latency percentiles")
    args = p.parse_args()

    from find_that_charity_spark.operators.query import run_queries
    from find_that_charity_spark.session import get_spark

    spark = get_spark(master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    qdf = spark.read.parquet(args.queries)
    n_queries = qdf.count()

    t0 = time.perf_counter()
    results = run_queries(spark, args.index, qdf, use_bmw=not args.no_bmw)
    if args.out:
        results.write.mode("overwrite").parquet(args.out)
        n_rows = spark.read.parquet(args.out).count()
    else:
        n_rows = len(results.collect())
    batch_wall = time.perf_counter() - t0

    out = {
        "n_queries": n_queries,
        "n_result_rows": n_rows,
        "batch_wall_s": round(batch_wall, 3),
        "queries_per_sec": round(n_queries / batch_wall, 2),
        "master": spark.sparkContext.master,
    }

    if args.per_query_latency:
        from find_that_charity_spark.operators.query import IndexSearcher

        searcher = IndexSearcher(spark, args.index)  # warm-index protocol
        lat = []
        for r in qdf.collect():
            t = time.perf_counter()
            searcher.search(r["text"], k=int(r["k"]), mode=r["mode"])
            lat.append(time.perf_counter() - t)
        searcher.close()
        lat_ms = np.array(lat) * 1000
        out["latency_ms_p50"] = round(float(np.percentile(lat_ms, 50)), 1)
        out["latency_ms_p99"] = round(float(np.percentile(lat_ms, 99)), 1)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
