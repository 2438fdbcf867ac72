"""Benchmark harness (driver contract): runs headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect). A separate
scaling protocol (local[8] vs local[32] on the same input) is run by
scripts/run_scaling.py and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "bm25_topk_flagship",
    "bm25_topk_single_term",
    "term_dictionary",
    "autocomplete_prefix",
    "lineitem_pricing_agg",
    "revenue_by_nation",
    "top2_orders_per_cust",
    "events_daily",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash_near_dups",
    "ann_cosine_top10",
    "ann_cosine_lsh",
    "quality_top20",
    "lang_id_counts",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from find_that_charity_spark.session import get_spark

    spark = get_spark(app_name="ftc-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
