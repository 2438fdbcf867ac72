"""CLI index build — ships via ``spark-submit --py-files ftc_engine.zip``
(BASELINE.json north_rule) or plain ``python`` in local mode.

    spark-submit --py-files ftc_engine.zip scripts/build_index.py \
        --source cat.db.web_pages --out s3://bucket/index --buckets 4096

    python scripts/build_index.py --source /tmp/fx/web_pages.parquet \
        --out /tmp/idx --master local[8]

Prints one JSON line with build metrics (docs/sec is the headline —
BASELINE.json metric).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--source", required=True, help="Iceberg table or parquet path")
    p.add_argument("--out", required=True, help="index output directory")
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument("--id-buckets", type=int, default=256)
    p.add_argument("--chunks", type=int, default=4)
    p.add_argument("--max-postings-per-segment", type=int, default=1_000_000)
    p.add_argument("--master", default=None, help="override (e.g. local[8]); omit under spark-submit")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    args = p.parse_args()

    from find_that_charity_spark.operators.build import BuildConfig, build_index
    from find_that_charity_spark.session import get_spark

    spark = get_spark(master=args.master, shuffle_partitions=args.shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = BuildConfig(
        num_buckets=args.buckets,
        id_buckets=args.id_buckets,
        max_postings_per_segment=args.max_postings_per_segment,
        segment_chunks=args.chunks,
    )
    t0 = time.perf_counter()
    metrics = build_index(spark, args.source, args.out, cfg)
    wall = time.perf_counter() - t0
    metrics.update(
        wall_s=round(wall, 3),
        docs_per_sec=round(metrics["n_docs"] / wall, 2),
        master=spark.sparkContext.master,
    )
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
