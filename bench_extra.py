"""Extra measurement harness for the optimization round (guide §1).

``bench.py`` is frozen (driver contract); this file holds the working
instruments: per-query timing on a subset (same methodology — interleaved
reps, median), optional ``noop``-sink isolation (§1.4), job labels (§1.5),
and ``.explain("formatted")`` capture for the plans/r06 deliverables.

Usage:
    python bench_extra.py --sf-dir /root/testdata/sf1.0 --reps 3 \
        [--noop] [--explain-dir plans/r06 --explain-suffix before] [q1 q2 ...]

Prints one JSON line: {"queries": {name: median}, "query_samples": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true",
                    help="time with the noop sink instead of collect()")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--explain-suffix", default="before")
    ap.add_argument("--no-warm", action="store_true",
                    help="skip the untimed index-build warmup (pure relational queries only)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from find_that_charity_spark.session import get_spark

    spark = get_spark(app_name="ftc-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = args.names or list(qs)
    sf_dir = args.sf_dir

    # same untimed setup as bench.py
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    if not args.no_warm:
        entrymod._ensure_segment_index(spark, sf_dir)
        entrymod._ensure_ivf_index(spark, sf_dir)
        entrymod._ensure_updated_index(spark, sf_dir, vacuumed=False, tiered=True)
        entrymod._ensure_updated_index(spark, sf_dir, vacuumed=True)

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            path = os.path.join(args.explain_dir, f"{name}_{args.explain_suffix}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path}", file=sys.stderr)

    if args.reps == 0:
        spark.stop()
        return

    samples: dict[str, list[float]] = {n: [] for n in names}
    rep_cal: list[float] = []
    for _rep in range(args.reps):
        t0 = time.perf_counter()
        spark.range(100_000_000).selectExpr("sum(id % 97)").collect()
        rep_cal.append(round(time.perf_counter() - t0, 3))
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            samples[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    timings = {n: round(float(np.median(s)), 3) for n, s in samples.items()}
    print(json.dumps({
        "queries": timings,
        "query_samples": {n: [round(x, 3) for x in s] for n, s in samples.items()},
        "calibration_per_rep_jvm_s": rep_cal,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "total": round(sum(timings.values()), 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
