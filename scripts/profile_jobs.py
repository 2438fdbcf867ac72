"""Per-Spark-job wall profile of one declared query (guide §1/§7): runs a
query once cold + N warm reps with a job-start/end listener and prints each
job's duration + description, attributing a gate's wall to its constant
jobs. Usage:

    python scripts/profile_jobs.py --sf-dir /root/testdata/sf1.0 [--reps 2] name
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("name")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from find_that_charity_spark.session import get_spark

    spark = get_spark(app_name="ftc-profile-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = entrymod.queries()
    sf_dir = args.sf_dir
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    if not args.no_warm:
        entrymod._ensure_segment_index(spark, sf_dir)
        entrymod._ensure_ivf_index(spark, sf_dir)
        entrymod._ensure_updated_index(spark, sf_dir, vacuumed=False, tiered=True)
        entrymod._ensure_updated_index(spark, sf_dir, vacuumed=True)

    # python-side job log via the status tracker: poll job ids before/after
    qs[args.name](spark, sf_dir).collect()  # cold (plan/codegen warmup)

    jvm = sc._jvm
    for rep in range(args.reps):
        t0 = time.perf_counter()
        before = set(sc.statusTracker().getJobIdsForGroup(None) or [])
        df = qs[args.name](spark, sf_dir)
        t_plan = time.perf_counter()
        rows = df.collect()
        t1 = time.perf_counter()
        tracker = sc.statusTracker()
        jobs = sorted(set(tracker.getJobIdsForGroup(None) or []) - before)
        print(f"rep {rep}: wall={t1 - t0:.3f}s (plan-build {t_plan - t0:.3f}s) "
              f"rows={len(rows)} jobs={len(jobs)}")
        appid = sc.applicationId
        # pull job timings from the app status store via the REST-less API:
        store = sc._jsc.sc().statusStore()
        for jid in jobs:
            ji = store.job(jid)
            try:
                sub = ji.submissionTime().get()
                done = ji.completionTime().get()
                ms = done.getTime() - sub.getTime()
            except Exception:
                ms = -1
            name = ji.name()
            print(f"  job {jid}: {ms:6d} ms  stages={ji.stageIds()}  {name[:110]}")
    spark.stop()


if __name__ == "__main__":
    main()
