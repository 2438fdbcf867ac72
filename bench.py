"""Benchmark harness (driver contract): runs headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "engine": {"build_docs_per_sec": ..., "query_p50_ms": ..., ...}}

The ``queries`` timings cover the driver-gated operator suite over the
driver's sf tables (a JVM warm-up query runs first so the first entry
isn't charged Spark startup). The ``engine`` block measures the inverted-
index engine itself on the deterministic FIXTURES corpus: index-build
docs/sec (BASELINE.json headline metric) and per-query latency p50/p99
over the 50-query reference set. Scaling efficiency (N vs 4N) is measured
separately by scripts/run_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "bm25_segments_flagship",
    "bm25_segments_phrase",
    "bm25_segments_fuzzy",
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
    "ann_cosine_ivf",
    "quality_top20",
    "lang_id_counts",
    "events_json_native",   # added round 2 —
    "multimodal_features",  # the r01 bench had 19 queries; totals are
    "add_to_csv_recon",     # comparable via queries_r01_subtotal
    "bm25_segments_updated_docs",   # added round 4: document-update path
    "bm25_segments_after_update",   # (index built in untimed setup)
    "bm25_segments_tiered",         # added round 5: query over the
                                    # minor-compacted (tiered) store
    "bm25_segments_minshould",      # added round 5: search features —
    "bm25_facet_lang",              # minimum_should_match, facet counts,
    "bm25_highlight",               # positional highlight, more_like_this
    "more_like_this_doc",
]

_R01_QUERIES = 19  # first 19 entries above == the round-1 headline set
_R02_QUERIES = 22  # first 22 == the round-2 AND round-3 headline sets

# median-of-N per query, interleaved (q1..qn, q1..qn, ...) in one session
# so page-cache / JIT wobble can't move headline numbers (VERDICT r02
# item 3: single-shot timings had 10-15% run-to-run variance)
BENCH_REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

ENGINE_BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))


def engine_bench(spark) -> dict:
    from find_that_charity_spark.operators.build import BuildConfig, build_index
    from find_that_charity_spark.operators.query import run_queries
    from find_that_charity_spark.sources.synth import write_fixture

    work = tempfile.mkdtemp(prefix="ftc_bench_")
    fx, idx = f"{work}/fx", f"{work}/idx"
    write_fixture(spark, fx, ENGINE_BENCH_DOCS)

    t0 = time.perf_counter()
    metrics = build_index(
        spark,
        f"{fx}/web_pages.parquet",
        idx,
        BuildConfig(num_buckets=32, id_buckets=64, max_postings_per_segment=100_000,
                    segment_chunks=1, aqe_coalesce=True),  # toy-corpus setting
    )
    build_wall = time.perf_counter() - t0

    qdf = spark.read.parquet(f"{fx}/queries.parquet")
    t1 = time.perf_counter()
    run_queries(spark, idx, qdf).collect()
    batch_wall = time.perf_counter() - t1

    # latency regime: warm IndexSearcher (cached dictionary/stats), one
    # query per round trip — the BASELINE.md 'warm index' protocol
    from find_that_charity_spark.operators.query import IndexSearcher

    searcher = IndexSearcher(spark, idx)
    rows = qdf.collect()
    # two full sweeps: sweep 1 pays each distinct plan shape's codegen
    # once (its tail is warmup, not the engine), sweep 2 is the
    # steady-state a warm service serves — the reported p50/p99
    # (VERDICT r03 item 5: the r03 p99 mixed the two regimes). Per-mode
    # percentiles + the worst query are recorded for attribution.
    sweeps: list[list[tuple[str, str, float]]] = []
    for _ in range(2):
        lat = []
        for r in rows:  # all 50 reference queries: p99 means something
            t = time.perf_counter()
            searcher.search(r["text"], k=int(r["k"]), mode=r["mode"])
            lat.append((r["qid"], r["mode"], (time.perf_counter() - t) * 1000))
        sweeps.append(lat)
    searcher.close()
    steady = sweeps[1]
    lat_a = np.array([ms for _, _, ms in steady])
    by_mode: dict[str, list[float]] = {}
    for _, mode, ms in steady:
        by_mode.setdefault(mode, []).append(ms)
    worst = max(steady, key=lambda x: x[2])
    return {
        "build_n_docs": metrics["n_docs"],
        "build_wall_s": round(build_wall, 3),
        "build_docs_per_sec": round(metrics["n_docs"] / build_wall, 2),
        "query_batch50_wall_s": round(batch_wall, 3),
        "query_p50_ms": round(float(np.percentile(lat_a, 50)), 1),
        "query_p99_ms": round(float(np.percentile(lat_a, 99)), 1),
        "query_p99_ms_sweep1": round(
            float(np.percentile(np.array([ms for _, _, ms in sweeps[0]]), 99)), 1
        ),
        "query_p50_by_mode": {
            m: round(float(np.percentile(np.array(v), 50)), 1)
            for m, v in sorted(by_mode.items())
        },
        "query_worst": {"qid": worst[0], "mode": worst[1], "ms": round(worst[2], 1)},
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from find_that_charity_spark.session import get_spark

    spark = get_spark(app_name="ftc-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # JVM/session warm-up so the first timed query isn't charged startup,
    # and pre-build the one-time per-sf_dir index artifacts: the shared
    # segment index and the persisted IVF index. These are INDEX BUILDS,
    # not query cost (build throughput is measured separately in the
    # engine block below); leaving the ~20 s k-means fit inside rep 1 of
    # ann_cosine_ivf contaminated neighboring rep-1/2 timings through
    # writeback + GC pressure (measured in the round-3 session).
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    entrymod._ensure_segment_index(spark, sf_dir)
    entrymod._ensure_ivf_index(spark, sf_dir)
    # round 4: the document-update gates query a second index built
    # through the streaming-update + vacuum pipeline — index CONSTRUCTION
    # is untimed setup here (build throughput is the engine block's
    # metric); the timed gate is the query over the updated store
    # tiered fold runs BEFORE the vacuum (matching the driver's gate
    # order) so the fold has real multi-chunk input; both are untimed
    entrymod._ensure_updated_index(spark, sf_dir, vacuumed=False, tiered=True)
    entrymod._ensure_updated_index(spark, sf_dir, vacuumed=True)

    # fixed-work machine calibration, reported alongside the timings: the
    # sandbox host's effective CPU varies by 2-3x between sessions
    # (hypervisor steal measured up to 11% with the guest mostly idle —
    # docs/SCALE.md round-3 notes), so cross-round wall-clock comparisons
    # need a same-session yardstick. Both probes are pure fixed work:
    # one Python thread, and one all-core JVM codegen job.
    t0 = time.perf_counter()
    acc = 0
    for i in range(5_000_000):
        acc += i * i
    cal_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    # (id % 97 keeps the sum far from long overflow under ANSI mode)
    spark.range(500_000_000).selectExpr("sum(id % 97)").collect()
    cal_jvm = time.perf_counter() - t0
    calibration = {
        "py_1thread_s": round(cal_py, 3),
        "jvm_allcore_s": round(cal_jvm, 3),
    }

    present = [n for n in HEADLINE if n in qs]
    samples: dict[str, list[float]] = {n: [] for n in present}
    # per-rep fixed-work probe (VERDICT r04 item 3): r04's third repeat of
    # nearly every query ran 2-4x its first — a host window degrading
    # MID-BENCH that a single up-front calibration can't attribute. A
    # small all-core JVM probe before each rep timestamps the window each
    # rep ran in, so per-query drift (e.g. bm25_topk_flagship's [3.76,
    # 1.92, 5.78] r04 samples) carries its own host evidence.
    rep_cal: list[float] = []
    for _rep in range(BENCH_REPEATS):
        t0 = time.perf_counter()
        spark.range(100_000_000).selectExpr("sum(id % 97)").collect()
        rep_cal.append(round(time.perf_counter() - t0, 3))
        for name in present:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            samples[name].append(time.perf_counter() - t0)
    timings = {n: round(float(np.median(s)), 3) for n, s in samples.items()}
    total = sum(timings.values())

    engine = engine_bench(spark)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "query_samples": {
                    n: [round(x, 3) for x in s] for n, s in samples.items()
                },
                "repeats": BENCH_REPEATS,
                "calibration": calibration,
                "calibration_per_rep_jvm_s": rep_cal,
                # apples-to-apples vs earlier rounds (r01: 19 queries,
                # r02: 22): per-query medians summed over each round's set
                "queries_r01_subtotal": round(
                    sum(timings.get(q, 0.0) for q in HEADLINE[:_R01_QUERIES]), 3
                ),
                "queries_r02_subtotal": round(
                    sum(timings.get(q, 0.0) for q in HEADLINE[:_R02_QUERIES]), 3
                ),
                "sf": sf,
                "engine": engine,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
