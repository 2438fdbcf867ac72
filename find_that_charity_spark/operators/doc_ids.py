"""Deterministic doc_id assignment (SURVEY.md §2C C4).

Rank-identity across reruns AND across parallelism levels (local[8] vs
local[32], N vs 4N executors — BASELINE.json north_rule) requires that the
url -> doc_id mapping be a pure function of the url SET, independent of
partition layout. ``monotonically_increasing_id`` and RDD zipWithIndex are
partition-dependent — rejected.

Scheme (fully deterministic, one shuffle, no global sort):
    1. b      = pmod(xxhash64(url), B)           -- hash bucket, uniform
    2. r      = row_number() over (partition by b order by url)
    3. offset = sum of counts of buckets < b     -- tiny driver-side table
    4. doc_id = offset[b] + r - 1                -- dense in [0, N)

The total order is (bucket, url) — not global url order, which nothing
requires; postings only need SOME fixed total order. Each bucket holds
~N/B rows, so the window sort is bounded; B scales with the corpus
(default 1024 — at 10^12 docs use ~10^5 so a bucket is ~10^7 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_and_assign_ids(
    corpus: DataFrame, num_buckets: int = 1024
) -> DataFrame:
    """Fused C3 + C4: dedup-keep-latest per url AND deterministic dense
    doc_id assignment in ONE exchange + sort.

    All captures of a url hash to the same bucket, so a single window over
    (partition by bucket, order by url, warc_ts desc) can both pick each
    url's latest capture (first row of its url-run, via lag) and rank the
    kept rows (running sum of run-starts). The separate-dedup-then-assign
    formulation shuffles the full-width corpus twice; this shuffles it
    once — the difference shows directly in build throughput at scale.

    The url -> doc_id mapping is identical to
    ``assign_doc_ids(dedup_latest_by_url(corpus))`` (tested) and equally
    partition-layout-independent. Ties on (url, warc_ts) are broken by a
    content hash so reruns are deterministic even with duplicate captures
    at the same timestamp.
    """
    spark = corpus.sparkSession
    with_b = corpus.withColumn(
        "_b", F.pmod(F.xxhash64(F.col("url")), F.lit(num_buckets)).cast("int")
    )
    counts = with_b.groupBy("_b").agg(F.countDistinct("url").alias("_cnt"))
    rows = sorted((r["_b"], r["_cnt"]) for r in counts.collect())
    offsets, acc = [], 0
    for b, cnt in rows:
        offsets.append((b, acc))
        acc += cnt
    offsets_df = spark.createDataFrame(offsets, "_b int, _offset long")

    w = Window.partitionBy("_b").orderBy(
        F.asc("url"), F.desc("warc_ts"), F.desc(F.xxhash64("text"))
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_first = F.lag("url").over(w).isNull() | (F.lag("url").over(w) != F.col("url"))
    return (
        with_b.withColumn("_first", is_first)
        .withColumn("_r", F.sum(F.col("_first").cast("long")).over(cum))
        .where(F.col("_first"))
        .join(F.broadcast(offsets_df), "_b")
        .withColumn("doc_id", (F.col("_offset") + F.col("_r") - 1).cast("long"))
        .drop("_b", "_first", "_r", "_offset")
    )


def assign_doc_ids(df: DataFrame, key: str = "url", num_buckets: int = 1024) -> DataFrame:
    """Add a dense, deterministic ``doc_id`` column keyed by ``key``.

    ``df`` must be unique on ``key`` (dedup first — C3).
    """
    spark = df.sparkSession
    with_b = df.withColumn("_b", F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)).cast("int"))
    counts = with_b.groupBy("_b").agg(F.count(F.lit(1)).alias("_cnt"))
    rows = sorted((r["_b"], r["_cnt"]) for r in counts.collect())
    offsets, acc = [], 0
    for b, cnt in rows:
        offsets.append((b, acc))
        acc += cnt
    offsets_df = spark.createDataFrame(offsets, "_b int, _offset long")
    w = Window.partitionBy("_b").orderBy(key)
    return (
        with_b.join(F.broadcast(offsets_df), "_b")
        .withColumn("doc_id", (F.col("_offset") + F.row_number().over(w) - 1).cast("long"))
        .drop("_b", "_offset")
    )
