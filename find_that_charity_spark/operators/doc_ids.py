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
