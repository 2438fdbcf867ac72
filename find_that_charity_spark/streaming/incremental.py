"""Incremental index refresh via Structured Streaming (SURVEY.md §2E E15).

The core build is batch (like the reference's register-sync -> ES reindex),
but a web-scale corpus grows continuously; this module appends newly
crawled pages to an existing index without rebuilding it:

    readStream (new web_pages files / Iceberg incremental scan)
      -> Trigger.AvailableNow (drain what exists, then stop)
      -> foreachBatch:
           dedup within batch (latest warc_ts per url)
           anti-join docs table (urls already indexed are skipped —
             late re-crawls of known urls are ignored, the batch build's
             dedup-keeps-latest applies only within one build)
           assign doc_ids continuing after the current max (deterministic
             within a batch: same hash-bucket + url-order scheme)
           tokenize -> tf -> encode -> append as NEW segment rows
             (Lucene-flush analog: one new segment generation per batch)
           append docs rows; refresh corpus_stats and dictionary

Scoring note: the codec stores avgdl-independent per-block stats (max_tf,
min_dl), so appended segments need no re-encode when corpus stats move —
after ``refresh_stats`` both scoring and WAND bounds use the current
(n_docs, avgdl) and exact-BM25-vs-oracle equality holds again (tested:
tests/test_streaming.py). Between appends and refresh, queries see the
old stats — the same drift Lucene/ES tolerate between refreshes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from find_that_charity_spark.functions.analyzer import tokenize_udf
from find_that_charity_spark.operators.build import SEGMENT_SCHEMA, _encode_group
from find_that_charity_spark.operators.dedup import dedup_latest_by_url
from find_that_charity_spark.operators.doc_ids import assign_doc_ids
from find_that_charity_spark.plans.checkpoint import Manifest
from find_that_charity_spark.sources.corpus import WEB_PAGES_SCHEMA


def _append_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    index_dir: str,
    num_buckets: int,
    stream_id: str = "default",
) -> None:
    # Retry safety under at-least-once foreachBatch replay: (1) a fully
    # committed epoch is skipped via the manifest; (2) segments land in a
    # per-epoch directory with mode=overwrite, so re-running a half-done
    # epoch rewrites identical bytes instead of duplicating postings (the
    # doc_id assignment is a pure function of the fresh-url set and the
    # unchanged docs table, so the recompute is byte-stable); (3) docs are
    # appended only AFTER segments commit — if the first run crashed after
    # the docs append instead, the replay would see fresh empty with the
    # segment half missing forever. With this ordering fresh-empty on a
    # marked-not-done epoch means everything already landed: mark and go.
    #
    # ``stream_id`` (derived from the checkpoint location) qualifies both
    # the manifest unit and the segment chunk dir: epoch numbering restarts
    # at 0 with every NEW checkpoint, so a bare epoch key would silently
    # skip (or overwrite) a previous stream's batches when a fresh stream
    # reuses an existing index.
    unit = f"{stream_id}:{epoch_id}"
    if Manifest(index_dir).is_done("stream_batch", unit):
        return
    docs = spark.read.parquet(f"{index_dir}/docs")
    base_id = docs.agg(F.max("doc_id")).collect()[0][0] + 1

    fresh = dedup_latest_by_url(batch_df).join(
        docs.select("url"), "url", "left_anti"
    )
    if fresh.isEmpty():
        Manifest(index_dir).mark_done("stream_batch", unit, n_new=0)
        return
    tokenized = fresh.select(
        "url", "warc_ts", "lang", tokenize_udf(F.col("text")).alias("tokens")
    )
    with_ids = assign_doc_ids(tokenized, key="url", num_buckets=64).withColumn(
        "doc_id", F.col("doc_id") + F.lit(base_id)
    )
    # localCheckpoint (eager) truncates lineage BEFORE the docs append below:
    # the plan anti-joins against the docs parquet, so a lazy recompute after
    # the append would see its own output and emit an empty batch.
    with_len = with_ids.withColumn("doc_len", F.size("tokens").cast("int")).localCheckpoint()

    # match the base index's positional-ness: appending position-less
    # segments to a positional index would silently break phrase queries
    # over the appended docs (and compaction would drop positions for any
    # term it merges)
    positions = bool(
        spark.read.parquet(f"{index_dir}/segments")
        .select("has_positions")
        .first()["has_positions"]
    )
    # token-level rows; tf is computed inside the encode group (run-length)
    exploded = with_len.select(
        "doc_id",
        F.col("doc_len").alias("dl"),
        F.posexplode("tokens").alias("pos", "term"),
    )
    if not positions:
        exploded = exploded.drop("pos")
    tf = (
        exploded
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int"))
        .withColumn("salt", F.lit(1000 + epoch_id).cast("int"))  # segment generation tag
    )
    segs = tf.groupBy("bucket", "salt").applyInPandas(
        _encode_group(positions=positions), SEGMENT_SCHEMA
    )
    segs.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{index_dir}/segments/chunk=stream_{stream_id}_{epoch_id}"
    )

    with_len.select("doc_id", "url", "warc_ts", "lang", "doc_len").write.mode(
        "append"
    ).parquet(f"{index_dir}/docs")

    Manifest(index_dir).mark_done("stream_batch", unit)


def refresh_stats(spark: SparkSession, index_dir: str) -> None:
    """Recompute corpus_stats and dictionary after appends."""
    docs = spark.read.parquet(f"{index_dir}/docs")
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_len").cast("long").alias("total_len"),
        F.avg("doc_len").alias("avgdl"),
    )
    stats.write.mode("overwrite").parquet(f"{index_dir}/corpus_stats_new")
    spark.read.parquet(f"{index_dir}/corpus_stats_new").write.mode("overwrite").parquet(
        f"{index_dir}/corpus_stats"
    )
    segs = spark.read.parquet(f"{index_dir}/segments")
    dictionary = segs.groupBy("term", "bucket").agg(
        F.sum("df").cast("long").alias("df"),
        F.sum("cf").cast("long").alias("cf"),
        F.count(F.lit(1)).cast("int").alias("n_segments"),
    )
    dictionary.write.mode("overwrite").parquet(f"{index_dir}/dictionary_new")
    spark.read.parquet(f"{index_dir}/dictionary_new").write.mode("overwrite").parquet(
        f"{index_dir}/dictionary"
    )
    # the deletion-key index derives from the dictionary — rebuild it too
    if os.path.exists(f"{index_dir}/fuzzy_keys"):
        from find_that_charity_spark.operators.build import write_fuzzy_keys

        write_fuzzy_keys(spark, index_dir)


def incremental_refresh(
    spark: SparkSession,
    stream_source_dir: str,
    index_dir: str,
    num_buckets: int = 32,
    checkpoint_dir: str | None = None,
) -> None:
    """Drain new corpus files into the index (Trigger.AvailableNow), then
    refresh global stats. Idempotent per-source-file via the streaming
    checkpoint; rank-exactness restored by refresh_stats at the end."""
    import hashlib

    checkpoint = checkpoint_dir or f"{index_dir}/_stream_checkpoint"
    stream_id = hashlib.md5(checkpoint.encode("utf-8")).hexdigest()[:8]
    stream = (
        spark.readStream.schema(WEB_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(stream_source_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, epoch: _append_batch(
                spark, df, epoch, index_dir, num_buckets, stream_id=stream_id
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    refresh_stats(spark, index_dir)
