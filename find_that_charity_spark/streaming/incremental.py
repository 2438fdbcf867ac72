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
from find_that_charity_spark.operators.build import (
    SEGMENT_SCHEMA,
    _encode_group,
    check_pack_bounds,
    _DL_BITS,
)
from find_that_charity_spark.operators.dedup import dedup_latest_by_url
from find_that_charity_spark.operators.doc_ids import assign_doc_ids
from find_that_charity_spark.plans.checkpoint import Manifest, check_format
from find_that_charity_spark.sources.corpus import WEB_PAGES_SCHEMA


def _append_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    index_dir: str,
    num_buckets: int,
    stream_id: str = "default",
    block_codec: str = "varint",
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
    check_format(index_dir)  # refuse to append onto an old-layout store
    mf = Manifest(index_dir)
    if mf.is_done("stream_batch", unit):
        return
    docs = spark.read.parquet(f"{index_dir}/docs")
    # doc-id high-water mark from the manifest: build n_docs + every other
    # unit's appended/reserved count. Reservations ("stream_batch_pre",
    # written BEFORE the docs append) keep ids collision-free even when a
    # unit crashed between its docs append and its done mark — without
    # them the next batch would reuse the orphaned rows' ids.
    base_id, url_buckets = _doc_id_base(mf, exclude_unit=unit)
    if base_id is None:  # pre-r03 manifest without counts: one-time agg
        base_id = docs.agg(F.max("doc_id")).collect()[0][0] + 1

    deduped = dedup_latest_by_url(batch_df)
    probe = docs.select("url", "doc_id", "warc_ts")
    batch_buckets: list[int] | None = None
    if url_buckets:
        # partition-pruned probe: the docs table is laid out by url hash
        # bucket, and a micro-batch touches at most min(|batch|, B)
        # buckets — the "already indexed?" join reads only those
        bucket_col = F.pmod(F.xxhash64("url"), F.lit(url_buckets)).cast("int")
        batch_buckets = sorted(
            r[0] for r in deduped.select(bucket_col.alias("b")).distinct().collect()
        )
        probe = docs.where(F.col("url_bucket").isin(batch_buckets)).select(
            "url", "doc_id", "warc_ts"
        )
    # Replay of a crashed attempt (ADVICE r04): a reservation for THIS
    # unit means an earlier attempt may have appended docs — and under the
    # single-writer contract every docs row with doc_id >= base_id is that
    # attempt's. Parquet multi-file job commit is not atomic on a real FS,
    # so the append can be PARTIALLY visible; recomputing "fresh" against
    # the half-landed table would re-issue ids the landed rows already
    # hold. Instead: if everything landed, just re-mark (cheap path); else
    # hide the attempt's own rows from the probe so the replay recomputes
    # the crashed attempt's EXACT fresh set (doc_id assignment is a pure
    # function of that set), re-issues the SAME ids, and the docs append
    # below anti-joins away whatever already landed.
    pre = _last_pre_counts(mf, unit)
    landed_ids = None
    if pre is not None:
        landed_ids = probe.where(F.col("doc_id") >= base_id).select("doc_id")
        n_landed = landed_ids.count()
        if n_landed == pre[0]:
            # everything landed, only the done mark was lost; tombstones
            # may not have — recompute them (monotone: dominated-once is
            # dominated-forever) and re-mark with the reserved counts
            n_tomb, tomb_len = _write_batch_tombstones(
                spark, index_dir, unit, deduped, url_buckets, batch_buckets
            )
            mf.mark_done(
                "stream_batch", unit, n_new=pre[0], new_len=pre[1],
                n_tomb=n_tomb, tomb_len=tomb_len,
            )
            return
        probe = probe.where(F.col("doc_id") < base_id)
        # eager localCheckpoint: the anti-join below runs inside the docs
        # APPEND job — its lineage must not re-list the docs dir mid-write
        landed_ids = landed_ids.localCheckpoint() if n_landed else None
    # LIVE row per url = newest (warc_ts, doc_id) — earlier updates leave
    # superseded rows in the docs table until vacuum, so reduce first
    from pyspark.sql import Window

    w_url = Window.partitionBy("url").orderBy(
        F.desc("warc_ts"), F.desc("doc_id")
    )
    live = (
        probe.withColumn("rn", F.row_number().over(w_url))
        .where(F.col("rn") == 1)
        .select("url", F.col("warc_ts").alias("live_ts"))
    )
    # document updates (VERDICT r03 item 1): a re-crawl with a strictly
    # newer warc_ts is re-indexed under a fresh doc_id; the superseded
    # row is tombstoned below. Same-or-older re-crawls stay dropped.
    joined = deduped.join(live, "url", "left")
    fresh = joined.where(
        F.col("live_ts").isNull() | (F.col("warc_ts") > F.col("live_ts"))
    ).drop("live_ts")
    if fresh.isEmpty():
        if pre is not None:
            # unreachable when the replayed batch matches the crashed
            # attempt's input (the filtered probe reproduces a non-empty
            # fresh set); reaching it means the replay fed different data
            raise RuntimeError(
                f"replay of {unit} recomputed an empty fresh set but the "
                f"crashed attempt reserved {pre[0]} ids: the replayed "
                "batch differs from the crashed attempt's input"
            )
        mf.mark_done("stream_batch", unit, n_new=0, new_len=0)
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
    agg = with_len.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_len").alias("len"),
        F.max("doc_len").alias("max_dl"),
    ).collect()[0]
    check_pack_bounds(agg["max_dl"], 0)
    if pre is not None and int(agg["n"]) != pre[0]:
        # determinism gate on the partial-replay path: the recomputed
        # fresh set must be the crashed attempt's (same ids, same bytes) —
        # a mismatch means the replayed batch is not the attempt's input,
        # and appending would collide with or orphan the landed rows
        raise RuntimeError(
            f"replay of {unit} recomputed {int(agg['n'])} fresh docs but "
            f"the crashed attempt reserved {pre[0]}: refusing to append"
        )
    # id reservation BEFORE any write: if this attempt appends docs and
    # crashes before its done mark, later units still see the reserved
    # range via _doc_id_base and never collide with the orphaned rows
    mf.mark_done(
        "stream_batch_pre", unit, n_new=int(agg["n"]), new_len=int(agg["len"] or 0)
    )

    # token-level rows in the PACKED layout _encode_group expects
    # (docdl = doc_id << 22 | dl, gkey = bucket << 32 | salt); the salt
    # word carries the segment generation tag
    exploded = with_len.select(
        F.shiftleft("doc_id", _DL_BITS)
        .bitwiseOR(F.col("doc_len").cast("long"))
        .alias("docdl"),
        F.posexplode("tokens").alias("pos", "term"),
    )
    if not positions:
        exploded = exploded.drop("pos")
    tf = exploded.withColumn(
        "gkey",
        F.shiftleft(F.pmod(F.xxhash64("term"), F.lit(num_buckets)), 32).bitwiseOR(
            F.lit(1000 + epoch_id).cast("long")
        ),
    )
    segs = tf.groupBy("gkey").applyInPandas(
        _encode_group(positions=positions, codec=block_codec), SEGMENT_SCHEMA
    )
    segs.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{index_dir}/segments/chunk=stream_{stream_id}_{epoch_id}"
    )
    out_docs = with_len.select("doc_id", "url", "warc_ts", "lang", "doc_len")
    if landed_ids is not None:
        # partial-replay completion: append only the rows the crashed
        # attempt did NOT land (same ids — the segment chunk overwrite
        # above rewrote identical bytes for the full set)
        out_docs = out_docs.join(F.broadcast(landed_ids), "doc_id", "left_anti")
    if url_buckets:
        out_docs.withColumn(
            "url_bucket", F.pmod(F.xxhash64("url"), F.lit(url_buckets)).cast("int")
        ).write.mode("append").partitionBy("url_bucket").parquet(f"{index_dir}/docs")
    else:
        out_docs.write.mode("append").parquet(f"{index_dir}/docs")

    # tombstone superseded rows AFTER the docs append: dominated-ness is
    # computed from the docs table itself, so the write is replay-stable
    n_tomb, tomb_len = _write_batch_tombstones(
        spark, index_dir, unit, deduped, url_buckets, batch_buckets
    )

    # n_new/new_len feed the manifest-only corpus_stats recompute and the
    # next batch's doc-id high-water mark (no O(index) aggs per batch)
    mf.mark_done(
        "stream_batch", unit, n_new=int(agg["n"]), new_len=int(agg["len"] or 0),
        n_tomb=n_tomb, tomb_len=tomb_len,
    )


def _last_pre_counts(mf: Manifest, unit: str) -> tuple[int, int] | None:
    """(n_new, new_len) of the LAST id reservation for ``unit``, or None.
    The last one belongs to the attempt that made it furthest."""
    found = None
    for e in mf.entries():
        if e.get("stage") == "stream_batch_pre" and e.get("unit") == unit:
            found = (int(e.get("n_new", 0)), int(e.get("new_len", 0)))
    return found


def _write_batch_tombstones(
    spark: SparkSession,
    index_dir: str,
    unit: str,
    batch_urls: DataFrame,
    url_buckets: int | None,
    batch_buckets: list[int] | None,
) -> tuple[int, int]:
    """Overwrite ``tombstones/unit=<unit>`` with every docs row for a
    batch url that is strictly dominated by a newer row for the same url
    (ordering (warc_ts, doc_id) — the row that lost an update).

    Replay-stable by monotonicity: once dominated, always dominated, so a
    rerun writes a superset of what the crashed attempt wrote and the
    union across units stays exactly the superseded set. Units may overlap
    (a replay re-lists rows another unit also tombstoned); readers dedup
    (query.read_tombstones / refresh_stats). Returns (rows, doc_len sum)
    of this unit's content."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{index_dir}/docs")
    if batch_buckets is not None:
        docs = docs.where(F.col("url_bucket").isin(batch_buckets))
    scoped = docs.join(
        F.broadcast(batch_urls.select("url").distinct()), "url", "left_semi"
    ).select("url", "doc_id", "warc_ts", "doc_len")
    w_url = Window.partitionBy("url").orderBy(F.desc("warc_ts"), F.desc("doc_id"))
    dominated = (
        scoped.withColumn("rn", F.row_number().over(w_url))
        .where(F.col("rn") > 1)
        .select("doc_id", "doc_len")
    )
    agg = dominated.agg(
        F.count(F.lit(1)).alias("n"), F.sum("doc_len").alias("len")
    ).collect()[0]
    n_tomb = int(agg["n"])
    if n_tomb == 0:
        return 0, 0
    unit_dir = f"{index_dir}/tombstones/unit={unit.replace(':', '_')}"
    dominated.coalesce(1).write.mode("overwrite").parquet(unit_dir)
    return n_tomb, int(agg["len"] or 0)


def _doc_id_base(mf: Manifest, exclude_unit: str | None = None) -> tuple[int | None, int | None]:
    """Next doc_id + docs url-bucket count from the manifest alone.

    Sums, per unit, the committed count (``stream_batch``) or — for a unit
    that reserved ids but never committed (crash between its docs append
    and its done mark) — the reservation (``stream_batch_pre``). Ids need
    not be contiguous, only unique and growing, so counting a reservation
    that never landed merely skips a range. ``exclude_unit`` leaves the
    CURRENT unit's own reservation out: its replay recomputes from the
    same base its ids would otherwise shift under.

    Returns (None, url_buckets) when any entry predates the counters —
    the caller then falls back to one max(doc_id) aggregation."""
    base = None
    url_buckets = None
    committed: dict[str, int | None] = {}
    reserved: dict[str, int] = {}
    for e in mf.entries():
        stage = e.get("stage")
        if stage == "docs" and e.get("status") == "done":
            base = e.get("n_docs")
            url_buckets = e.get("url_buckets")
        elif stage == "stream_batch" and e.get("status") == "done":
            n = e.get("n_new")
            committed[str(e.get("unit", ""))] = None if n is None else int(n)
        elif stage == "stream_batch_pre" and e.get("status") == "done":
            reserved[str(e.get("unit", ""))] = int(e.get("n_new", 0))
    if base is None or any(v is None for v in committed.values()):
        return None, url_buckets
    n_streamed = 0
    for u in committed.keys() | reserved.keys():
        if u == exclude_unit:
            continue
        n_streamed += committed[u] if u in committed else reserved[u]
    return int(base) + n_streamed, url_buckets


def _stream_chunk_dir(index_dir: str, unit: str) -> str:
    return f"{index_dir}/segments/chunk=stream_{unit.replace(':', '_')}"


def _recover_dictionary_swap(index_dir: str) -> None:
    """Finish an interrupted dictionary swap (same protocol as the
    segment-store compaction swap in operators/build.py)."""
    import shutil

    cur = f"{index_dir}/dictionary"
    staged = f"{index_dir}/dictionary_staged"
    backup = f"{index_dir}/dictionary_old"
    if not os.path.exists(cur):
        if os.path.exists(staged):
            os.rename(staged, cur)
        elif os.path.exists(backup):
            os.rename(backup, cur)
    for leftover in (staged, backup):
        if os.path.exists(cur) and os.path.exists(leftover):
            shutil.rmtree(leftover)


def refresh_stats(spark: SparkSession, index_dir: str) -> None:
    """Refresh corpus_stats, dictionary and fuzzy_keys after appends —
    incrementally (VERDICT r02 item 4).

    - corpus_stats: pure manifest arithmetic (build counts + per-batch
      deltas), zero Spark jobs over the docs table.
    - dictionary: immutable ``dictionary_base`` (batch build) + column-
      pruned deltas from the stream segment chunks only — never a groupBy
      over the whole segment store. Replay-safe without bookkeeping: the
      merge recomputes base + ALL stream chunks, so re-running after a
      crash lands the identical result. Crash-safe rename swap.
    - fuzzy_keys: append-only — deletion keys only for terms not covered
      by the base dictionary or previously covered chunks (duplicates
      from a replayed append are deduped at query time).

    Falls back to the full recompute for pre-r03 manifests, or when
    compaction has folded the stream chunks away (the fallback also
    re-snapshots dictionary_base, making future refreshes incremental
    again).
    """
    import shutil

    mf = Manifest(index_dir)
    entries = mf.entries()
    # the LAST baseline wins: a vacuum entry restates (n_docs, total_len)
    # for the physically-rewritten store and resets the per-batch deltas
    # accumulated before it (their rows are either folded into the new
    # baseline or were tombstoned and dropped)
    docs_e = None
    batches: list[dict] = []
    for e in entries:
        if e.get("status") != "done":
            continue
        if e.get("stage") in ("docs", "vacuum"):
            docs_e = e
            batches = []
        elif e.get("stage") == "stream_batch":
            batches.append(e)

    # ---- corpus_stats --------------------------------------------------
    # live corpus = baseline + appends - superseded (tombstoned) rows; the
    # tombstone agg is O(updates since vacuum), not O(index)
    counts_ok = (
        docs_e is not None
        and docs_e.get("n_docs") is not None
        and docs_e.get("total_len") is not None
        and all(e.get("n_new") is not None and e.get("new_len") is not None for e in batches)
    )
    tomb_path = f"{index_dir}/tombstones"
    has_tomb = os.path.exists(tomb_path)
    if counts_ok:
        n_docs = int(docs_e["n_docs"]) + sum(int(e["n_new"]) for e in batches)
        total_len = int(docs_e["total_len"]) + sum(int(e["new_len"]) for e in batches)
        if has_tomb:
            t = (
                spark.read.parquet(tomb_path)
                .select("doc_id", "doc_len")
                .dropDuplicates(["doc_id"])  # units may overlap after replay
                .agg(F.count(F.lit(1)).alias("n"), F.sum("doc_len").alias("len"))
                .collect()[0]
            )
            n_docs -= int(t["n"])
            total_len -= int(t["len"] or 0)
        stats = spark.createDataFrame(
            [(n_docs, total_len, total_len / max(n_docs, 1))],
            "n_docs long, total_len long, avgdl double",
        )
    else:
        docs = spark.read.parquet(f"{index_dir}/docs")
        if has_tomb:
            tomb_ids = spark.read.parquet(tomb_path).select("doc_id").distinct()
            docs = docs.join(F.broadcast(tomb_ids), "doc_id", "left_anti")
        stats = docs.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_len").cast("long").alias("total_len"),
            F.avg("doc_len").alias("avgdl"),
        )
    stats.write.mode("overwrite").parquet(f"{index_dir}/corpus_stats_new")
    spark.read.parquet(f"{index_dir}/corpus_stats_new").write.mode("overwrite").parquet(
        f"{index_dir}/corpus_stats"
    )

    # ---- dictionary ----------------------------------------------------
    _recover_dictionary_swap(index_dir)
    live_units = []
    for e in batches:
        n_new = e.get("n_new")
        if n_new is None:
            # pre-r03 manifest entry without counters: live iff its
            # segment chunk still exists on disk
            if os.path.exists(_stream_chunk_dir(index_dir, e["unit"])):
                live_units.append(e["unit"])
        elif int(n_new) > 0:
            live_units.append(e["unit"])
    base_dir = f"{index_dir}/dictionary_base"
    incremental = os.path.exists(base_dir) and all(
        os.path.exists(_stream_chunk_dir(index_dir, u)) for u in live_units
    )
    dict_agg = [
        F.sum("df").cast("long").alias("df"),
        F.sum("cf").cast("long").alias("cf"),
    ]
    if incremental and not live_units:
        return  # nothing streamed since the base snapshot: all current
    if incremental:
        delta = (
            spark.read.option("basePath", f"{index_dir}/segments")
            .parquet(*[_stream_chunk_dir(index_dir, u) for u in live_units])
            .select("term", "bucket", "df", "cf")  # postings blobs pruned
            .groupBy("term", "bucket")
            .agg(*dict_agg, F.count(F.lit(1)).cast("int").alias("n_segments"))
        )
        merged = (
            spark.read.parquet(base_dir)
            .unionByName(delta)
            .groupBy("term", "bucket")
            .agg(*dict_agg, F.sum("n_segments").cast("int").alias("n_segments"))
        )
        merged.write.mode("overwrite").parquet(f"{index_dir}/dictionary_staged")
        os.rename(f"{index_dir}/dictionary", f"{index_dir}/dictionary_old")
        os.rename(f"{index_dir}/dictionary_staged", f"{index_dir}/dictionary")
        shutil.rmtree(f"{index_dir}/dictionary_old")
    else:
        segs = spark.read.parquet(f"{index_dir}/segments")
        dictionary = segs.groupBy("term", "bucket").agg(
            *dict_agg, F.count(F.lit(1)).cast("int").alias("n_segments")
        )
        dictionary.write.mode("overwrite").parquet(f"{index_dir}/dictionary_new")
        spark.read.parquet(f"{index_dir}/dictionary_new").write.mode(
            "overwrite"
        ).parquet(f"{index_dir}/dictionary")
        # re-snapshot the base so the NEXT refresh is incremental again
        if os.path.exists(base_dir):
            shutil.rmtree(base_dir)
        shutil.copytree(f"{index_dir}/dictionary", base_dir)

    # ---- fuzzy_keys ----------------------------------------------------
    if not os.path.exists(f"{index_dir}/fuzzy_keys"):
        return
    from find_that_charity_spark.functions.fuzzy import deletion_keys_expr
    from find_that_charity_spark.operators.build import write_fuzzy_keys

    if not incremental:
        write_fuzzy_keys(spark, index_dir)
        for u in live_units:
            if not mf.is_done("fuzzy_covered", u):
                mf.mark_done("fuzzy_covered", u)
        return
    covered_units = [
        u
        for u in live_units
        if mf.is_done("fuzzy_covered", u)
        and os.path.exists(_stream_chunk_dir(index_dir, u))
    ]
    uncovered = [u for u in live_units if not mf.is_done("fuzzy_covered", u)]
    if not uncovered:
        return
    fresh_terms = (
        spark.read.option("basePath", f"{index_dir}/segments")
        .parquet(*[_stream_chunk_dir(index_dir, u) for u in uncovered])
        .select("term")
        .distinct()
    )
    known = spark.read.parquet(base_dir).select("term")
    if covered_units:
        known = known.unionByName(
            spark.read.option("basePath", f"{index_dir}/segments")
            .parquet(*[_stream_chunk_dir(index_dir, u) for u in covered_units])
            .select("term")
        )
    new_terms = fresh_terms.join(known.distinct(), "term", "left_anti")
    new_terms.select(
        F.explode(deletion_keys_expr("term")).alias("key"), "term"
    ).write.mode("append").parquet(f"{index_dir}/fuzzy_keys")
    for u in uncovered:
        mf.mark_done("fuzzy_covered", u)


def incremental_refresh(
    spark: SparkSession,
    stream_source_dir: str,
    index_dir: str,
    num_buckets: int = 32,
    checkpoint_dir: str | None = None,
    block_codec: str = "varint",
    auto_compact_streams: int | None = None,
) -> None:
    """Drain new corpus files into the index (Trigger.AvailableNow), then
    refresh global stats. Idempotent per-source-file via the streaming
    checkpoint; rank-exactness restored by refresh_stats at the end.

    ``block_codec`` may differ from the base index's codec: blobs are
    self-describing (functions/codec.py), so a varint base accepting
    pfor appends is a supported mixed store
    (tests/test_pfor_integration.py::test_mixed_codec_streaming_appends).

    ``auto_compact_streams`` is the tiered merge policy knob (Lucene's
    segmentsPerTier analog): when the number of minor chunks
    (``chunk=stream_*`` + ``chunk=tier*``) reaches the threshold, fold
    them into one tier chunk (``operators.build.compact_stream_chunks``)
    BEFORE the stats refresh — so the refresh's full-dictionary fallback
    runs at most once per fold, and an always-on ingest keeps a bounded
    chunk count instead of one chunk per epoch forever. None (default)
    never folds."""
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
                spark, df, epoch, index_dir, num_buckets, stream_id=stream_id,
                block_codec=block_codec,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if auto_compact_streams is not None:
        from find_that_charity_spark.operators.build import compact_stream_chunks

        compact_stream_chunks(
            spark, index_dir, block_codec=block_codec,
            min_chunks=auto_compact_streams,
        )
    refresh_stats(spark, index_dir)
