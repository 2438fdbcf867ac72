"""Physical removal of superseded documents (VERDICT r03 item 1).

Document updates arrive through the streaming append path
(streaming/incremental.py): a re-crawled url with a newer ``warc_ts`` is
re-indexed under a fresh doc_id and the old row lands in the tombstone
set, which every query excludes at scoring time (operators/query.py).
``vacuum_index`` is the merge that makes the deletes physical — the
Lucene/ES expunge-deletes analog:

    segments : postings for tombstoned doc_ids are decoded out and the
               lists re-encoded (per-blob codec preserved — a mixed
               varint/pfor store stays mixed); untouched lists pass
               through byte-identical. Crash-safe store swap (same
               protocol as compaction — operators/build.py).
    docs     : superseded rows dropped; url-bucketed stores rewrite ONLY
               the buckets that contain a tombstoned row (dynamic
               partition overwrite), not the whole table.
    dictionary / corpus_stats : rebuilt exact, so BM25 idf/avgdl equal a
               fresh build over the live corpus (rank-exactness vs the
               brute-force oracle is restored — the pre-vacuum state has
               the same stale-df drift ES tolerates between merges).
    manifest : a ``vacuum`` baseline entry restates (n_docs, total_len);
               later refresh_stats arithmetic starts from it.

Interrupted runs: rerun ``vacuum_index`` — every phase is either
swap-protected or idempotent. (A refresh_stats called between a crashed
vacuum's manifest mark and its tombstone clear could double-subtract;
rerunning the vacuum first is the documented contract, mirroring
``build_index`` resume.)

100-TB posture: the segment pass is one mapInPandas over the store with a
searchsorted quick-reject per posting list — lists whose [min_doc,
max_doc] contains no tombstone are never decoded; the tombstone array
ships once per executor as a broadcast. Write amplification is the full
segment store (like any Lucene forced merge); the docs table rewrites
only affected url buckets.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from find_that_charity_spark.functions.codec import (
    CODEC_PFOR,
    decode_postings,
    encode_postings,
)
from find_that_charity_spark.operators.build import (
    SEGMENT_SCHEMA,
    _recover_segment_swap,
    write_fuzzy_keys,
)
from find_that_charity_spark.plans.checkpoint import Manifest, check_format


def _vacuum_kernel(tomb_bc):
    """mapInPandas kernel: drop tombstoned postings from each segment row.

    Pass-through (no decode, no re-encode) for every list whose doc range
    contains no tombstone — at a few-percent tombstone ratio that is the
    overwhelming majority of the store."""

    def vac(batches):
        tomb = tomb_bc.value
        cols = SEGMENT_SCHEMA.fieldNames()
        for pdf in batches:
            keep_rows = []
            for _, row in pdf.iterrows():
                lo, hi = int(row["min_doc"]), int(row["max_doc"])
                s, e = np.searchsorted(tomb, [lo, hi + 1])
                if s == e:
                    keep_rows.append(row[cols])
                    continue
                blob = row["postings"]
                with_pos = bool(row["has_positions"])
                bm = [
                    (b["last_doc"], b["max_tf"], b["min_dl"], b["offset"], b["n"])
                    for b in row["blockmax"]
                ]
                out = decode_postings(blob, bm, with_positions=with_pos)
                docs, tfs, dls = out[0], out[1], out[2]
                idx = np.searchsorted(tomb, docs)
                idx[idx == tomb.size] = tomb.size - 1
                keep = tomb[idx] != docs
                if not keep.any():
                    continue  # every posting superseded: drop the list
                if keep.all():
                    keep_rows.append(row[cols])
                    continue
                pos_flat = None
                if with_pos:
                    pos_flat = out[3][np.repeat(keep, tfs)]
                docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
                codec = "pfor" if bytes(blob[:1])[0] == CODEC_PFOR else "varint"
                new_blob, new_bm = encode_postings(
                    docs, tfs, dls, positions_flat=pos_flat, codec=codec
                )
                keep_rows.append(
                    pd.Series(
                        {
                            "term": row["term"],
                            "bucket": int(row["bucket"]),
                            "salt": int(row["salt"]),
                            "seg_id": row["seg_id"],
                            "df": int(docs.size),
                            "cf": int(tfs.sum()),
                            "min_doc": int(docs[0]),
                            "max_doc": int(docs[-1]),
                            "has_positions": with_pos,
                            "postings": new_blob,
                            "blockmax": [
                                {
                                    "last_doc": ld, "max_tf": mt, "min_dl": md,
                                    "offset": off, "n": n,
                                }
                                for ld, mt, md, off, n in new_bm
                            ],
                        }
                    )
                )
            if keep_rows:
                yield pd.DataFrame(keep_rows, columns=cols)

    return vac


def _recover_docs_swap(index_dir: str) -> None:
    """Finish an interrupted non-bucketed docs swap (ADVICE r04: the
    docs -> docs_old, docs_new -> docs rename pair had no crash recovery —
    a crash between the renames left the index with no docs table).
    Mirrors _recover_segment_swap; a no-op when docs is present."""
    docs = f"{index_dir}/docs"
    new = f"{index_dir}/docs_new"
    old = f"{index_dir}/docs_old"
    if not os.path.exists(docs):
        if os.path.exists(new):
            os.rename(new, docs)  # crashed between the two renames
        elif os.path.exists(old):
            os.rename(old, docs)  # defensive: restore the pre-swap table
    if os.path.exists(old) and os.path.exists(docs):
        shutil.rmtree(old)


def vacuum_index(spark: SparkSession, index_dir: str) -> dict:
    """Physically drop tombstoned documents; returns metrics. No-op (zero
    metrics) when the index has no tombstones."""
    from find_that_charity_spark.operators.query import read_tombstones

    check_format(index_dir)
    _recover_segment_swap(index_dir)
    _recover_docs_swap(index_dir)
    tomb = read_tombstones(spark, index_dir)
    if tomb.size == 0:
        return {"n_tombstones": 0}
    tomb_bc = spark.sparkContext.broadcast(tomb)

    # ---- segments: rewrite with tombstoned postings removed -------------
    raw = (
        spark.read.option("basePath", f"{index_dir}/segments")
        .parquet(f"{index_dir}/segments/chunk=*")
        .drop("chunk")
    )
    cleaned = raw.mapInPandas(_vacuum_kernel(tomb_bc), SEGMENT_SCHEMA)
    tmp = f"{index_dir}/segments_compacted"  # shared swap protocol w/ compaction
    cleaned.write.mode("overwrite").partitionBy("bucket").parquet(f"{tmp}/chunk=0")
    backup = f"{index_dir}/segments_old"
    os.rename(f"{index_dir}/segments", backup)
    os.rename(tmp, f"{index_dir}/segments")
    shutil.rmtree(backup)

    # ---- docs: drop superseded rows (affected url buckets only) ---------
    docs = spark.read.parquet(f"{index_dir}/docs")
    tomb_ids = spark.createDataFrame([(int(d),) for d in tomb], "doc_id long")
    if "url_bucket" in docs.columns:
        affected = sorted(
            r[0]
            for r in docs.join(F.broadcast(tomb_ids), "doc_id", "left_semi")
            .select("url_bucket")
            .distinct()
            .collect()
        )
        if affected:
            kept = (
                docs.where(F.col("url_bucket").isin(affected))
                .join(F.broadcast(tomb_ids), "doc_id", "left_anti")
            )
            prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                kept.write.mode("overwrite").partitionBy("url_bucket").parquet(
                    f"{index_dir}/docs"
                )
            finally:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    else:
        kept = docs.join(F.broadcast(tomb_ids), "doc_id", "left_anti")
        kept.write.mode("overwrite").parquet(f"{index_dir}/docs_new")
        old = f"{index_dir}/docs_old"
        os.rename(f"{index_dir}/docs", old)
        os.rename(f"{index_dir}/docs_new", f"{index_dir}/docs")
        shutil.rmtree(old)

    # ---- dictionary: exact rebuild + fresh immutable base snapshot ------
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
    shutil.rmtree(f"{index_dir}/dictionary_new")
    base_dir = f"{index_dir}/dictionary_base"
    if os.path.exists(base_dir):
        shutil.rmtree(base_dir)
    shutil.copytree(f"{index_dir}/dictionary", base_dir, copy_function=os.link)
    # terms can vanish entirely (every posting superseded): rebuild the
    # deletion-key index so fuzzy expansion never resurrects them
    if os.path.exists(f"{index_dir}/fuzzy_keys"):
        write_fuzzy_keys(spark, index_dir)

    # ---- corpus_stats: exact from the rewritten docs table --------------
    stats_row = (
        spark.read.parquet(f"{index_dir}/docs")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_len").cast("long").alias("total_len"),
            F.avg("doc_len").alias("avgdl"),
        )
        .collect()[0]
    )
    spark.createDataFrame([stats_row]).write.mode("overwrite").parquet(
        f"{index_dir}/corpus_stats_new"
    )
    spark.read.parquet(f"{index_dir}/corpus_stats_new").write.mode("overwrite").parquet(
        f"{index_dir}/corpus_stats"
    )
    shutil.rmtree(f"{index_dir}/corpus_stats_new")

    # ---- manifest baseline + tombstone clear ----------------------------
    mf = Manifest(index_dir)
    n_prior = sum(1 for e in mf.entries() if e.get("stage") == "vacuum")
    mf.mark_done(
        "vacuum",
        str(n_prior),
        n_docs=int(stats_row["n_docs"]),
        total_len=int(stats_row["total_len"] or 0),
        n_tombstones=int(tomb.size),
    )
    shutil.rmtree(f"{index_dir}/tombstones")
    return {
        "n_tombstones": int(tomb.size),
        "n_docs": int(stats_row["n_docs"]),
        "total_len": int(stats_row["total_len"] or 0),
    }
