"""Tiered minor compaction (compact_stream_chunks): fold streaming-append
chunks into one tier chunk WITHOUT rewriting base chunks (hard-linked
across the swap), preserving query results, dictionary df/cf, positions
and the crash-safe swap protocol. The policy knob auto_compact_streams
bounds the chunk count of an always-on ingest."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from find_that_charity_spark.operators.build import (
    BuildConfig,
    build_index,
    compact_stream_chunks,
)
from find_that_charity_spark.operators.query import run_queries
from find_that_charity_spark.sources.corpus import WEB_PAGES_SCHEMA
from find_that_charity_spark.sources.synth import synth_web_pages
from find_that_charity_spark.streaming.incremental import incremental_refresh


def _chunks(idx):
    return sorted(
        os.path.basename(d) for d in glob.glob(f"{idx}/segments/chunk=*")
    )


def _minor_chunks(idx):
    return [
        c for c in _chunks(idx)
        if c.startswith("chunk=stream_") or c.startswith("chunk=tier")
    ]


def _topk(spark, idx, texts, mode="freetext"):
    qdf = spark.createDataFrame(
        [(f"q{i}", t, 5, mode) for i, t in enumerate(texts)],
        "qid string, text string, k int, mode string",
    )
    return sorted(
        map(tuple, run_queries(spark, idx, qdf).select("qid", "rank", "doc_id").collect())
    )


def _dict_counts(spark, idx):
    return (
        spark.read.parquet(f"{idx}/dictionary")
        .select("term", "bucket", "df", "cf")
        .toPandas()
        .sort_values(["term", "bucket"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("tier")
    pages = synth_web_pages(260)
    pages = pages.sort_values("warc_ts").groupby("url").tail(1).sort_index()
    base, s1, s2 = pages.iloc[:180], pages.iloc[180:220], pages.iloc[220:]
    base_path, stream_dir, idx = (
        str(root / "base"), str(root / "incoming"), str(root / "idx"),
    )
    spark.createDataFrame(base, WEB_PAGES_SCHEMA).write.parquet(base_path)
    build_index(
        spark, base_path, idx,
        BuildConfig(num_buckets=4, id_buckets=4, max_postings_per_segment=10_000,
                    segment_chunks=1, positions=True),
    )
    # two refresh calls with new files between them -> >=2 stream chunks
    spark.createDataFrame(s1, WEB_PAGES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(stream_dir)
    incremental_refresh(spark, stream_dir, idx, num_buckets=4)
    spark.createDataFrame(s2, WEB_PAGES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(stream_dir)
    incremental_refresh(spark, stream_dir, idx, num_buckets=4)
    return {"idx": idx, "pages": pages}


def test_fold_preserves_results_and_dictionary(spark, setup):
    idx = setup["idx"]
    minor_before = _minor_chunks(idx)
    assert len(minor_before) >= 2 and all(
        c.startswith("chunk=stream_") for c in minor_before
    )
    base_before = sorted(set(_chunks(idx)) - set(minor_before))
    # inode of one base parquet file: the fold must NOT copy base bytes
    base_file = glob.glob(f"{idx}/segments/{base_before[0]}/**/*.parquet",
                          recursive=True)[0]
    ino_before = os.stat(base_file).st_ino

    texts = ["the charity trust", "community foundation", "report annual"]
    want_free = _topk(spark, idx, texts)
    want_phrase = _topk(spark, idx, ["charity commission"], mode="phrase")
    dict_before = _dict_counts(spark, idx)

    n = compact_stream_chunks(spark, idx, max_postings_per_segment=10_000)
    assert n == len(minor_before)

    after = _chunks(idx)
    assert _minor_chunks(idx) == ["chunk=tier1"]
    assert sorted(set(after) - {"chunk=tier1"}) == base_before
    # hard link survived the swap: same path, same inode, no data copied
    assert os.stat(base_file).st_ino == ino_before

    # a second fold is a no-op below min_chunks (one tier chunk left)
    assert compact_stream_chunks(spark, idx, max_postings_per_segment=10_000) == 0

    from find_that_charity_spark.streaming.incremental import refresh_stats
    refresh_stats(spark, idx)
    assert _topk(spark, idx, texts) == want_free
    assert _topk(spark, idx, ["charity commission"], mode="phrase") == want_phrase
    got = _dict_counts(spark, idx)
    assert got.equals(dict_before)
    # positional merge: tier chunk rows keep positions (base is positional)
    tier = spark.read.parquet(f"{idx}/segments/chunk=tier1")
    assert tier.where(~F.col("has_positions")).count() == 0
    # folded terms actually merged: no term in the tier chunk should keep
    # more sub-segments than the cap forced
    multi = (
        tier.groupBy("term").count().where(F.col("count") > 1).join(
            tier.groupBy("term").agg(F.sum("df").alias("df")), "term"
        ).where(F.col("df") <= 10_000).count()
    )
    assert multi == 0


def test_auto_compact_policy_folds_next_tier(spark, setup, tmp_path):
    """auto_compact_streams folds stream chunks AND the previous tier
    chunk into the next generation as part of the refresh call."""
    idx = setup["idx"]
    assert _minor_chunks(idx) == ["chunk=tier1"]
    extra = synth_web_pages(300).sort_values("warc_ts").groupby("url").tail(1)
    extra = extra[~extra["url"].isin(setup["pages"]["url"])].iloc[:20]
    assert len(extra) > 0
    stream2 = str(tmp_path / "incoming2")
    spark.createDataFrame(extra, WEB_PAGES_SCHEMA).coalesce(1).write.parquet(stream2)
    texts = ["the charity trust", "annual report"]
    incremental_refresh(
        spark, stream2, idx, num_buckets=4, auto_compact_streams=2,
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    assert _minor_chunks(idx) == ["chunk=tier2"]
    # results still exact vs a brute check on df/cf conservation
    live = _dict_counts(spark, idx)
    full = (
        spark.read.parquet(f"{idx}/segments")
        .groupBy("term", "bucket")
        .agg(F.sum("df").cast("long").alias("df"), F.sum("cf").cast("long").alias("cf"))
        .toPandas().sort_values(["term", "bucket"]).reset_index(drop=True)
    )
    assert live.equals(full)
    assert len(_topk(spark, idx, texts)) > 0
