"""Incremental refresh cost/correctness (VERDICT r02 items 4 and 6).

refresh_stats must be O(streamed), not O(index): corpus_stats from
manifest arithmetic, dictionary = immutable base snapshot + stream-chunk
deltas, fuzzy_keys append-only for genuinely-new terms. The per-batch
append must probe the docs table through url_bucket partition pruning
and take its doc-id high-water mark from the manifest.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from find_that_charity_spark.functions.fuzzy import deletion_keys
from find_that_charity_spark.operators.build import BuildConfig, build_index
from find_that_charity_spark.plans.checkpoint import Manifest
from find_that_charity_spark.sources.corpus import WEB_PAGES_SCHEMA
from find_that_charity_spark.sources.synth import synth_web_pages
from find_that_charity_spark.streaming.incremental import (
    _recover_dictionary_swap,
    incremental_refresh,
    refresh_stats,
)


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("incr")
    pages = synth_web_pages(300)
    pages = pages.sort_values("warc_ts").groupby("url").tail(1).sort_index()
    base, s1 = pages.iloc[:200], pages.iloc[200:]
    base_path, stream_dir, idx = (
        str(root / "base"),
        str(root / "incoming"),
        str(root / "idx"),
    )
    spark.createDataFrame(base, WEB_PAGES_SCHEMA).write.parquet(base_path)
    spark.createDataFrame(s1, WEB_PAGES_SCHEMA).write.parquet(stream_dir)
    build_index(
        spark, base_path, idx,
        BuildConfig(num_buckets=8, id_buckets=8, max_postings_per_segment=10_000,
                    segment_chunks=1),
    )
    incremental_refresh(spark, stream_dir, idx, num_buckets=8)
    return {"idx": idx, "pages": pages, "n_base": len(base), "n_s1": len(s1)}


def _full_dictionary(spark, idx):
    return (
        spark.read.parquet(f"{idx}/segments")
        .groupBy("term", "bucket")
        .agg(F.sum("df").cast("long").alias("df"), F.sum("cf").cast("long").alias("cf"))
        .toPandas()
        .sort_values(["term", "bucket"])
        .reset_index(drop=True)
    )


def _live_dictionary(spark, idx):
    return (
        spark.read.parquet(f"{idx}/dictionary")
        .select("term", "bucket", "df", "cf")
        .toPandas()
        .sort_values(["term", "bucket"])
        .reset_index(drop=True)
    )


def test_refresh_does_not_rescan_base_segments(spark, setup):
    """Move the base segment chunk aside: an O(index) recompute would
    either fail or drop base terms; the incremental merge (base snapshot
    + stream chunks only) must still produce the exact full dictionary."""
    idx = setup["idx"]
    want = _full_dictionary(spark, idx)
    aside = f"{idx}/chunk0_aside"
    os.rename(f"{idx}/segments/chunk=0", aside)
    try:
        refresh_stats(spark, idx)
    finally:
        os.rename(aside, f"{idx}/segments/chunk=0")
    got = _live_dictionary(spark, idx)
    assert got.equals(want[got.columns.tolist()])
    # corpus_stats came from manifest arithmetic, not a docs scan
    stats = spark.read.parquet(f"{idx}/corpus_stats").collect()[0]
    assert stats["n_docs"] == setup["n_base"] + setup["n_s1"]


def test_refresh_is_replay_idempotent(spark, setup):
    idx = setup["idx"]
    d1 = _live_dictionary(spark, idx)
    fk1 = spark.read.parquet(f"{idx}/fuzzy_keys").count()
    refresh_stats(spark, idx)
    refresh_stats(spark, idx)
    assert _live_dictionary(spark, idx).equals(d1)
    assert spark.read.parquet(f"{idx}/fuzzy_keys").count() == fk1


def test_fuzzy_keys_covers_exactly_live_terms(spark, setup):
    """Append-only fuzzy deltas still cover every dictionary term exactly
    once (no rewrite, no duplicates, no missing new terms)."""
    idx = setup["idx"]
    terms = [r["term"] for r in spark.read.parquet(f"{idx}/dictionary").select("term").collect()]
    fk = spark.read.parquet(f"{idx}/fuzzy_keys")
    assert fk.count() == sum(len(deletion_keys(t)) for t in terms)
    assert fk.select("term").distinct().count() == len(terms)
    assert set(fk.columns) == {"key", "term"}


def test_docs_partitioned_and_probe_pruned(spark, setup):
    """Docs lands bucketed by url hash; a bucket-restricted probe shows
    partition pruning in the physical plan (the shape _append_batch's
    anti-join probe uses)."""
    idx = setup["idx"]
    assert any(
        d.startswith("url_bucket=") for d in os.listdir(f"{idx}/docs")
    ), "docs table must be partitioned by url_bucket"
    probe = (
        spark.read.parquet(f"{idx}/docs")
        .where(F.col("url_bucket").isin([0, 3]))
        .select("url")
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "url_bucket" in plan


def test_doc_id_hwm_from_manifest(spark, setup):
    """The next doc id comes from manifest counters and equals what the
    max-agg would say (ids are contiguous across build + appends)."""
    from find_that_charity_spark.streaming.incremental import _doc_id_base

    idx = setup["idx"]
    base_id, url_buckets = _doc_id_base(Manifest(idx))
    assert url_buckets == 8
    true_next = spark.read.parquet(f"{idx}/docs").agg(F.max("doc_id")).collect()[0][0] + 1
    assert base_id == true_next


def test_dictionary_swap_recovery(spark, setup, tmp_path):
    idx = setup["idx"]
    cur = f"{idx}/dictionary"
    staged = f"{idx}/dictionary_staged"
    # crash between the two renames: dictionary gone, staged complete
    shutil.copytree(cur, staged)
    shutil.move(cur, str(tmp_path / "gone"))
    _recover_dictionary_swap(idx)
    assert os.path.exists(cur) and not os.path.exists(staged)
    # leftover backup with a live dictionary: dropped
    shutil.copytree(cur, f"{idx}/dictionary_old")
    _recover_dictionary_swap(idx)
    assert not os.path.exists(f"{idx}/dictionary_old")


def test_fallback_after_compaction_self_heals(spark, setup):
    """If stream chunks were folded away (compaction), refresh falls back
    to the full recompute AND re-snapshots dictionary_base so later
    refreshes are incremental again."""
    import time

    from find_that_charity_spark.operators.build import compact_segments

    idx = setup["idx"]
    want = _full_dictionary(spark, idx)
    compact_segments(spark, idx, max_postings_per_segment=10_000)
    base_mtime_before = os.path.getmtime(f"{idx}/dictionary_base")
    time.sleep(0.05)
    refresh_stats(spark, idx)
    assert _live_dictionary(spark, idx).equals(want)
    assert os.path.getmtime(f"{idx}/dictionary_base") > base_mtime_before
