"""Incremental index refresh (E15): streaming appends + stats refresh +
compaction keep query results rank-identical to the brute-force oracle."""

from __future__ import annotations

import pytest

from find_that_charity_spark.functions.analyzer import analyze
from find_that_charity_spark.operators.build import BuildConfig, build_index, compact_segments
from find_that_charity_spark.operators.oracle import brute_force_topk
from find_that_charity_spark.operators.query import run_queries
from find_that_charity_spark.sources.corpus import WEB_PAGES_SCHEMA
from find_that_charity_spark.sources.synth import synth_web_pages

QUERIES = ["spark merge", "w0001", "w0003 w0042 w0777"]


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    pages = synth_web_pages(400)
    pages = pages.sort_values("warc_ts").groupby("url").tail(1).sort_index()
    base, s1, s2 = pages.iloc[:200], pages.iloc[200:300], pages.iloc[300:]

    base_path = str(root / "base")
    stream_dir = str(root / "incoming")
    idx = str(root / "idx")
    spark.createDataFrame(base, WEB_PAGES_SCHEMA).write.parquet(base_path)
    spark.createDataFrame(s1, WEB_PAGES_SCHEMA).write.mode("append").parquet(stream_dir)
    spark.createDataFrame(s2, WEB_PAGES_SCHEMA).write.mode("append").parquet(stream_dir)

    build_index(
        spark, base_path, idx,
        BuildConfig(num_buckets=8, id_buckets=8, max_postings_per_segment=10_000,
                    segment_chunks=1),
    )

    from find_that_charity_spark.streaming.incremental import incremental_refresh

    incremental_refresh(spark, stream_dir, idx, num_buckets=8)
    return {"idx": idx, "pages": pages}


def _oracle_view(spark, setup):
    docs = spark.read.parquet(f"{setup['idx']}/docs").select("doc_id", "url").toPandas()
    merged = docs.merge(setup["pages"][["url", "text"]], on="url", validate="one_to_one")
    return merged.sort_values("doc_id")


def _assert_rank_identical(spark, setup):
    corpus = _oracle_view(spark, setup)
    qdf = spark.createDataFrame(
        [(f"q{i}", q, 10, "freetext") for i, q in enumerate(QUERIES)],
        "qid string, text string, k int, mode string",
    )
    got = run_queries(spark, setup["idx"], qdf).toPandas()
    for i, q in enumerate(QUERIES):
        want = brute_force_topk(corpus["doc_id"].tolist(), corpus["text"].tolist(), q, k=10)
        mine = got[got["qid"] == f"q{i}"].sort_values("rank")
        assert mine["doc_id"].tolist() == [d for d, _ in want], q
        for s_got, (_, s_want) in zip(mine["score"], want):
            assert s_got == pytest.approx(s_want, rel=1e-6)


def test_all_urls_indexed(spark, setup):
    docs = spark.read.parquet(f"{setup['idx']}/docs")
    assert docs.count() == len(setup["pages"])
    assert docs.select("doc_id").distinct().count() == len(setup["pages"])
    got_urls = {r["url"] for r in docs.select("url").collect()}
    assert got_urls == set(setup["pages"]["url"])


def test_rank_identity_after_refresh(spark, setup):
    _assert_rank_identical(spark, setup)


def test_compaction_preserves_results(spark, setup):
    segs_before = spark.read.parquet(f"{setup['idx']}/segments")
    multi = (
        segs_before.groupBy("term").count().where("count > 1").count()
    )
    assert multi > 0, "stream appends should create multi-segment terms"
    n_merged = compact_segments(spark, setup["idx"], max_postings_per_segment=10_000)
    assert n_merged > 0
    # dictionary must be refreshed after compaction (n_segments changed)
    from find_that_charity_spark.streaming.incremental import refresh_stats

    refresh_stats(spark, setup["idx"])
    _assert_rank_identical(spark, setup)


def test_stream_is_idempotent(spark, setup):
    """Re-running the drain finds no new files -> index unchanged."""
    from find_that_charity_spark.streaming.incremental import incremental_refresh

    n_before = spark.read.parquet(f"{setup['idx']}/docs").count()
    incremental_refresh(spark, f"{setup['idx']}/../incoming", setup["idx"], num_buckets=8)
    assert spark.read.parquet(f"{setup['idx']}/docs").count() == n_before
