"""Phrase queries (ES match_phrase analog): positional index build +
phrase scoring vs the brute-force oracle."""

from __future__ import annotations

import pytest

from find_that_charity_spark.operators.build import BuildConfig, build_index
from find_that_charity_spark.operators.oracle import brute_force_phrase_topk
from find_that_charity_spark.operators.query import IndexSearcher, run_queries
from find_that_charity_spark.sources.synth import ENTITY_NAMES, write_fixture

PHRASES = [
    ENTITY_NAMES[0],              # "acme charitable trust" (planted)
    "charitable trust",           # sub-phrase, more hits
    ENTITY_NAMES[2],              # 4-term phrase
    "trust charitable",           # reversed -> must NOT match as phrase
    "w0001 w0001",                # repeated term
    "acme zzz-unknown",           # term missing from corpus
]


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("phrase")
    fx, idx = str(root / "fx"), str(root / "idx")
    write_fixture(spark, fx, 400)
    build_index(
        spark, f"{fx}/web_pages.parquet", idx,
        BuildConfig(num_buckets=8, id_buckets=8, max_postings_per_segment=200,
                    segment_chunks=1, positions=True),
    )
    return {"fx": fx, "idx": idx}


@pytest.fixture(scope="module")
def corpus(spark, index):
    docs = spark.read.parquet(f"{index['idx']}/docs").select("doc_id", "url").toPandas()
    pages = spark.read.parquet(f"{index['fx']}/web_pages.parquet").toPandas()
    latest = pages.sort_values("warc_ts").groupby("url").tail(1)
    return docs.merge(latest[["url", "text"]], on="url").sort_values("doc_id")


def test_phrase_matches_oracle(spark, index, corpus):
    qdf = spark.createDataFrame(
        [(f"p{i}", q, 10, "phrase") for i, q in enumerate(PHRASES)],
        "qid string, text string, k int, mode string",
    )
    got = run_queries(spark, index["idx"], qdf).toPandas()
    ids, texts = corpus["doc_id"].tolist(), corpus["text"].tolist()
    any_hits = False
    for i, q in enumerate(PHRASES):
        want = brute_force_phrase_topk(ids, texts, q, k=10)
        mine = got[got["qid"] == f"p{i}"].sort_values("rank")
        assert mine["doc_id"].tolist() == [d for d, _ in want], q
        for s_got, (_, s_want) in zip(mine["score"], want):
            assert s_got == pytest.approx(s_want, rel=1e-6), q
        any_hits = any_hits or bool(want)
    assert any_hits, "planted entities should produce phrase hits"


def test_phrase_requires_adjacency(spark, index, corpus):
    """Every phrase hit really contains the consecutive token sequence."""
    from find_that_charity_spark.functions.analyzer import analyze

    q = ENTITY_NAMES[0]
    qdf = spark.createDataFrame([("p", q, 100, "phrase")],
                                "qid string, text string, k int, mode string")
    got = run_queries(spark, index["idx"], qdf).toPandas()
    assert len(got) > 0
    seq = analyze(q)
    by_id = corpus.set_index("doc_id")["text"]
    for d in got["doc_id"]:
        toks = analyze(by_id.loc[d])
        assert any(
            toks[p : p + len(seq)] == seq for p in range(len(toks) - len(seq) + 1)
        ), d
    # the OR-mode query returns a superset of docs
    or_got = run_queries(
        spark, index["idx"],
        spark.createDataFrame([("o", q, 400, "freetext")],
                              "qid string, text string, k int, mode string"),
    ).toPandas()
    assert set(got["doc_id"]).issubset(set(or_got["doc_id"]))


def test_phrase_sharded_and_searcher(spark, index, corpus):
    q = "charitable trust"
    qdf = spark.createDataFrame([("p", q, 10, "phrase")],
                                "qid string, text string, k int, mode string")
    plain = run_queries(spark, index["idx"], qdf).toPandas().sort_values("rank")
    sharded = run_queries(spark, index["idx"], qdf, doc_shards=5).toPandas().sort_values("rank")
    assert plain["doc_id"].tolist() == sharded["doc_id"].tolist()
    searcher = IndexSearcher(spark, index["idx"])
    got = searcher.search(q, k=10, mode="phrase")
    assert [d for _, d, _ in got] == plain["doc_id"].tolist()
    searcher.close()


def test_phrase_without_positions_raises(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("nopos")
    fx, idx = str(root / "fx"), str(root / "idx")
    write_fixture(spark, fx, 100)
    build_index(spark, f"{fx}/web_pages.parquet", idx,
                BuildConfig(num_buckets=4, id_buckets=4, segment_chunks=1,
                            positions=False))
    qdf = spark.createDataFrame([("p", "charitable trust", 10, "phrase")],
                                "qid string, text string, k int, mode string")
    with pytest.raises(Exception, match="positions"):
        run_queries(spark, idx, qdf).collect()


def test_phrase_driver_vs_distributed_analysis(spark, index):
    """Phrase q_offsets built driver-side (small-batch shortcut) must equal
    the distributed posexplode path (VERDICT r03 item 8)."""
    qdf = spark.createDataFrame(
        [("p0", "charitable trust", 10, "phrase"), ("p1", "acme charitable trust", 10, "phrase")],
        "qid string, text string, k int, mode string",
    )
    a = sorted(map(tuple, run_queries(spark, index["idx"], qdf).collect()))
    b = sorted(
        map(tuple, run_queries(spark, index["idx"], qdf, localize_threshold=0).collect())
    )
    assert a == b and a
