"""D7 boolean semantics: conjunctive (AND) and exclusion (NOT) queries —
segment engine vs the extended brute-force oracle."""

from __future__ import annotations

import pytest

from find_that_charity_spark.operators.build import BuildConfig, build_index
from find_that_charity_spark.operators.oracle import brute_force_topk
from find_that_charity_spark.operators.query import run_queries
from find_that_charity_spark.sources.synth import write_fixture

AND_QUERIES = ["w0000 w0001", "w0001 w0002 w0005", "w0042 w0777", "w0000 nosuchterm"]
NOT_QUERIES = ["w0003 -w0000", "w0042 -w0001 -w0002", "w0001 -nosuchterm"]


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("boolq")
    fx, idx = str(root / "fx"), str(root / "idx")
    write_fixture(spark, fx, 400)
    build_index(spark, f"{fx}/web_pages.parquet", idx,
                BuildConfig(num_buckets=8, id_buckets=8, max_postings_per_segment=200,
                            segment_chunks=1))
    return {"fx": fx, "idx": idx}


@pytest.fixture(scope="module")
def corpus(spark, index):
    docs = spark.read.parquet(f"{index['idx']}/docs").select("doc_id", "url").toPandas()
    pages = spark.read.parquet(f"{index['fx']}/web_pages.parquet").toPandas()
    latest = pages.sort_values("warc_ts").groupby("url").tail(1)
    return docs.merge(latest[["url", "text"]], on="url").sort_values("doc_id")


def _run(spark, index, queries, mode):
    qdf = spark.createDataFrame(
        [(f"q{i}", q, 10, mode) for i, q in enumerate(queries)],
        "qid string, text string, k int, mode string",
    )
    return run_queries(spark, index["idx"], qdf).toPandas()


def test_conjunctive_matches_oracle(spark, index, corpus):
    got = _run(spark, index, AND_QUERIES, "bool_and")
    for i, q in enumerate(AND_QUERIES):
        want = brute_force_topk(
            corpus["doc_id"].tolist(), corpus["text"].tolist(), q, k=10, conjunctive=True
        )
        mine = got[got["qid"] == f"q{i}"].sort_values("rank")
        assert mine["doc_id"].tolist() == [d for d, _ in want], q
        for s_got, (_, s_want) in zip(mine["score"], want):
            assert s_got == pytest.approx(s_want, rel=1e-6), q


def test_conjunctive_missing_term_returns_nothing(spark, index, corpus):
    got = _run(spark, index, ["w0000 nosuchterm"], "bool_and")
    assert got.empty


def test_exclusions_match_oracle(spark, index, corpus):
    got = _run(spark, index, NOT_QUERIES, "freetext")
    for i, q in enumerate(NOT_QUERIES):
        want = brute_force_topk(
            corpus["doc_id"].tolist(), corpus["text"].tolist(), q, k=10
        )
        mine = got[got["qid"] == f"q{i}"].sort_values("rank")
        assert mine["doc_id"].tolist() == [d for d, _ in want], q
        for s_got, (_, s_want) in zip(mine["score"], want):
            assert s_got == pytest.approx(s_want, rel=1e-6), q


def test_excluded_docs_absent(spark, index, corpus):
    """Every returned doc for 'w0003 -w0000' really lacks w0000."""
    got = _run(spark, index, ["w0003 -w0000"], "freetext")
    by_id = corpus.set_index("doc_id")["text"]
    from find_that_charity_spark.functions.analyzer import analyze

    for d in got["doc_id"]:
        toks = set(analyze(by_id.loc[d]))
        assert "w0003" in toks and "w0000" not in toks
