"""End-to-end segment index: build -> query -> rank-identity vs the
brute-force oracle (SURVEY.md §5.2), BMW == exhaustive (§5.4)."""

from __future__ import annotations

import pandas as pd
import pytest

from find_that_charity_spark.functions.analyzer import analyze, analyze_name
from find_that_charity_spark.operators.build import BuildConfig, build_index
from find_that_charity_spark.operators.oracle import brute_force_topk
from find_that_charity_spark.operators.query import run_queries
from find_that_charity_spark.plans.checkpoint import Manifest
from find_that_charity_spark.sources.synth import synth_queries, write_fixture

N_DOCS = 500


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("idx")
    fx = str(root / "fixture")
    idx = str(root / "index")
    write_fixture(spark, fx, N_DOCS)
    cfg = BuildConfig(
        num_buckets=8,
        id_buckets=16,
        max_postings_per_segment=300,  # force head-term salting on Zipf heads
        segment_chunks=2,
    )
    metrics = build_index(spark, f"{fx}/web_pages.parquet", idx, cfg)
    return {"fixture": fx, "index": idx, "metrics": metrics}


@pytest.fixture(scope="module")
def oracle_corpus(spark, index):
    """Deduped corpus joined with assigned doc_ids (the oracle's view)."""
    docs = spark.read.parquet(f"{index['index']}/docs").select("doc_id", "url").toPandas()
    pages = spark.read.parquet(f"{index['fixture']}/web_pages.parquet").toPandas()
    latest = pages.sort_values("warc_ts").groupby("url").tail(1)
    merged = docs.merge(latest[["url", "text"]], on="url", validate="one_to_one")
    return merged.sort_values("doc_id")


def test_build_metrics(index, spark):
    assert index["metrics"]["n_docs"] == N_DOCS
    assert index["metrics"]["n_head_terms"] > 0, "Zipf heads should trigger salting"
    mf = Manifest(index["index"])
    stages = {e["stage"] for e in mf.entries()}
    assert stages == {"tokenized", "docs", "segments", "compact", "dictionary", "fuzzy_keys"}
    segs = spark.read.parquet(f"{index['index']}/segments")
    assert segs.where("salt > 0").count() > 0, "head terms should be sharded"


def test_doc_ids_dense_and_deterministic(index, spark):
    docs = spark.read.parquet(f"{index['index']}/docs")
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    assert ids == list(range(N_DOCS))


def test_postings_match_relational_tf(index, spark, oracle_corpus):
    """Segment df/cf totals == straightforward recount from raw text."""
    from collections import Counter

    cnt_df: Counter = Counter()
    cnt_cf: Counter = Counter()
    for txt in oracle_corpus["text"]:
        toks = analyze(txt)
        cnt_cf.update(toks)
        cnt_df.update(set(toks))
    dictionary = spark.read.parquet(f"{index['index']}/dictionary").collect()
    assert len(dictionary) == len(cnt_df)
    for r in dictionary:
        assert r["df"] == cnt_df[r["term"]], r["term"]
        assert r["cf"] == cnt_cf[r["term"]], r["term"]


@pytest.mark.parametrize("use_bmw", [True, False])
def test_rank_identity_vs_oracle(index, spark, oracle_corpus, use_bmw):
    """The headline gate: every reference query, fast path == oracle."""
    queries = synth_queries()
    qdf = spark.createDataFrame(queries)
    got = run_queries(spark, index["index"], qdf, use_bmw=use_bmw).toPandas()
    ids = oracle_corpus["doc_id"].tolist()
    texts = oracle_corpus["text"].tolist()
    for _, q in queries.iterrows():
        qa = analyze_name if q["mode"] == "recon" else analyze
        want = brute_force_topk(ids, texts, q["text"], k=int(q["k"]), query_analyzer=qa)
        mine = got[got["qid"] == q["qid"]].sort_values("rank")
        assert mine["doc_id"].tolist() == [d for d, _ in want], (q["qid"], q["text"])
        for s_got, (_, s_want) in zip(mine["score"], want):
            assert s_got == pytest.approx(s_want, rel=1e-6), q["qid"]


def test_sharded_scoring_exact(index, spark, oracle_corpus):
    """doc_shards parallel scoring == unsharded == oracle (incl. AND/NOT)."""
    qdf = spark.createDataFrame(
        [
            ("s0", "spark merge join window", 10, "freetext"),
            ("s1", "w0001 w0002", 10, "bool_and"),
            ("s2", "w0003 -w0000", 10, "freetext"),
            ("s3", "w0042", 100, "freetext"),
        ],
        "qid string, text string, k int, mode string",
    )
    plain = run_queries(spark, index["index"], qdf).toPandas()
    sharded = run_queries(spark, index["index"], qdf, doc_shards=7).toPandas()
    for qid in ["s0", "s1", "s2", "s3"]:
        a = plain[plain["qid"] == qid].sort_values("rank")
        b = sharded[sharded["qid"] == qid].sort_values("rank")
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), qid
        assert a["score"].tolist() == pytest.approx(b["score"].tolist()), qid


def test_index_searcher_matches_run_queries(index, spark, oracle_corpus):
    """Warm IndexSearcher (latency path) == run_queries (batch path)."""
    from find_that_charity_spark.operators.query import IndexSearcher

    searcher = IndexSearcher(spark, index["index"])
    cases = [
        ("w0001 w0042", 10, "freetext"),
        ("w0001 -w0000", 5, "freetext"),
        ("w0001 w0002", 10, "bool_and"),
        ("ACME charitable TRUST", 10, "recon"),
        ("zzz", 10, "freetext"),
    ]
    qdf = spark.createDataFrame(
        [(f"c{i}", t, k, m) for i, (t, k, m) in enumerate(cases)],
        "qid string, text string, k int, mode string",
    )
    batch = run_queries(spark, index["index"], qdf).toPandas()
    for i, (t, k, m) in enumerate(cases):
        got = searcher.search(t, k=k, mode=m)
        want = batch[batch["qid"] == f"c{i}"].sort_values("rank")
        assert [d for _, d, _ in got] == want["doc_id"].tolist(), t
        for (_, _, s_got), s_want in zip(got, want["score"]):
            assert s_got == pytest.approx(s_want, rel=1e-9)
    searcher.close()


def test_recon_queries_find_planted_entities(index, spark, oracle_corpus):
    queries = synth_queries()
    recon = queries[queries["mode"] == "recon"]
    qdf = spark.createDataFrame(recon)
    got = run_queries(spark, index["index"], qdf).toPandas()
    # every recon query must return results (entities are planted)
    assert set(got["qid"]) == set(recon["qid"])


def test_driver_and_distributed_analysis_agree(spark, tmp_path, index):
    """run_queries' small-batch driver-side analysis (VERDICT r03 item 8)
    must equal the distributed lineage on every mode — the big-batch path
    is forced with localize_threshold=0."""
    from find_that_charity_spark.operators.query import run_queries

    cases = [
        ("q0", "charitable trust", 10, "freetext"),
        ("q1", "acme w0001", 10, "freetext"),
        ("q2", "w0001 -w0002", 10, "freetext"),
        ("q3", "charitable trust", 10, "bool_and"),
        ("q5", "charitible", 10, "fuzzy"),
        ("q6", "ACME Charitable-Trust", 10, "recon"),
        ("q7", "zzznothing", 10, "freetext"),
    ]
    schema = "qid string, text string, k int, mode string"
    qdf = spark.createDataFrame(cases, schema)
    idx = index["index"]
    a = sorted(map(tuple, run_queries(spark, idx, qdf).collect()))
    b = sorted(
        map(tuple, run_queries(spark, idx, qdf, localize_threshold=0).collect())
    )
    assert a == b
    # sharded variant through both paths too
    a2 = sorted(map(tuple, run_queries(spark, idx, qdf, doc_shards=3).collect()))
    b2 = sorted(
        map(
            tuple,
            run_queries(spark, idx, qdf, doc_shards=3, localize_threshold=0).collect(),
        )
    )
    assert a == a2 == b2
