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
    assert stages == {"tokenized", "docs", "segments", "compact", "dictionary"}
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


def test_recon_queries_find_planted_entities(index, spark, oracle_corpus):
    queries = synth_queries()
    recon = queries[queries["mode"] == "recon"]
    qdf = spark.createDataFrame(recon)
    got = run_queries(spark, index["index"], qdf).toPandas()
    # every recon query must return results (entities are planted)
    assert set(got["qid"]) == set(recon["qid"])
