"""Slice-1 relational BM25 vs brute-force oracle + DuckDB twin (§5.2/§5.4)."""

from __future__ import annotations

import duckdb
import pytest

from find_that_charity_spark.operators.oracle import brute_force_topk
from find_that_charity_spark.operators.relational import (
    FLAGSHIP_QUERY,
    bm25_topk,
    bm25_topk_sql,
    flagship,
)

QUERIES = [FLAGSHIP_QUERY, "customer", "slow fast scan", "key value hash agg", "nosuchterm"]


@pytest.fixture(scope="module")
def docs_pd(sf_small):
    return duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_small}/documents.parquet' ORDER BY doc_id"
    ).df()


@pytest.mark.parametrize("q", QUERIES)
def test_relational_matches_brute_force(spark, sf_small, q, docs_pd):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    got = bm25_topk(docs, q, k=10).collect()
    want = brute_force_topk(docs_pd["doc_id"].tolist(), docs_pd["text"].tolist(), q, k=10)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    assert [r["rank"] for r in got] == list(range(1, len(want) + 1))
    for r, (_, score) in zip(got, want):
        assert r["score_mil"] == int(score * 1e4 + 0.5) or abs(
            r["score_mil"] - score * 1e4
        ) <= 1, (r, score)


@pytest.mark.parametrize("q", QUERIES[:3])
def test_relational_matches_duckdb(spark, sf_small, q):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    got = [tuple(r) for r in bm25_topk(docs, q, k=10).collect()]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_small}/documents.parquet'")
    want = con.sql(bm25_topk_sql(q, k=10)).fetchall()
    assert got == [tuple(r) for r in want]


def test_flagship_smoke(spark, sf_small):
    out = flagship(spark, sf_small)
    rows = out.collect()
    assert len(rows) > 0
    assert out.columns == ["doc_id", "rank", "score_mil"]
