"""Reference application surface (SURVEY.md §2A): the OpenRefine
Reconciliation API batch endpoint (A3), suggest/autocomplete (A5), and
add-to-CSV batch reconciliation (A6).

find-that-charity exposes these over Elasticsearch [public: OpenRefine
Reconciliation Service API v0.2; find-that-charity /reconcile and
/addtocsv endpoints]; here they are thin driver-side shapes over the
engine's query pipeline — the engine subsumes the app surface.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from find_that_charity_spark.operators.query import run_queries


def reconcile(
    spark: SparkSession, index_dir: str, batch: dict[str, dict[str, Any]]
) -> dict[str, dict[str, Any]]:
    """OpenRefine Recon API v0.2 batch call.

    ``batch`` = {"q0": {"query": "acme trust", "limit": 10}, ...}
    Returns {"q0": {"result": [{"id", "name", "score", "match"}, ...]}}.

    ``id``/``name`` carry the document url (the corpus analog of the
    reference's org-id + primary name). ``match`` follows the reference's
    heuristic: single candidate, or a clear winner (>= 1.5x runner-up
    score), marks the top hit as a confident match.
    """
    rows = [
        (qid, q.get("query", ""), int(q.get("limit", 10)), "recon")
        for qid, q in batch.items()
    ]
    qdf = spark.createDataFrame(rows, "qid string, text string, k int, mode string")
    res = run_queries(spark, index_dir, qdf, join_urls=True).collect()

    by_q: dict[str, list] = {qid: [] for qid in batch}
    for r in sorted(res, key=lambda r: (r["qid"], r["rank"])):
        by_q[r["qid"]].append(r)
    out: dict[str, dict[str, Any]] = {}
    for qid, hits in by_q.items():
        results = []
        for i, h in enumerate(hits):
            confident = len(hits) == 1 or (
                i == 0 and len(hits) > 1 and h["score"] >= 1.5 * hits[1]["score"]
            )
            results.append(
                {
                    "id": h["url"],
                    "name": h["url"],
                    "score": float(h["score"]),
                    "match": bool(i == 0 and confident),
                }
            )
        out[qid] = {"result": results}
    return out


def suggest(spark: SparkSession, index_dir: str, prefix: str, k: int = 10) -> list[dict[str, Any]]:
    """A5 completion suggester: dictionary prefix scan, most-frequent first.

    The dictionary is bucket-partitioned parquet; a prefix scan is a
    pruned scan + TakeOrderedAndProject — no shuffle of postings."""
    d = spark.read.parquet(f"{index_dir}/dictionary")
    rows = (
        d.where(F.col("term").startswith(prefix.lower()))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
        .collect()
    )
    return [{"text": r["term"], "df": r["df"]} for r in rows]


def add_to_csv(
    spark: SparkSession,
    index_dir: str,
    user_df: DataFrame,
    query_col: str,
    match_threshold: float = 0.0,
) -> DataFrame:
    """A6: enrich a user table with its best reconciliation match.

    Adds ``match_url`` and ``match_score`` columns (null when no hit).
    The user table keeps its row identity via a deterministic qid."""
    keyed = user_df.withColumn("_qid", F.md5(F.col(query_col)))
    qdf = keyed.select(
        F.col("_qid").alias("qid"),
        F.col(query_col).alias("text"),
        F.lit(1).alias("k"),
        F.lit("recon").alias("mode"),
    ).dropDuplicates(["qid"])
    res = run_queries(spark, index_dir, qdf, join_urls=True).where(F.col("rank") == 1)
    matches = res.select(
        F.col("qid").alias("_qid"),
        F.col("url").alias("match_url"),
        F.col("score").alias("match_score"),
    ).where(F.col("score") >= match_threshold)
    return keyed.join(F.broadcast(matches), "_qid", "left").drop("_qid")
