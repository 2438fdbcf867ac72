"""D8 — faceted search analytics over the MATCH SET (not the top-k).

The ES terms-aggregation analog (`"aggs": {"by_lang": {"terms":
{"field": "lang"}}}` under a query): count every live document matching
ANY analyzed query term, grouped by a docs-table column. This is the
"search + analytics in one engine" surface — e.g. find-that-charity's
count-by-source/org-type panels next to the result list.

Spark-first plan, 100-TB posture:

- dictionary probe: pushed IN-list on the (tiny) query-term set — the
  scan reads only matching row groups, no shuffle;
- segments scan: ``bucket IN (...)`` partition filter + term IN-list,
  postings blobs of non-matching terms never leave parquet;
- decode: Arrow ``mapInPandas`` streaming doc_id batches (numpy varint/
  PForDelta decode — the same kernels the scorer uses), never per-row
  Python;
- OR-dedup: one ``distinct`` shuffle over MATCHED ids only (bounded by
  the union of the query terms' df, not the corpus);
- facet join: matched ids x docs on doc_id, left to AQE — it broadcasts
  the id side when small and falls back to a shuffle join when a stop-
  word-sized match set genuinely needs one;
- tombstone exclusion before the join (same broadcast the scorer uses).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from find_that_charity_spark.functions.analyzer import analyze, analyze_name
from find_that_charity_spark.functions.codec import decode_postings
from find_that_charity_spark.operators.query import read_tombstones
from find_that_charity_spark.plans.checkpoint import check_format

_IDS_SCHEMA = "doc_id long"


def _decode_ids(it):
    for pdf in it:
        chunks = []
        for _, row in pdf.iterrows():
            bm = [
                (b["last_doc"], b["max_tf"], b["min_dl"], b["offset"], b["n"])
                for b in row["blockmax"]
            ]
            chunks.append(
                decode_postings(row["postings"], bm, with_positions=False)[0]
            )
        yield pd.DataFrame(
            {
                "doc_id": np.concatenate(chunks)
                if chunks
                else np.empty(0, dtype=np.int64)
            }
        )


def facet_counts(
    spark: SparkSession,
    index_dir: str,
    query_text: str,
    facet_col: str = "lang",
    mode: str = "freetext",
) -> DataFrame:
    """(facet, matches) for every live doc matching ANY analyzed term of
    ``query_text`` (OR semantics — ES filter context + terms agg). The
    facet value is cast to string; NULL facets group as NULL, matching
    SQL GROUP BY."""
    check_format(index_dir)
    analyzer = analyze_name if mode == "recon" else analyze
    terms = sorted(set(analyzer(query_text)))
    docs = spark.read.parquet(f"{index_dir}/docs")
    empty = docs.select(
        F.col(facet_col).cast("string").alias("facet"),
        F.lit(0).cast("long").alias("matches"),
    ).limit(0)
    if not terms:
        return empty
    # D2: pushed IN-list probe of the dictionary — tiny result, collected
    # driver-side to derive the bucket partition filter
    matched = (
        spark.read.parquet(f"{index_dir}/dictionary")
        .where(F.col("term").isin(terms))
        .select("term", "bucket")
        .collect()
    )
    if not matched:
        return empty
    buckets = sorted({r["bucket"] for r in matched})
    hit_terms = sorted({r["term"] for r in matched})
    segments = (
        spark.read.parquet(f"{index_dir}/segments")
        .where(F.col("bucket").isin(buckets))       # partition filter (D3)
        .where(F.col("term").isin(hit_terms))       # row-group pushdown
        .select("postings", "blockmax")
    )
    ids = segments.mapInPandas(_decode_ids, _IDS_SCHEMA).distinct()
    tomb = read_tombstones(spark, index_dir)
    if tomb.size:
        tomb_df = spark.createDataFrame(
            [(int(t),) for t in tomb], _IDS_SCHEMA
        )
        ids = ids.join(F.broadcast(tomb_df), "doc_id", "left_anti")
    return (
        docs.join(ids, "doc_id")
        .groupBy(F.col(facet_col).cast("string").alias("facet"))
        .agg(F.count(F.lit(1)).cast("long").alias("matches"))
    )
