"""Okapi BM25 scoring (SURVEY.md §2B B2-B4).

Formula pinned to Lucene's BM25Similarity [public], which is what the
reference's Elasticsearch backend computes, with k1=1.2 b=0.75
(BASELINE.json north_star):

    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))          (non-negative)
    score(q,d) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

We keep the rank-neutral ``(k1+1)`` numerator (dropped in Lucene >= 8);
ranks are identical either way, and keeping it makes scores comparable to
classic Okapi. ``dl`` is the exact token count (no Lucene norm-byte
quantization — SURVEY.md §2B B3). Tie-break everywhere: (score DESC,
doc_id ASC) (B4).

Three forms of the same math, equivalence-tested:
- numpy (``*_np``): brute-force oracle + WAND inner loop;
- Column (``*_col``): the relational/oracle DataFrame path — native
  expressions, whole-stage-codegen'd;
- the SQL rendering used in DuckDB oracle strings (see operators/relational).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

K1: float = 1.2
B: float = 0.75


def idf_np(n_docs: float, df: np.ndarray | float) -> np.ndarray | float:
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_term_score_np(
    tf: np.ndarray | float,
    dl: np.ndarray | float,
    idf: np.ndarray | float,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> np.ndarray | float:
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))


def idf_col(n_docs: Column, df: Column) -> Column:
    return F.log(F.lit(1.0) + (n_docs - df + F.lit(0.5)) / (df + F.lit(0.5)))


def bm25_term_score_col(
    tf: Column, dl: Column, idf: Column, avgdl: Column, k1: float = K1, b: float = B
) -> Column:
    return idf * (tf * F.lit(k1 + 1.0)) / (
        tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dl / avgdl))
    )


def bm25_sql(tf: str, dl: str, n: str, df: str, avgdl: str, k1: float = K1, b: float = B) -> str:
    """Render the per-term BM25 partial score as ANSI SQL (DuckDB oracle)."""
    idf = f"ln(1.0 + ({n} - {df} + 0.5) / ({df} + 0.5))"
    return (
        f"{idf} * ({tf} * {k1 + 1.0}) / "
        f"({tf} + {k1} * ({1.0 - b} + {b} * ({dl} / {avgdl})))"
    )
