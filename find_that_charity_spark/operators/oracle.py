"""Brute-force BM25 oracle (SURVEY.md §5.2).

The executable stand-in for "the reference engine's top-k docIDs and BM25
scores" (BASELINE.json north_star): score EVERY document for every query
with the pinned formula (B2), exact token counts (B3), tie-break (B4) —
driver-side numpy, no Spark, no pruning, no compression. The fast path
(segments + block-max WAND) must match it exactly: same doc_ids, same
order, scores equal to 1e-6 rel.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Callable, Sequence

import numpy as np

from find_that_charity_spark.functions.analyzer import analyze
from find_that_charity_spark.functions.bm25 import bm25_term_score_np, idf_np


def brute_force_topk(
    doc_ids: Sequence[int],
    texts: Sequence[str],
    query_text: str,
    k: int = 10,
    analyzer: Callable[[str], list[str]] = analyze,
    query_analyzer: Callable[[str], list[str]] | None = None,
) -> list[tuple[int, float]]:
    """Exhaustive BM25 top-k: [(doc_id, score)] by (score DESC, doc_id ASC).

    Documents with score 0 (no query term present) are excluded, matching
    OR-semantics retrieval (B5) — an ES ``match`` query never returns
    non-matching docs.
    """
    qa = query_analyzer or analyzer
    terms = sorted(set(qa(query_text)))
    tokenized = [analyzer(t) for t in texts]
    dls = np.array([len(t) for t in tokenized], dtype=np.float64)
    n = len(tokenized)
    if n == 0 or not terms:
        return []
    avgdl = float(dls.mean())

    counters = [Counter(t) for t in tokenized]
    scores = np.zeros(n, dtype=np.float64)
    matched = np.zeros(n, dtype=bool)
    for term in terms:
        tf = np.array([c.get(term, 0) for c in counters], dtype=np.float64)
        df = int((tf > 0).sum())
        if df == 0:
            continue
        idf = idf_np(float(n), float(df))
        contrib = np.where(tf > 0, bm25_term_score_np(tf, dls, idf, avgdl), 0.0)
        scores += contrib
        matched |= tf > 0

    ids = np.asarray(doc_ids)
    sel = np.flatnonzero(matched)
    order = sorted(sel.tolist(), key=lambda i: (-scores[i], ids[i]))[:k]
    return [(int(ids[i]), float(scores[i])) for i in order]
