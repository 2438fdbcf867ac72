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

import re

import numpy as np

from find_that_charity_spark.functions.analyzer import analyze
from find_that_charity_spark.functions.bm25 import bm25_term_score_np, idf_np
from find_that_charity_spark.functions.codec import tfnorm


def brute_force_phrase_topk(
    doc_ids: Sequence[int],
    texts: Sequence[str],
    query_text: str,
    k: int = 10,
    analyzer: Callable[[str], list[str]] = analyze,
    include=None,
) -> list[tuple[int, float]]:
    """Exhaustive phrase top-k (ES match_phrase / Lucene PhraseQuery):
    weight = sum of idf over query token occurrences; tf = number of exact
    consecutive occurrences of the analyzed phrase; score = weight *
    tfnorm(phrase_freq, dl, avgdl). Tie-break (score DESC, doc_id ASC)."""
    q = analyzer(query_text)
    if not q:
        return []
    tokenized = [analyzer(t) for t in texts]
    dls = np.array([len(t) for t in tokenized], dtype=np.float64)
    n = len(tokenized)
    if n == 0:
        return []
    avgdl = float(dls.mean())
    dfs = {}
    for term in set(q):
        dfs[term] = sum(1 for toks in tokenized if term in set(toks))
        if dfs[term] == 0:
            return []
    weight = float(sum(idf_np(float(n), float(dfs[t])) for t in q))
    out = []
    m = len(q)
    allowed = None if include is None else set(int(d) for d in include)
    for i, toks in enumerate(tokenized):
        if allowed is not None and int(doc_ids[i]) not in allowed:
            continue
        pf = sum(1 for p in range(len(toks) - m + 1) if toks[p : p + m] == q)
        if pf:
            score = weight * float(
                tfnorm(np.array([float(pf)]), np.array([dls[i]]), avgdl)[0]
            )
            out.append((int(doc_ids[i]), score))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


def brute_force_topk(
    doc_ids: Sequence[int],
    texts: Sequence[str],
    query_text: str,
    k: int = 10,
    analyzer: Callable[[str], list[str]] = analyze,
    query_analyzer: Callable[[str], list[str]] | None = None,
    conjunctive: bool = False,
    min_match: int = 1,
    include=None,
) -> list[tuple[int, float]]:
    """Exhaustive BM25 top-k: [(doc_id, score)] by (score DESC, doc_id ASC).

    OR semantics by default (B5): documents with no query term are never
    returned (ES ``match``). ``conjunctive=True`` requires every positive
    term (ES bool must); query words prefixed ``-`` are exclusions (D7,
    ES bool must_not); ``min_match`` > 1 keeps only docs matching at
    least that many distinct positive terms (ES minimum_should_match).
    A required term absent from the corpus -> no hits.
    """
    qa = query_analyzer or analyzer
    pos_terms: set[str] = set()
    neg_terms: set[str] = set()
    boosts: dict[str, float] = {}
    for word in (query_text or "").split():
        # Lucene boost 'word^2.5' (D7+): strip before analysis, repeated
        # term takes the max boost -- the engine's pinned contract
        m = re.match(r"^(.*)\^(\d+(?:\.\d+)?)$", word)
        b = float(m.group(2)) if m else 1.0
        wtext = m.group(1) if m else word
        toks = qa(wtext.lstrip("-"))
        if word.startswith("-"):
            neg_terms.update(toks)
        else:
            pos_terms.update(toks)
            for t in toks:
                boosts[t] = max(boosts.get(t, 1.0), b)
    terms = sorted(pos_terms)
    tokenized = [analyzer(t) for t in texts]
    dls = np.array([len(t) for t in tokenized], dtype=np.float64)
    n = len(tokenized)
    if n == 0 or not terms:
        return []
    avgdl = float(dls.mean())

    counters = [Counter(t) for t in tokenized]
    scores = np.zeros(n, dtype=np.float64)
    matched = np.zeros(n, dtype=bool)
    n_terms_matched = np.zeros(n, dtype=np.int64)
    for term in terms:
        tf = np.array([c.get(term, 0) for c in counters], dtype=np.float64)
        df = int((tf > 0).sum())
        if df == 0:
            if conjunctive:
                return []
            continue
        idf = idf_np(float(n), float(df)) * boosts.get(term, 1.0)
        contrib = np.where(tf > 0, bm25_term_score_np(tf, dls, idf, avgdl), 0.0)
        scores += contrib
        matched |= tf > 0
        n_terms_matched += (tf > 0).astype(np.int64)

    if conjunctive:
        matched &= n_terms_matched == len(terms)
    if min_match > 1:
        matched &= n_terms_matched >= min_match
    if include is not None:
        allowed = set(int(d) for d in include)
        matched &= np.array([int(d) in allowed for d in doc_ids], dtype=bool)
    for term in sorted(neg_terms):
        has = np.array([c.get(term, 0) > 0 for c in counters], dtype=bool)
        matched &= ~has

    ids = np.asarray(doc_ids)
    sel = np.flatnonzero(matched)
    order = sorted(sel.tolist(), key=lambda i: (-scores[i], ids[i]))[:k]
    return [(int(ids[i]), float(scores[i])) for i in order]
