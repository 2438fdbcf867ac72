"""Vectorized phrase anchor verification (VERDICT r02 item 1).

``score_phrase`` must be one numpy pass over the whole candidate set —
no per-candidate-doc Python loop. These tests pin (a) equivalence with a
naive per-doc reference scorer on random corpora, and (b) that a phrase
whose candidate set is ~100% of a 100k-doc corpus completes in
vectorized time and scales ~linearly vs the 1k case.
"""

from __future__ import annotations

import time

import numpy as np

from find_that_charity_spark.functions.codec import tfnorm
from find_that_charity_spark.operators.query import score_phrase


def _term_data_from_tokens(docs_tokens: dict[int, list[str]]):
    """Build score_phrase's term_data from {doc_id: token list}."""
    terms: dict[str, dict[int, list[int]]] = {}
    for doc_id, toks in docs_tokens.items():
        for pos, t in enumerate(toks):
            terms.setdefault(t, {}).setdefault(doc_id, []).append(pos)
    out = {}
    for t, by_doc in terms.items():
        doc_ids = sorted(by_doc)
        docs = np.array(doc_ids, dtype=np.int64)
        tfs = np.array([len(by_doc[d]) for d in doc_ids], dtype=np.int64)
        dls = np.array([len(docs_tokens[d]) for d in doc_ids], dtype=np.int64)
        pos_flat = np.array(
            [p for d in doc_ids for p in by_doc[d]], dtype=np.int64
        )
        out[t] = (docs, tfs, dls, pos_flat)
    return out


def _naive_phrase_topk(docs_tokens, phrase_terms, idfs, avgdl, k):
    """Per-doc reference: scan each token list for the consecutive run."""
    n = len(phrase_terms)
    weight = sum(idfs[t] for t in phrase_terms)
    results = []
    for doc_id, toks in docs_tokens.items():
        pf = sum(
            1
            for i in range(len(toks) - n + 1)
            if toks[i : i + n] == phrase_terms
        )
        if pf:
            dl = float(len(toks))
            s = weight * float(
                tfnorm(np.array([float(pf)]), np.array([dl]), avgdl)[0]
            )
            results.append((doc_id, s))
    results.sort(key=lambda r: (-r[1], r[0]))
    return results[:k]


def _q_offsets(phrase_terms):
    offs: dict[str, list[int]] = {}
    for i, t in enumerate(phrase_terms):
        offs.setdefault(t, []).append(i)
    return offs


def test_matches_naive_reference_on_random_corpora():
    rng = np.random.default_rng(7)
    vocab = ["a", "b", "c", "d", "e"]
    for trial in range(5):
        docs_tokens = {
            int(d): [vocab[i] for i in rng.integers(0, len(vocab), rng.integers(3, 30))]
            for d in range(200)
        }
        idfs = {t: 1.0 + 0.1 * i for i, t in enumerate(vocab)}
        avgdl = float(np.mean([len(v) for v in docs_tokens.values()]))
        for phrase in (["a", "b"], ["a", "b", "a"], ["c", "c"], ["e", "d", "c", "b"]):
            td = _term_data_from_tokens(docs_tokens)
            td = {t: td[t] for t in set(phrase) if t in td}
            got = score_phrase(td, _q_offsets(phrase), idfs, avgdl, k=25)
            want = _naive_phrase_topk(docs_tokens, phrase, idfs, avgdl, k=25)
            assert [d for d, _ in got] == [d for d, _ in want], (trial, phrase)
            for (_, sg), (_, sw) in zip(got, want):
                assert abs(sg - sw) <= 1e-9 * max(1.0, abs(sw))


def _dense_candidates(n_docs: int):
    """Every doc contains both terms; even docs contain the phrase."""
    docs = np.arange(n_docs, dtype=np.int64)
    ones = np.ones(n_docs, dtype=np.int64)
    dls = np.full(n_docs, 5, dtype=np.int64)
    pos_a = np.zeros(n_docs, dtype=np.int64)
    pos_b = np.where(docs % 2 == 0, 1, 3).astype(np.int64)
    return {
        "a": (docs, ones, dls, pos_a),
        "b": (docs.copy(), ones.copy(), dls.copy(), pos_b),
    }


def test_corpus_scale_candidate_set_is_vectorized():
    idfs = {"a": 1.0, "b": 1.0}
    qoff = {"a": [0], "b": [1]}

    def run(n):
        td = _dense_candidates(n)
        t0 = time.perf_counter()
        got = score_phrase(td, qoff, idfs, avgdl=5.0, k=10)
        wall = time.perf_counter() - t0
        assert [d for d, _ in got] == [2 * i for i in range(10)]
        return wall

    run(1_000)  # warm numpy
    t_small = min(run(1_000) for _ in range(3))
    t_big = min(run(100_000) for _ in range(3))
    # 100% of a 100k-doc corpus as candidates: vectorized anchor checks
    # finish in milliseconds; the old per-doc loop took seconds here.
    assert t_big < 0.5, f"100k-candidate phrase took {t_big:.3f}s"
    # ~linear in candidate count (generous slack for constant overheads)
    assert t_big / max(t_small, 1e-5) < 300.0
