"""Hypothesis property tests (SURVEY.md §5.3): codec roundtrip and
analyzer invariants over adversarial generated inputs."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from find_that_charity_spark.functions.analyzer import analyze, analyze_name, analyze_series
from find_that_charity_spark.functions.codec import (
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)

# ---------------------------------------------------------------------------
# varint / postings codec
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=600))
def test_varint_roundtrip_any_u64(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**53),   # doc gap
            st.integers(min_value=1, max_value=10_000),  # tf
            st.integers(min_value=1, max_value=100_000), # dl
        ),
        min_size=1,
        max_size=700,
    )
)
def test_postings_roundtrip_any_list(rows):
    gaps = np.array([r[0] for r in rows], dtype=np.int64)
    docs = np.cumsum(gaps + 1)  # strictly increasing
    tfs = np.array([r[1] for r in rows], dtype=np.int64)
    dls = np.array([r[2] for r in rows], dtype=np.int64)
    blob, bm = encode_postings(docs, tfs, dls)
    d, t, dl = decode_postings(blob, bm)
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs)
    assert np.array_equal(dl, dls)
    # block invariants
    for i, (last_doc, max_tf, min_dl, _off, n) in enumerate(bm):
        s = i * 128
        assert last_doc == docs[min(s + n, len(docs)) - 1]
        assert max_tf == tfs[s : s + n].max()
        assert min_dl == dls[s : s + n].min()


# ---------------------------------------------------------------------------
# analyzer invariants
# ---------------------------------------------------------------------------

texts = st.text(max_size=300)


@settings(max_examples=300, deadline=None)
@given(texts)
def test_analyze_idempotent_and_normalized(s):
    toks = analyze(s)
    # re-analyzing the joined output is a fixpoint
    assert analyze(" ".join(toks)) == toks
    for t in toks:
        assert t == t.lower()
        assert t  # no empties


@settings(max_examples=300, deadline=None)
@given(texts)
def test_vectorized_equals_pinned(s):
    import pandas as pd

    assert list(analyze_series(pd.Series([s]))[0]) == analyze(s)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_analyze_name_is_ascii_superset_fold(s):
    """ascii-folding never produces MORE distinct non-ascii content and is
    itself idempotent."""
    folded = analyze_name(s)
    assert analyze_name(" ".join(folded)) == folded
