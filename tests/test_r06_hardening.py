"""Round-6 optimization hardening: the review findings' regressions.

The optimization round replaced several JVM expression kernels with
Arrow/numpy twins and added driver-side tails; these tests pin the
degenerate-input semantics the replacements must preserve and the
path-equality of the new tails.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _vec(seed: int, dim: int = 8) -> list[float]:
    rng = np.random.default_rng(seed)
    return [float(x) for x in rng.standard_normal(dim)]


@pytest.fixture(scope="module")
def null_emb(spark):
    rows = [(i, _vec(i)) for i in range(6)]
    rows.append((6, None))            # null vector
    rows.append((7, _vec(7, dim=5)))  # ragged vector
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_brute_tolerates_null_and_ragged(null_emb):
    """np.stack raised on null/ragged rows where the old zip_with
    expressions returned a NULL cosine — the masked kernels must not
    crash and must exclude those rows from the top-k."""
    from find_that_charity_spark.operators.similarity import cosine_topk_brute

    out = cosine_topk_brute(null_emb, query_vec_id=0, k=5).collect()
    got_ids = {r["vec_id"] for r in out}
    assert got_ids == {1, 2, 3, 4, 5}  # valid rows outrank null-cos rows
    # with k covering every row, null/ragged rows appear LAST with a null
    # quantized score — the JVM twin's ordering (desc => nulls last)
    full = cosine_topk_brute(null_emb, query_vec_id=0, k=10).collect()
    tail = [r for r in full if r["vec_id"] in (6, 7)]
    assert all(r["cos_mil"] is None for r in tail)
    assert {r["rank"] for r in tail} == {6, 7}


def test_srp_bucket_null_vec_matches_jvm_zero_bucket(null_emb, spark):
    """The JVM srp_bucket_expr maps a null/ragged vector to bucket 0
    (null dot -> otherwise(0) for every bit); the Arrow twin must agree
    row-for-row, including on those rows."""
    from find_that_charity_spark.operators.similarity import (
        srp_bucket_expr,
        srp_bucket_udf,
    )

    planes = np.random.default_rng(13).standard_normal((4, 8))
    both = null_emb.select(
        "vec_id",
        srp_bucket_expr("embedding", planes).alias("jvm"),
        srp_bucket_udf(planes)("embedding").alias("arrow"),
    ).collect()
    for r in both:
        jvm = 0 if r["jvm"] is None else int(r["jvm"])
        assert int(r["arrow"]) == jvm, f"vec_id={r['vec_id']}"


def test_lsh_null_query_vector_returns_empty(null_emb):
    from find_that_charity_spark.operators.similarity import cosine_topk_lsh

    out = cosine_topk_lsh(null_emb, query_vec_id=6, k=5, n_bits=4, dim=8)
    assert out.collect() == []


def test_minhash_driver_tail_equals_distributed(spark):
    """The small-N driver pairs tail (signature_impl='auto' routes there)
    must produce exactly the distributed plan's output (explicit 'arrow'
    impl has no row-count probe, so it keeps the distributed tail)."""
    from find_that_charity_spark.operators.dedup import minhash_lsh_pairs

    rows = [(i, f"alpha beta gamma delta epsilon zeta doc{i % 3}") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    auto = sorted(
        map(tuple, minhash_lsh_pairs(docs, threshold=0.5, signature_impl="auto").collect())
    )
    dist = sorted(
        map(tuple, minhash_lsh_pairs(docs, threshold=0.5, signature_impl="arrow").collect())
    )
    assert auto == dist and len(auto) > 0


def test_simhash_driver_tail_equals_distributed(spark):
    from find_that_charity_spark.operators.dedup import simhash_near_dups

    rows = [(i, f"red green blue cyan magenta doc{i % 4}") for i in range(16)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    auto = sorted(
        map(tuple, simhash_near_dups(docs, max_hamming=6, signature_impl="auto").collect())
    )
    dist = sorted(
        map(tuple, simhash_near_dups(docs, max_hamming=6, signature_impl="arrow").collect())
    )
    assert auto == dist and len(auto) > 0


def test_minhash_driver_tail_dedups_pairs_with_duplicate_ids(spark):
    """Degenerate input with a duplicated id: the driver tail must emit
    one row per (id_a, id_b), like the distributed dropDuplicates."""
    from find_that_charity_spark.operators.dedup import minhash_lsh_pairs

    text = "one two three four five six seven"
    docs = spark.createDataFrame(
        [(1, text), (1, text), (2, text)], "doc_id long, text string"
    )
    out = minhash_lsh_pairs(docs, threshold=0.5, signature_impl="auto").collect()
    pairs = [(r["id_a"], r["id_b"]) for r in out]
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == {(1, 2)}


def test_census_skip_requires_exact_count():
    """The auto-routing probe truncates at threshold+1; a truncated count
    must never disable the over-cap skew guard. Pin the probe contract:
    n_probe is exact iff <= _AUTO_SIGNATURE_THRESHOLD."""
    from find_that_charity_spark.operators import dedup as D

    # the guard in minhash_lsh_pairs requires BOTH n_probe <= threshold
    # (exactness) and n_probe <= bucket_cap; read the source to keep this
    # from silently regressing
    import inspect

    src = inspect.getsource(D.minhash_lsh_pairs)
    assert "n_probe <= _AUTO_SIGNATURE_THRESHOLD" in src
    assert "n_probe <= bucket_cap" in src
