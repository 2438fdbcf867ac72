"""Micro-benchmarks (BASELINE.md: codec, intersect, WAND inner loop).

Run separately from the correctness gate:

    python -m pytest benchmarks/bench_micro.py -q

Uses pytest-benchmark when available; falls back to plain timing asserts.
"""

from __future__ import annotations

import numpy as np
import pytest

from find_that_charity_spark.functions.bm25 import idf_np
from find_that_charity_spark.functions.codec import (
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)
from find_that_charity_spark.operators.query import (
    _make_cursor,
    _member_mask,
    score_query_bmw,
)

N = 1_000_000


@pytest.fixture(scope="module")
def postings():
    rng = np.random.default_rng(5)
    docs = np.cumsum(rng.integers(1, 20, size=N)).astype(np.int64)
    tfs = rng.integers(1, 9, size=N).astype(np.int64)
    dls = rng.integers(8, 500, size=N).astype(np.int64)
    return docs, tfs, dls


def test_varint_encode_throughput(benchmark, postings):
    docs, _, _ = postings
    vals = docs.astype(np.uint64)
    out = benchmark(varint_encode, vals)
    assert len(out) > 0


def test_varint_decode_throughput(benchmark, postings):
    docs, _, _ = postings
    buf = varint_encode(docs.astype(np.uint64))
    out = benchmark(varint_decode, buf)
    assert out.size == N


def test_postings_encode_throughput(benchmark, postings):
    docs, tfs, dls = postings
    blob, bm = benchmark(encode_postings, docs, tfs, dls)
    assert len(bm) == (N + 127) // 128


def test_postings_decode_throughput(benchmark, postings):
    docs, tfs, dls = postings
    blob, bm = encode_postings(docs, tfs, dls)
    d, _, _ = benchmark(decode_postings, blob, bm)
    assert d.size == N


def test_galloping_intersect_throughput(benchmark):
    rng = np.random.default_rng(6)
    big = np.sort(rng.choice(50_000_000, size=N, replace=False)).astype(np.int64)
    small = np.sort(rng.choice(big, size=10_000, replace=False)).astype(np.int64)
    mask = benchmark(_member_mask, big, small)
    assert mask.all()


def test_wand_query_throughput(benchmark, postings):
    docs, tfs, dls = postings
    avgdl = 250.0
    blob, bm = encode_postings(docs, tfs, dls)
    bm_d = [
        {"last_doc": ld, "max_tf": mt, "min_dl": md, "offset": off, "n": n}
        for ld, mt, md, off, n in bm
    ]
    idf = float(idf_np(2 * N, N))

    def run():
        c = _make_cursor(idf, blob, bm_d, avgdl)
        return score_query_bmw([c], k=10, avgdl=avgdl)

    out = benchmark(run)
    assert len(out) == 10


# ---------------------------------------------------------------------------
# dedup signature kernels (VERDICT r03 item 3).
#
# Measured context (BENCH/R04_NOTES.md): the r03 Arrow kernel's per-shingle
# hashlib.md5 was ~1.8 us — already near C-floor — so the verdict's >=10x
# hypothesis does not survive measurement: interleaved medians at 100k docs
# / 6.5M shingles, local[4] put the END-TO-END signature stage at
#   r03 arrow 9.4 s | relational md5 8.6 s (1.1x) | relational xxhash
#   4.5 s (2.1x)
# because tokenization, the shingle explode and Spark per-row overhead — all
# shared — dominate. What the rewrite DOES deliver: zero Python in the
# default path (relational md5: whole-stage codegen + map-side partial agg,
# no Arrow transfer, no per-doc loop), a scale flavor whose per-shingle HASH
# cost is ~30x cheaper (xxhash64 + mod-p polynomial vs md5-of-string), and
# signatures bit-identical to the DuckDB oracle in the md5 flavors.
# ---------------------------------------------------------------------------


def test_relational_xxhash_beats_arrow_kernel():
    """Interleaved A/B: the xxhash scale flavor must clear 1.5x over the
    r03 Arrow kernel end-to-end (it measures ~2x; 1.5 leaves host-noise
    margin — see memory: this sandbox shows 2-6x wall swings)."""
    import statistics
    import time

    from pyspark.sql import functions as F

    from find_that_charity_spark.functions.analyzer import tokenize_expr
    from find_that_charity_spark.operators.dedup import (
        minhash_signature_udf,
        minhash_signatures,
    )
    from find_that_charity_spark.session import get_spark
    from find_that_charity_spark.sources.corpus import WEB_PAGES_SCHEMA
    from find_that_charity_spark.sources.synth import synth_web_pages

    spark = get_spark(master="local[4]", app_name="sig-bench", shuffle_partitions=8)
    pages = synth_web_pages(30_000)
    df = (
        spark.createDataFrame(pages, WEB_PAGES_SCHEMA)
        .select(F.monotonically_increasing_id().alias("id"), "text")
        .localCheckpoint()
    )
    df.count()
    udf = minhash_signature_udf(64, 3)
    runs = {
        "arrow": lambda: df.select("id", udf(tokenize_expr("text")).alias("sig"))
        .write.format("noop").mode("overwrite").save(),
        "xx": lambda: minhash_signatures(df, "id", "text", hash_fn="xxhash64")
        .write.format("noop").mode("overwrite").save(),
    }
    for fn in runs.values():
        fn()  # warm
    samples: dict[str, list[float]] = {k: [] for k in runs}
    for _ in range(3):  # interleaved: both arms sample the same noise regime
        for name, fn in runs.items():
            t0 = time.perf_counter()
            fn()
            samples[name].append(time.perf_counter() - t0)
    speedup = statistics.median(samples["arrow"]) / statistics.median(samples["xx"])
    print(f"\nsignature A/B: arrow={samples['arrow']} xx={samples['xx']} -> {speedup:.2f}x")
    assert speedup >= 1.5, f"only {speedup:.2f}x"


def test_exploded_xxhash_twin_equivalent_and_measured():
    """VERDICT r04 item 4 asked for an explode+agg twin of the HOF gram
    flavor. MEASURED OUTCOME (this box, 100k docs, local[4], interleaved
    medians of 3): hof 4.84 s vs exploded 5.42 s -> twin is 0.89x, i.e.
    the token-stream exchange + per-doc window sort the twin needs costs
    MORE than Spark 4's per-element lambda interpretation, which the
    zero-exchange HOF form avoids entirely. The HOF flavor stays the
    scale default; the twin remains available and output-identical
    (asserted here) for engines/versions where HOF interpretation
    dominates. Bound asserted loosely (twin within 2x) so a real
    regression in either arm still fails the suite."""
    import statistics
    import time

    from pyspark.sql import functions as F

    from find_that_charity_spark.operators.dedup import minhash_signatures
    from find_that_charity_spark.session import get_spark
    from find_that_charity_spark.sources.corpus import WEB_PAGES_SCHEMA
    from find_that_charity_spark.sources.synth import synth_web_pages

    spark = get_spark(master="local[4]", app_name="xx-twin", shuffle_partitions=8)
    pages = synth_web_pages(30_000)
    df = (
        spark.createDataFrame(pages, WEB_PAGES_SCHEMA)
        .select(F.monotonically_increasing_id().alias("id"), "text")
        .localCheckpoint()
    )
    df.count()
    # output identity on a sample (full-scale identity checked in
    # tests/test_relational_signatures.py edge cases)
    small = df.limit(500)
    a = minhash_signatures(small, "id", "text", hash_fn="xxhash64") \
        .toPandas().sort_values("id").reset_index(drop=True)
    b = minhash_signatures(small, "id", "text", hash_fn="xxhash64_exploded") \
        .toPandas().sort_values("id").reset_index(drop=True)
    assert all(list(x) == list(y) for x, y in zip(a["sig"], b["sig"]))

    runs = {
        "hof": lambda: minhash_signatures(df, "id", "text", hash_fn="xxhash64")
        .write.format("noop").mode("overwrite").save(),
        "exploded": lambda: minhash_signatures(
            df, "id", "text", hash_fn="xxhash64_exploded"
        ).write.format("noop").mode("overwrite").save(),
    }
    for fn in runs.values():
        fn()
    samples: dict[str, list[float]] = {k: [] for k in runs}
    for _ in range(3):
        for name, fn in runs.items():
            t0 = time.perf_counter()
            fn()
            samples[name].append(time.perf_counter() - t0)
    ratio = statistics.median(samples["exploded"]) / statistics.median(samples["hof"])
    print(f"\nexploded/hof: {samples} -> {ratio:.2f}x (1.0 = parity)")
    assert ratio < 2.0, f"exploded twin regressed to {ratio:.2f}x of HOF"
