"""Deduplication operators over document corpora.

Covers the reference's url-identity dedup (SURVEY.md §2C C3) plus the
training-data-pipeline family: exact content dedup, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup. All are DataFrame
plans; the only Python is Arrow-batched pandas UDFs for signature math.

Scale notes:
- exact dedup is one hash-groupBy shuffle — maps 1:1 to 100 TB (AQE
  coalesces; md5 is JVM-side).
- MinHash banding turns O(n²) similarity into an equi-join on
  (band, band_hash) buckets — the standard LSH trick; candidate pairs
  then get an exact verify. Band-hash skew (e.g. boilerplate docs) is
  bounded by a per-bucket size cap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from find_that_charity_spark.functions.analyzer import tokenize_expr


def dedup_latest_by_url(pages: DataFrame) -> DataFrame:
    """C3: keep the latest ``warc_ts`` capture per url (row_number window)."""
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact content dedup: one row per distinct text, keeper = min id.

    Output: (keep_id bigint, n_dups bigint) ordered by keep_id.
    """
    return (
        docs.select(F.col(id_col).alias("_id"), F.md5(F.col(text_col)).alias("h"))
        .groupBy("h")
        .agg(F.min("_id").cast("bigint").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .select("keep_id", "n_dups")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

# Deterministic universal-hash parameters: h_i(x) = (a_i*x + b_i) mod p.
# p = 2^31 - 1 keeps a*x + b < 2^62, so the whole family runs in
# vectorized uint64 numpy (no Python bigints); 31-bit min-hashes are the
# standard quality/width trade-off.
_MERSENNE_P = (1 << 31) - 1


def _minhash_params(num_hashes: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE_P, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE_P, size=num_hashes, dtype=np.int64)
    return a, b


def _shingle_hashes(tokens: list[str], shingle: int) -> np.ndarray:
    """Stable 61-bit hashes of token n-gram shingles (md5 prefix — C-speed
    and process-stable, unlike Python's salted hash())."""
    import hashlib

    if len(tokens) < shingle:
        grams = [" ".join(tokens)] if tokens else []
    else:
        grams = [" ".join(tokens[i : i + shingle]) for i in range(len(tokens) - shingle + 1)]
    if not grams:
        return np.empty(0, dtype=np.int64)
    buf = b"".join(hashlib.md5(g.encode("utf-8")).digest()[:8] for g in grams)
    out = np.frombuffer(buf, dtype=np.uint64)
    return (out % np.uint64(_MERSENNE_P)).astype(np.int64)


def minhash_signature_udf(num_hashes: int = 64, shingle: int = 3):
    """Arrow-batched pandas UDF: tokens array → minhash signature array."""
    a, b = _minhash_params(num_hashes)

    a_u = a.astype(np.uint64)[:, None]
    b_u = b.astype(np.uint64)[:, None]

    @pandas_udf(ArrayType(LongType()))
    def _sig(tokens: pd.Series) -> pd.Series:
        out = []
        for toks in tokens:
            sh = _shingle_hashes(list(toks) if toks is not None else [], shingle)
            if len(sh) == 0:
                out.append([int(_MERSENNE_P)] * num_hashes)
                continue
            # (num_hashes, n_shingles) affine hash, min over shingles —
            # uint64 throughout (a, x, b < 2^31 so a*x + b < 2^62)
            vals = (a_u * sh.astype(np.uint64)[None, :] + b_u) % np.uint64(_MERSENNE_P)
            out.append(vals.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return _sig


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash banding + exact verify.

    Output: (id_a, id_b, jaccard_mil) with id_a < id_b, estimated Jaccard
    (signature agreement rate) >= threshold, quantized to 1e-3.
    """
    rows_per_band = num_hashes // bands
    sig_udf = minhash_signature_udf(num_hashes, shingle)
    sigs = docs.select(
        F.col(id_col).alias("id"),
        sig_udf(tokenize_expr(text_col)).alias("sig"),
    )
    banded = sigs.select(
        "id",
        "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.hash(F.slice("sig", i * rows_per_band + 1, rows_per_band)),
            )
        ).alias("band", "band_hash"),
    )
    pairs = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sig").alias("sig_a"),
            F.col("r.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    ) / F.lit(float(num_hashes))
    return (
        pairs.withColumn("jac", agree)
        .where(F.col("jac") >= threshold)
        .select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.floor(F.col("jac") * 1000 + F.lit(0.5)).cast("bigint").alias("jaccard_mil"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
) -> DataFrame:
    """Exact token-set Jaccard similarity pairs (small/verify-path dedup).

    Relational plan: explode distinct tokens, self-equi-join on token →
    intersection counts; |A∪B| = |A|+|B|-|A∩B|. SQL-expressible, so it
    doubles as a DuckDB-checkable oracle for the MinHash estimate. At
    scale the token join replaces the O(n²) pair enumeration; boilerplate
    token skew is the caveat (use MinHash path there).

    Output: (id_a, id_b, jaccard_mil) with id_a < id_b, Jaccard >= threshold.
    """
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(tokenize_expr(text_col))).alias("t")
    )
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        toks.alias("l")
        .join(toks.alias("r"), (F.col("l.t") == F.col("r.t")) & (F.col("l.id") < F.col("r.id")))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jac", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .where(F.col("jac") >= threshold)
        .select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.floor(F.col("jac") * 1000 + F.lit(0.5)).cast("bigint").alias("jaccard_mil"),
        )
    )


def simhash_udf(bits: int = 64):
    """Arrow-batched SimHash over token arrays (unweighted)."""

    @pandas_udf(LongType())
    def _simhash(tokens: pd.Series) -> pd.Series:
        import hashlib

        out = np.zeros(len(tokens), dtype=np.int64)
        for row_i, toks in enumerate(tokens):
            if toks is None or len(toks) == 0:
                continue
            buf = b"".join(hashlib.md5(t.encode("utf-8")).digest()[:8] for t in toks)
            hs = np.frombuffer(buf, dtype=np.uint64)
            # (n_tokens, 64) bit matrix, vectorized majority vote per bit
            bitmat = np.unpackbits(
                hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            ).astype(np.int64)
            acc = 2 * bitmat.sum(axis=0) - len(hs)
            v = int(
                np.packbits((acc > 0).astype(np.uint8), bitorder="little")
                .view(np.uint64)[0]
            )
            out[row_i] = v - (1 << 64) if v >= (1 << 63) else v
        return pd.Series(out)

    return _simhash


def simhash_near_dups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs: 4-block banding (any identical 16-bit block
    is a candidate — guaranteed to catch hamming distance <= 3), then exact
    hamming verify via bit_count(xor).

    Output: (id_a, id_b, hamming int).
    """
    sim = simhash_udf()
    sigs = docs.select(F.col(id_col).alias("id"), sim(tokenize_expr(text_col)).alias("sh"))
    blocks = sigs.select(
        "id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("sh", i * 16).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("blk", "blk_val"),
    )
    cand = (
        blocks.alias("l")
        .join(
            blocks.alias("r"),
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.blk_val") == F.col("r.blk_val"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select(
            F.col("id_a").cast("bigint"), F.col("id_b").cast("bigint"), F.col("hamming").cast("int")
        )
    )
