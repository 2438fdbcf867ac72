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
    """C3: keep the latest ``warc_ts`` capture per url (row_number window).

    Ties on (url, warc_ts) break by content hash — the SAME tie-break as
    the fused ``dedup_and_assign_ids`` (operators/doc_ids.py), so the
    streaming dedup path and the batch path keep identical text."""
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"), F.desc(F.xxhash64("text")))
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
    bucket_cap: int = 1000,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash banding + exact verify.

    Output: (id_a, id_b, jaccard_mil) with id_a < id_b, estimated Jaccard
    (signature agreement rate) >= threshold, quantized to 1e-3.

    Skew guard: a degenerate band bucket (boilerplate/empty docs collapse
    to one signature) would emit O(m²) candidate pairs. Buckets larger
    than ``bucket_cap`` therefore emit STAR pairs only — every member
    against the bucket's min-id representative (m-1 pairs) — bounding
    candidates at bucket_cap x |bucket| instead of |bucket|² per bucket.
    Precision is unaffected (every emitted pair is agreement-verified),
    but recall inside an over-cap bucket is star-approximate: a pair whose
    ONLY shared buckets are over-cap is reported through the representative
    rather than directly, and is lost entirely if neither member clears the
    threshold against the representative. In the intended regime (over-cap
    buckets are near-identical boilerplate cliques) members agree with the
    representative too, and the clique stays one connected component; exact
    all-pairs output is guaranteed only when no bucket exceeds the cap —
    the regime minhash_pairs_sql's oracle equivalence also assumes.
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
    # the signature UDF (tokenize + shingle + 64 hashes over every doc) is
    # the expensive part and feeds several plan branches below (census,
    # both self-join sides, star path) — persist so it computes once;
    # MEMORY_AND_DISK because signatures of a web-scale corpus exceed
    # executor memory. ContextCleaner reclaims it when unreferenced.
    from pyspark import StorageLevel

    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    # bucket-size census; over-cap buckets are few (degenerate cliques)
    over = (
        banded.groupBy("band", "band_hash")
        .agg(F.count(F.lit(1)).alias("bsz"))
        .where(F.col("bsz") > bucket_cap)
        .select("band", "band_hash")
    )
    small = banded.join(F.broadcast(over), ["band", "band_hash"], "left_anti")
    pairs = (
        small.alias("l")
        .join(
            small.alias("r"),
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
    )
    big = banded.join(F.broadcast(over), ["band", "band_hash"])
    reps = (
        big.groupBy("band", "band_hash")
        .agg(F.min("id").alias("rep_id"))
        .withColumnRenamed("band", "_rband")
        .withColumnRenamed("band_hash", "_rband_hash")
    )
    reps_sig = (
        big.join(
            F.broadcast(reps),
            (F.col("band") == F.col("_rband"))
            & (F.col("band_hash") == F.col("_rband_hash"))
            & (F.col("id") == F.col("rep_id")),
        )
        .select("band", "band_hash", "rep_id", F.col("sig").alias("rep_sig"))
    )
    star = (
        big.join(F.broadcast(reps_sig), ["band", "band_hash"])
        .where(F.col("id") != F.col("rep_id"))
        .select(
            F.col("rep_id").alias("id_a"),  # rep is the bucket min -> id_a < id_b
            F.col("id").alias("id_b"),
            F.col("rep_sig").alias("sig_a"),
            F.col("sig").alias("sig_b"),
        )
    )
    pairs = pairs.unionByName(star).dropDuplicates(["id_a", "id_b"])
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


def minhash_pairs_sql(
    docs_sql: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle: int = 3,
    threshold: float = 0.5,
) -> str:
    """DuckDB oracle twin of :func:`minhash_lsh_pairs`.

    Renders the *identical* signature math in SQL: DuckDB's
    ``md5_number_upper`` equals numpy's little-endian uint64 read of the
    first 8 md5 bytes (verified), and the (a, b) universal-hash table is
    inlined from the same seeded generator. The oracle compares ALL pairs'
    signature agreement — no banding — which is exactly equivalent to the
    banded LSH output whenever ``threshold > 1 - bands/num_hashes``: a
    pair passing the agreement filter then has fewer disagreeing signature
    rows than there are bands, so by pigeonhole it shares one fully
    identical band and is guaranteed to be an LSH candidate. ``docs_sql``
    must select (id, text) and stay small — the oracle is O(n²) by design.
    """
    if threshold <= 1.0 - bands / num_hashes:
        raise ValueError("oracle exact only when threshold > 1 - bands/num_hashes")
    a, b = _minhash_params(num_hashes)
    params = ", ".join(
        f"({i}, {int(a[i])}::UBIGINT, {int(b[i])}::UBIGINT)" for i in range(num_hashes)
    )
    p = _MERSENNE_P
    return f"""
WITH docs AS ({docs_sql}),
tk AS (SELECT id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM docs),
sh AS (
  SELECT id, unnest(
    CASE WHEN len(tk) = 0 THEN []::VARCHAR[]
         WHEN len(tk) < {shingle} THEN [array_to_string(tk, ' ')]
         ELSE list_transform(range(1, len(tk) - {shingle - 2}),
                             i -> array_to_string(tk[i:i+{shingle - 1}], ' '))
    END) AS g
  FROM tk
),
hx AS (SELECT id, (md5_number_upper(g) % {p})::UBIGINT AS x FROM sh),
p AS (SELECT * FROM (VALUES {params}) v(i, a, b)),
sig0 AS (SELECT id, p.i, min((p.a * hx.x + p.b) % {p}) AS v
         FROM hx CROSS JOIN p GROUP BY 1, 2),
sig AS (
  SELECT d.id, p.i, coalesce(s.v, {p}) AS v
  FROM (SELECT DISTINCT id FROM docs) d CROSS JOIN p
  LEFT JOIN sig0 s ON s.id = d.id AND s.i = p.i
),
agree AS (
  SELECT a.id AS id_a, b.id AS id_b,
         sum(CASE WHEN a.v = b.v THEN 1 ELSE 0 END) AS n_eq
  FROM sig a JOIN sig b ON a.i = b.i AND a.id < b.id
  GROUP BY 1, 2
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(floor(n_eq * 1000.0 / {num_hashes} + 0.5) AS BIGINT) AS jaccard_mil
FROM agree WHERE n_eq * 1.0 / {num_hashes} >= {threshold}
ORDER BY id_a, id_b
"""


def simhash_pairs_sql(docs_sql: str, max_hamming: int = 3) -> str:
    """DuckDB oracle twin of :func:`simhash_near_dups`: recompute every
    simhash (same md5 little-endian token hash, same bit-majority) and
    recount hamming over ALL pairs — exactly the operator's output, since
    the (max_hamming+1)-block banding has total recall at that radius.
    ``docs_sql`` must select (id, text) and stay small (O(n²) oracle)."""
    sums = ", ".join(
        f"sum(CAST((h // {1 << j}::UBIGINT) % 2 AS BIGINT)) AS b{j}" for j in range(64)
    )
    asm = " + ".join(
        f"(CASE WHEN 2*b{j} > n THEN {1 << j}::UBIGINT ELSE 0::UBIGINT END)"
        for j in range(64)
    )
    return f"""
WITH docs AS ({docs_sql}),
t AS (SELECT id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM docs),
h AS (SELECT id, md5_number_upper(tok)::UBIGINT AS h FROM t),
bits AS (SELECT id, {sums}, count(*) AS n FROM h GROUP BY id),
sim0 AS (SELECT id, {asm} AS sh FROM bits),
sim AS (
  SELECT d.id, coalesce(s.sh, 0::UBIGINT) AS sh
  FROM (SELECT DISTINCT id FROM docs) d LEFT JOIN sim0 s ON s.id = d.id
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b, bit_count(xor(a.sh, b.sh)) AS hamming
  FROM sim a JOIN sim b ON a.id < b.id
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(hamming AS INT) AS hamming
FROM pairs WHERE hamming <= {max_hamming}
ORDER BY id_a, id_b
"""


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
    """SimHash near-dup pairs: block banding + exact hamming verify.

    The 64-bit signature is split into ``max_hamming + 1`` contiguous
    blocks, so by pigeonhole any pair within ``max_hamming`` differing
    bits shares at least one IDENTICAL block — banding recall is total
    for the requested radius (a fixed 4-block split only guarantees
    hamming <= 3 and silently drops farther pairs). Candidates then get
    an exact ``bit_count(xor)`` recount.

    Output: (id_a, id_b, hamming int).
    """
    n_blocks = max_hamming + 1
    if not 1 <= n_blocks <= 64:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    base, extra = divmod(64, n_blocks)
    widths = [base + (1 if i < extra else 0) for i in range(n_blocks)]
    offs = [sum(widths[:i]) for i in range(n_blocks)]
    block_cols = [
        F.col("sh")
        if w == 64
        else F.shiftrightunsigned("sh", off).bitwiseAND(F.lit((1 << w) - 1))
        for off, w in zip(offs, widths)
    ]
    sim = simhash_udf()
    sigs = docs.select(F.col(id_col).alias("id"), sim(tokenize_expr(text_col)).alias("sh"))
    blocks = sigs.select(
        "id",
        "sh",
        F.posexplode(F.array(*block_cols)).alias("blk", "blk_val"),
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
