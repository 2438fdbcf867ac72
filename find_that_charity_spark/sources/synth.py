"""Deterministic fixture synthesizer (FIXTURES.md §1-§2).

Generates the ``web_pages`` corpus and the reference query set with
numpy seeded RNG — no external data, byte-stable across runs, so golden
outputs never need to be stored (the in-repo brute-force oracle recomputes
them, SURVEY.md §5.2).

Corpus design knobs (FIXTURES.md):
- vocabulary of 1,000 terms, Zipf(a=1.3) → ~10 head terms dominate, which
  exercises the salted repartition-by-term skew split (SURVEY.md §2C C8);
- 5 planted "entity name" bigrams/trigrams in known doc id sets → recon
  queries have known answers;
- ~1% duplicate urls with differing warc_ts → exercises dedup (C3);
- mixed case + punctuation in 10% of tokens → exercises the analyzer (B1);
- html = trivial wrapper around text → extraction (C2) has real work and
  byte-identity (BASELINE.json input_hint) is testable.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd

SEED = 42
VOCAB_SIZE = 1000
ZIPF_A = 1.3
HOSTS = [f"src{i}" for i in range(20)]
LANGS = ["en", "fr", "es", "zh", "de"]
LANG_P = [0.40, 0.16, 0.16, 0.15, 0.13]

# Planted entity names (recon targets). Multi-word, lowercase canonical form.
ENTITY_NAMES = [
    "acme charitable trust",
    "bromley relief fund",
    "north star education society",
    "green valley hospice care",
    "royal albion benevolent",
]

_BASE_TS = datetime(2024, 1, 1)


def _vocab() -> list[str]:
    return [f"w{i:04d}" for i in range(VOCAB_SIZE)]


def _mangle_tokens(rng: np.random.Generator, tokens: np.ndarray) -> np.ndarray:
    """Inject case/punctuation noise into ~10% of tokens (vectorized)."""
    out = tokens.astype(object)
    mask = rng.random(len(tokens)) < 0.10
    styles = rng.integers(0, 4, size=len(tokens))
    sel = lambda s: mask & (styles == s)  # noqa: E731
    for s, fn in (
        (0, lambda t: np.char.upper(t.astype(str))),
        (1, lambda t: np.char.add(np.char.capitalize(t.astype(str)), ",")),
        (2, lambda t: np.char.add(t.astype(str), ".")),
        (3, lambda t: np.char.add(np.char.add("(", t.astype(str)), ")")),
    ):
        idx = np.flatnonzero(sel(s))
        if idx.size:
            out[idx] = fn(out[idx])
    return out


def synth_web_pages(n_docs: int, seed: int = SEED) -> pd.DataFrame:
    """Deterministic Common-Crawl-style corpus of ``n_docs`` unique urls.

    Returns a pandas DataFrame with the exact BASELINE.json input_hint
    schema: (url, warc_ts, html, text, lang). Roughly 1% extra rows are
    duplicate urls (later warc_ts, different text) for dedup tests.
    """
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab())

    # Zipf-distributed term ids, rejected down to vocab range.
    def draw_terms(k: int) -> np.ndarray:
        out = np.empty(k, dtype=np.int64)
        filled = 0
        while filled < k:
            cand = rng.zipf(ZIPF_A, size=(k - filled) * 2)
            cand = cand[cand <= VOCAB_SIZE] - 1
            take = min(len(cand), k - filled)
            out[filled : filled + take] = cand[:take]
            filled += take
        return out

    doc_lens = rng.integers(8, 121, size=n_docs)
    total = int(doc_lens.sum())
    flat = draw_terms(total)
    offsets = np.concatenate([[0], np.cumsum(doc_lens)])

    # Each entity planted into a known, disjoint set of ~n_docs/50 docs.
    entity_docs: dict[str, set[int]] = {}
    n_per_entity = max(3, n_docs // 50)
    perm = rng.permutation(n_docs)
    for e_i, name in enumerate(ENTITY_NAMES):
        entity_docs[name] = set(perm[e_i * n_per_entity : (e_i + 1) * n_per_entity].tolist())

    hosts = rng.choice(HOSTS, size=n_docs)
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    ts_incr = rng.exponential(3600.0, size=n_docs).cumsum()

    mangled = _mangle_tokens(rng, vocab[flat])
    entity_of_doc: dict[int, str] = {
        i: name for name, docs in entity_docs.items() for i in docs
    }
    urls, texts, tss, lang_col = [], [], [], []
    for i in range(n_docs):
        toks = mangled[offsets[i] : offsets[i + 1]].tolist()
        name = entity_of_doc.get(i)
        if name is not None:
            pos = int(rng.integers(0, len(toks) + 1))
            toks[pos:pos] = name.split()
        urls.append(f"https://{hosts[i]}/p/{i:08d}")
        texts.append(" ".join(toks))
        tss.append(_BASE_TS + timedelta(seconds=float(ts_incr[i])))
        lang_col.append(langs[i])

    # ~1% duplicate urls: later capture, shuffled text (dedup keeps latest).
    n_dup = max(1, n_docs // 100)
    dup_idx = rng.choice(n_docs, size=n_dup, replace=False)
    for i in dup_idx:
        urls.append(urls[i])
        words = texts[i].split()
        rng.shuffle(words)
        texts.append(" ".join(words))
        tss.append(tss[i] + timedelta(days=1))
        lang_col.append(lang_col[i])

    df = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": tss,
            "text": texts,
            "lang": lang_col,
        }
    )
    df["html"] = df["text"].map(lambda t: b"<html><body>" + t.encode("utf-8") + b"</body></html>")
    return df[["url", "warc_ts", "html", "text", "lang"]]


def synth_queries(seed: int = SEED) -> pd.DataFrame:
    """Reference query set (FIXTURES.md §2): 40 freetext + 10 recon."""
    rng = np.random.default_rng(seed + 1)
    vocab = _vocab()
    head = vocab[:10]
    rows = []
    for i in range(40):
        n_terms = int(rng.integers(1, 5))
        terms = [str(rng.choice(vocab))] * 0 + [str(rng.choice(vocab)) for _ in range(n_terms)]
        if i % 2 == 0:  # half contain a head term, exercising WAND pruning
            terms[0] = str(rng.choice(head))
        rows.append((f"q{i:04d}", " ".join(terms), 10, "freetext"))
    mangles = [str.upper, lambda s: s.replace("a", "á"), str.title]
    for j, name in enumerate(ENTITY_NAMES * 2):
        text = name
        if j < 3:
            text = mangles[j](name)
        rows.append((f"q{40 + j:04d}", text, 10, "recon"))
    df = pd.DataFrame(rows, columns=["qid", "text", "k", "mode"])
    # k edge cases: 5 queries get k=1 / k=100
    df.loc[[0, 7, 14], "k"] = 1
    df.loc[[21, 28], "k"] = 100
    return df


def write_fixture(spark, out_dir: str, n_docs: int, seed: int = SEED) -> None:
    """Materialize corpus + queries as parquet under ``out_dir``."""
    from find_that_charity_spark.sources.corpus import WEB_PAGES_SCHEMA

    pages = synth_web_pages(n_docs, seed=seed)
    spark.createDataFrame(pages, schema=WEB_PAGES_SCHEMA).write.mode("overwrite").parquet(
        f"{out_dir}/web_pages.parquet"
    )
    spark.createDataFrame(synth_queries(seed=seed)).write.mode("overwrite").parquet(
        f"{out_dir}/queries.parquet"
    )
