"""B1 analyzer: pinned scalar vs vectorized byte-identity (SURVEY.md §5.3)."""

from __future__ import annotations

import pandas as pd
import pytest

from find_that_charity_spark.functions.analyzer import (
    analyze,
    analyze_name,
    analyze_name_series,
    analyze_series,
    tokenize_expr,
)
from find_that_charity_spark.sources.synth import synth_web_pages

CASES = [
    "Hello, World!",
    "ACME Charitable Trust (reg. 1234)",
    "Société Générale—über straße",
    "日本語のテキスト and english",
    "ﬁ ﬂ ligatures ＦＵＬＬＷＩＤＴＨ",
    "under_score mixes\t whitespace\nnewlines",
    "",
    "   ",
    "42 7x 0xff",
]


def test_analyze_basic():
    assert analyze("Hello, World!") == ["hello", "world"]
    assert analyze(None) == []
    assert analyze("") == []
    # NFKC folds fullwidth + ligatures before tokenizing
    assert analyze("ＦＵＬＬ ﬁx") == ["full", "fix"]


def test_analyze_name_folds_ascii():
    assert analyze_name("Société Générale") == ["societe", "generale"]
    assert analyze_name("ACME Trüst") == ["acme", "trust"]
    # plain analyze keeps the accents
    assert analyze("Société") == ["société"]


@pytest.mark.parametrize("case", CASES)
def test_vectorized_matches_pinned_scalar(case):
    s = pd.Series([case])
    assert list(analyze_series(s)[0]) == analyze(case)
    assert list(analyze_name_series(s)[0]) == analyze_name(case)


def test_vectorized_matches_pinned_on_corpus():
    """Byte-identity over every fixture row (BASELINE.json input_hint)."""
    pages = synth_web_pages(500)
    vec = analyze_series(pages["text"])
    for i, txt in enumerate(pages["text"]):
        assert list(vec.iloc[i]) == analyze(txt), f"row {i} diverged"


def test_tokenize_expr_matches_analyze_on_ascii(spark, sf_small):
    """JVM-native tokenizer == pinned analyzer on the ASCII documents table."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    rows = docs.select("doc_id", "text", tokenize_expr("text").alias("toks")).collect()
    assert len(rows) > 0
    for r in rows:
        assert list(r["toks"]) == analyze(r["text"]), f"doc {r['doc_id']}"
