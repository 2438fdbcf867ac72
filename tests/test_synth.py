"""FIXTURES synthesizer: determinism + planted structure (FIXTURES.md)."""

from __future__ import annotations

from find_that_charity_spark.functions.analyzer import analyze
from find_that_charity_spark.sources.synth import ENTITY_NAMES, synth_queries, synth_web_pages


def test_deterministic():
    a = synth_web_pages(200)
    b = synth_web_pages(200)
    assert a.equals(b)
    assert synth_queries().equals(synth_queries())


def test_shape_and_dups():
    df = synth_web_pages(500)
    assert list(df.columns) == ["url", "warc_ts", "html", "text", "lang"]
    n_dup = len(df) - df["url"].nunique()
    assert n_dup == 5  # 1% of 500
    # duplicate urls have distinct warc_ts (dedup keeps latest)
    dups = df[df.duplicated("url", keep=False)]
    assert dups.groupby("url")["warc_ts"].nunique().min() == 2


def test_entities_planted():
    df = synth_web_pages(500)
    for name in ENTITY_NAMES:
        hits = df["text"].str.contains(name, regex=False).sum()
        assert hits >= 3, name


def test_html_wraps_text():
    df = synth_web_pages(50)
    for _, r in df.iterrows():
        assert r["html"] == b"<html><body>" + r["text"].encode() + b"</body></html>"


def test_queries_fixture():
    q = synth_queries()
    assert len(q) == 50
    assert (q["mode"] == "recon").sum() == 10
    assert set(q["k"]) == {1, 10, 100}
    # recon queries analyze down to planted entity tokens
    recon = q[q["mode"] == "recon"]["text"].tolist()
    entity_token_sets = [set(analyze(n)) for n in ENTITY_NAMES]
    for text in recon:
        from find_that_charity_spark.functions.analyzer import analyze_name

        assert set(analyze_name(text)) in entity_token_sets, text
